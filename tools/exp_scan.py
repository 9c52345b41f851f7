"""Ablate the flat-BPE kernel to localize its non-lookup cost.

The chain model (packed_sweep_r2) prices the rule lookup at ~205/S GB/s;
at the 500-rule CHD placement (S=5) that alone would run ~41 GB/s, yet the
production kernel measures ~18 GB/s — so roughly half the per-byte time is
now scan/shift/emit, not lookup. This experiment chains ablated kernel
variants (semantics deliberately broken, cost structure preserved) to
price each stage:

  full     : production _kernel_body (baseline)
  noscan   : parity max-scan replaced by a constant-parity guess
  nolookup : CHD gather chain replaced by a 2-op mask function
  noshifts : nxt/consumed linear shifts replaced by in-register rolls
  scan16   : phase-1 intra-row scan carried in int16 lanes (2x packing probe)
  swarpack : two rows' intra-row scans packed per i32 (16-bit fields,
             SWAR max) — VERDICT r3 item 3 probe

Verdicts recorded in benches/results/flat_ablation_r4.json: full 19.36,
noscan ceiling 30.67 GB/s; swarpack FAILS TO LOWER (strided sublane
reads rejected at trace; reshape-regroup crashes the Mosaic compile
helper) and would lose anyway (SWAR per-field max ~9 int ops vs 1
native max = ~2x more work at half volume); scan16 remains blocked by
the 16-bit pltpu.roll crash (tools/exp_16bit.py, r3).

Run on the real chip: python tools/exp_scan.py
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blt_tpu.merges import MergeTable
from blt_tpu.ops.bpe_pallas import (
    LANES,
    _NEG,
    PallasFlatEncoder,
    _scan_max_linear,
    _shift_left_linear,
    _shift_right_linear,
    _tree_lookup,
)
from blt_tpu.utils.compcache import enable_compilation_cache

N = 64 * 1024 * 1024
K = 64
RULES = 500
RPB = 1024


def log(m):
    print(m, file=sys.stderr, flush=True)


def _variant_body(variant):
    def kernel(params_ref, carry_in_ref, data_ref, halo_ref, e1_ref, e2_ref,
               out_ref, carry_out_ref, carry_ref):
        i = pl.program_id(0)
        length = params_ref[0]
        carry_call = carry_in_ref[0, 0]
        next_byte = params_ref[2]
        a1 = params_ref[3]
        a2 = params_ref[4]
        ffff = params_ref[5]
        shift = params_ref[6]
        slots_mask = e1_ref.shape[0] * LANES - 1

        r = data_ref.shape[0]
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0)
        block = r * LANES
        block_start = i * block
        gidx = block_start + row_iota * LANES + lane_iota

        d = data_ref[:].astype(jnp.int32)
        if variant == "noshifts":
            nxt = pltpu.roll(d, LANES - 1, axis=1)
        else:
            halo_fill = halo_ref[:].astype(jnp.int32)[0:1, 0:1]
            nxt = _shift_left_linear(d, halo_fill, lane_iota)
            nxt = jnp.where(gidx == length - 1, jnp.maximum(next_byte, 0), nxt)

        p = d * 256 + nxt
        if variant == "nolookup":
            val = p & 0xFFFF
            m = (p & 7) == 0
        else:
            bshift = params_ref[1]
            h = (p * a2) >> shift
            bmask = e2_ref.shape[0] * LANES - 1
            g = ((p * a1) >> bshift) & bmask
            h = h + _tree_lookup(e2_ref, g)
            h = h & slots_mask
            e = _tree_lookup(e1_ref, h)
            m = (((e >> 16) & 0xFFFF) == p) & (e != -1)
            val = e & 0xFFFF
            is_ffff = (p == 0xFFFF) & (ffff != 0)
            m = m | is_ffff
            val = jnp.where(is_ffff, 0xFFFF, val)

        valid_pair = (gidx < length - 1) | ((gidx == length - 1) & (next_byte >= 0))
        m = m & valid_pair

        carry_in = jnp.where(i == 0, carry_call, carry_ref[0])
        if variant == "noscan":
            starts = m & ((gidx & 1) == 1)
        elif variant == "swarpack":
            # VERDICT r3 item 3 probe: phase-1 intra-row scans of TWO rows
            # packed per i32 vector (16-bit fields) — halves roll volume,
            # but the per-field max must be SWAR-synthesized (~9 int ops:
            # guard-or, sub, mask-and, shift, sub, or, 3-op select) since
            # the VPU has no packed-lane max, and the packed result must be
            # re-interleaved to the row layout afterwards (stood in here by
            # a concatenate, which LOWER-bounds the real strided shuffle).
            # Semantics deliberately approximate; cost structure preserved.
            z = jnp.where(m, _NEG, gidx)
            # per-row lane codes (9 bits): (lane+1)*2 | parity; 0 = none
            code = jnp.where(m, 0, (lane_iota + 1) * 2 + (gidx & 1))
            ze = code[0::2, :]  # (R/2,128): sublane stride 2
            zo = code[1::2, :]
            packed = (ze & 0x7FFF) | (zo << 16)
            lane_half = jax.lax.broadcasted_iota(
                jnp.int32, (r // 2, LANES), 1
            )
            guard = jnp.int32(-2147450880)  # 0x80008000
            s = packed
            sh = 1
            while sh < LANES:
                rolled = pltpu.roll(s, sh, axis=1)
                cand = jnp.where(lane_half >= sh, rolled, 0)
                g = ((s | guard) - cand) & guard  # per-field s>=cand bits
                msk = (g - (g >> 15)) | g  # expand to full-field masks
                s = (s & msk) | (cand & ~msk)
                sh *= 2
            se = s & 0xFFFF
            so = (s >> 16) & 0xFFFF
            interleaved = jnp.concatenate([se, so], axis=0)  # (R,128)
            in_row = interleaved > 0
            row_last = jnp.max(z, axis=1, keepdims=True)
            row_iota1 = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
            excl = jnp.where(
                row_iota1 == 0, _NEG, pltpu.roll(row_last, 1, axis=0)
            )
            sh = 1
            while sh < r:
                rolled = pltpu.roll(excl, sh, axis=0)
                excl = jnp.maximum(
                    excl, jnp.where(row_iota1 >= sh, rolled, _NEG)
                )
                sh *= 2
            lz_par = jnp.where(
                in_row, interleaved & 1,
                jnp.broadcast_to(excl & 1, (r, LANES)),
            )
            starts = m & (((gidx & 1) ^ lz_par) == 1)
        elif variant == "scan16":
            # phase-1 intra-row scan in int16: encode the last non-match's
            # (lane, parity) as lane*2+gidx&1 (< 256, fits i16); phase 2
            # stays int32 on (R,1) columns.
            enc = (lane_iota * 2 + (gidx & 1)).astype(jnp.int16)
            z16 = jnp.where(m, jnp.int16(-1), enc)
            s = z16
            sh = 1
            lane16 = lane_iota.astype(jnp.int16)
            while sh < LANES:
                rolled = pltpu.roll(s, sh, axis=1)
                s = jnp.maximum(s, jnp.where(lane_iota >= sh, rolled, jnp.int16(-1)))
                sh *= 2
            # row carry: parity of last non-match across preceding rows
            z = jnp.where(m, _NEG, gidx)
            row_last = jnp.max(z, axis=1, keepdims=True)  # (R,1)
            row_iota1 = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
            excl = jnp.where(row_iota1 == 0, _NEG, pltpu.roll(row_last, 1, axis=0))
            sh = 1
            while sh < r:
                rolled = pltpu.roll(excl, sh, axis=0)
                excl = jnp.maximum(excl, jnp.where(row_iota1 >= sh, rolled, _NEG))
                sh *= 2
            in_row = s >= 0
            lz_par = jnp.where(
                in_row, (s & 1).astype(jnp.int32),
                jnp.broadcast_to(excl & 1, (r, LANES)))
            starts = m & (((gidx & 1) ^ lz_par) == 1)
        else:
            z = jnp.where(m, _NEG, gidx)
            lnm = _scan_max_linear(z, lane_iota)
            sentinel = block_start - 1 - carry_in
            lz = jnp.maximum(lnm, sentinel)
            starts = m & (((gidx - lz) & 1) == 1)

        starts_i = starts.astype(jnp.int32)
        if variant == "noshifts":
            consumed = pltpu.roll(starts_i, 1, axis=1) != 0
        else:
            consumed = _shift_right_linear(starts_i, carry_in, lane_iota) != 0

        tok = jnp.where(starts, val, d << 8)
        tok = jnp.where(consumed, 0, tok)
        out_ref[:] = tok.astype(jnp.uint16)

        last_pos = jnp.minimum(block_start + block - 1, length - 1)
        computed = jnp.sum(jnp.where(gidx == last_pos, starts_i, 0))
        c_next = jnp.where(last_pos >= block_start, computed, carry_in)
        carry_ref[0] = c_next
        carry_out_ref[0, 0] = c_next

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "k", "rpb"))
def chain(params, carry, data3, e1, e2, variant="full", k=K, rpb=RPB):
    total_rows = data3.shape[0] - 8
    num_blocks = total_rows // rpb
    kern = _variant_body(variant)
    c = carry
    for _ in range(k):
        out, c = _pallas(kern, params, c, data3, e1, e2, rpb, num_blocks, total_rows)
    return c


def _pallas(kern, params, carry, data3, e1, e2, rpb, num_blocks, total_rows):
    return pl.pallas_call(
        kern,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((rpb, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e1.shape[0], LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e2.shape[0], LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rpb, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((total_rows, LANES), jnp.uint16),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(params, carry, data3, data3, e1, e2)


def main():
    enable_compilation_cache()
    log(f"backend={jax.default_backend()}")
    base = np.load("/root/.cache/blt_tpu_bench_corpus.npy")
    host = np.tile(base, -(-N // base.shape[0]))[:N]

    sample = host[: 4 * 1024 * 1024]
    pairs, counts = np.unique(
        sample[:-1].astype(np.int32) * 256 + sample[1:].astype(np.int32),
        return_counts=True,
    )
    top = pairs[np.argsort(-counts)][:RULES]
    merges = {(int(p) // 256, int(p) % 256): 256 + i for i, p in enumerate(top)}
    table = MergeTable.build(merges)

    variants = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "full", "noscan", "nolookup", "noshifts", "scan16"
    ]
    rpbs = [int(r) for r in sys.argv[2].split(",")] if len(sys.argv) > 2 else [RPB]

    for rpb in rpbs:
        enc = PallasFlatEncoder(table, capacity_bytes=N, rows_per_block=rpb)
        if rpb == rpbs[0]:
            log(f"encoder mode={enc.mode} e1={enc.e1.shape} e2={enc.e2.shape}")
        num_blocks = N // (rpb * LANES)
        padded_rows = num_blocks * rpb + 8
        buf = np.zeros((padded_rows * LANES,), np.uint8)
        buf[:N] = host
        d3 = jax.device_put(buf.reshape(padded_rows, LANES))
        params = enc.params(N)
        zc = jax.device_put(np.zeros((1, 1), np.int32))

        for variant in variants:
            try:
                t0 = time.perf_counter()
                np.asarray(chain(params, zc, d3, enc.e1, enc.e2, variant=variant, rpb=rpb))
                log(f"{variant} rpb={rpb}: compile+first {time.perf_counter() - t0:.2f}s")
                np.asarray(chain(params, zc, d3, enc.e1, enc.e2, variant=variant, rpb=rpb))
                t0 = time.perf_counter()
                r = 3
                for _ in range(r):
                    res = chain(params, zc, d3, enc.e1, enc.e2, variant=variant, rpb=rpb)
                np.asarray(res)
                dt = time.perf_counter() - t0
                log(f"{variant} rpb={rpb}: {N * K * r / dt / 1e9:.2f} GB/s device-chained")
            except Exception as exc:  # noqa: BLE001
                log(f"{variant} rpb={rpb}: FAILED {type(exc).__name__}: {str(exc)[:300]}")


if __name__ == "__main__":
    main()
