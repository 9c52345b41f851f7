"""Post-CHD kernel cost exploration: rpb sweep + scan phase-2 relayout.

Variants (same output traffic):
- prod:    production chd kernel body via flat_encode_chained
- scan2:   replace _scan_max_linear's (R,1) phase-2 roll-scan with a
           reshape to (R/128,128), lane-major scan, reshape back
- novalid: drop the valid_pair mask (measures its cost; INEXACT at tail)
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
from blt_tpu.ops import bpe_pallas as B
from blt_tpu.utils.compcache import enable_compilation_cache

LANES = 128
N = 64 * 1024 * 1024
K = 8
RULES = 500
_NEG = -(2**31) + 1


def log(m):
    print(m, file=sys.stderr, flush=True)


def _scan_max_linear_v2(z, lane_iota):
    """Phase 2 on a (R/128,128) relayout of the row maxima."""
    r = z.shape[0]
    s = z
    shift = 1
    while shift < LANES:
        rolled = pltpu.roll(s, shift, axis=1)
        s = jnp.maximum(s, jnp.where(lane_iota >= shift, rolled, _NEG))
        shift *= 2
    row_max = s[:, LANES - 1 :]  # (R,1)
    r2 = r // LANES
    rm = row_max.reshape(r2, LANES)  # linear order preserved (row-major)
    li2 = jax.lax.broadcasted_iota(jnp.int32, (r2, LANES), 1)
    # exclusive scan over the linearization of rm
    ex = jnp.where(li2 == 0, _NEG, pltpu.roll(rm, 1, axis=1))
    first_col = rm[:, LANES - 1 :]
    prev_last = pltpu.roll(first_col, 1, axis=0)
    ri2 = jax.lax.broadcasted_iota(jnp.int32, (r2, 1), 0)
    fill = jnp.where(ri2 == 0, _NEG, prev_last)
    ex = jnp.where(li2 == 0, jnp.broadcast_to(fill, ex.shape), ex)
    shift = 1
    while shift < LANES:
        rolled = pltpu.roll(ex, shift, axis=1)
        ex = jnp.maximum(ex, jnp.where(li2 >= shift, rolled, _NEG))
        shift *= 2
    rmax2 = ex[:, LANES - 1 :]  # (r2,1) inclusive of exclusive-scan = max of all prior full rows... need care
    exr = jnp.where(ri2 == 0, _NEG, pltpu.roll(rmax2, 1, axis=0))
    shift = 1
    while shift < r2:
        rolled = pltpu.roll(exr, shift, axis=0)
        exr = jnp.maximum(exr, jnp.where(ri2 >= shift, rolled, _NEG))
        shift *= 2
    ex = jnp.maximum(ex, jnp.broadcast_to(exr, ex.shape))
    excl = ex.reshape(r, 1)
    return jnp.maximum(s, jnp.broadcast_to(excl, s.shape))


def make_kernel(variant):
    def kernel(params_ref, segs_ref, carry_in_ref, data_ref, halo_ref,
               e1_ref, e2_ref, out_ref, carry_out_ref, carry_ref):
        i = pl.program_id(0)
        length = params_ref[0]
        bshift = params_ref[1]
        carry_call = carry_in_ref[0, 0]
        next_byte = params_ref[2]
        a1 = params_ref[3]
        a2 = params_ref[4]
        shift = params_ref[6]
        slots_mask = e1_ref.shape[0] * LANES - 1

        r = data_ref.shape[0]
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0)
        block = r * LANES
        block_start = i * block
        gidx = block_start + row_iota * LANES + lane_iota

        d = data_ref[:].astype(jnp.int32)
        halo_fill = halo_ref[:].astype(jnp.int32)[0:1, 0:1]
        nxt = B._shift_left_linear(d, halo_fill, lane_iota)
        nxt = jnp.where(gidx == length - 1, jnp.maximum(next_byte, 0), nxt)
        p = d * 256 + nxt

        bmask = e2_ref.shape[0] * LANES - 1
        g = ((p * a1) >> bshift) & bmask
        h = (p * a2) >> shift
        h = (h + B._tree_lookup(e2_ref, g)) & slots_mask
        e = B._tree_lookup(e1_ref, h)
        m = (((e >> 16) & 0xFFFF) == p) & (e != -1)
        val = e & 0xFFFF

        if variant != "novalid":
            valid_pair = (gidx < length - 1) | ((gidx == length - 1) & (next_byte >= 0))
            m = m & valid_pair

        carry_in = jnp.where(i == 0, carry_call, carry_ref[0])
        z = jnp.where(m, _NEG, gidx)
        if variant == "noscan2":
            # phase 1 only (INEXACT across rows; cost probe for phase 2)
            s_ = z
            sh = 1
            while sh < LANES:
                rolled = pltpu.roll(s_, sh, axis=1)
                s_ = jnp.maximum(s_, jnp.where(lane_iota >= sh, rolled, _NEG))
                sh *= 2
            lnm = s_
        else:
            lnm = B._scan_max_linear(z, lane_iota)
        sentinel = block_start - 1 - carry_in
        lz = jnp.maximum(lnm, sentinel)
        starts = m & (((gidx - lz) & 1) == 1)

        starts_i = starts.astype(jnp.int32)
        consumed = B._shift_right_linear(starts_i, carry_in, lane_iota) != 0
        tok = jnp.where(starts, val, d << 8)
        tok = jnp.where(consumed, 0, tok)
        out_ref[:] = tok.astype(jnp.uint16)

        last_pos = jnp.minimum(block_start + block - 1, length - 1)
        computed = jnp.sum(jnp.where(gidx == last_pos, starts_i, 0))
        c_next = jnp.where(last_pos >= block_start, computed, carry_in)
        carry_ref[0] = c_next
        carry_out_ref[0, 0] = c_next

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "rpb", "k"))
def chain(params, segs, carry, data3, e1, e2, variant="prod", rpb=1024, k=K):
    total_rows = data3.shape[0] - 8
    num_blocks = total_rows // rpb

    def call(c):
        return pl.pallas_call(
            make_kernel(variant),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(num_blocks,),
                in_specs=[
                    pl.BlockSpec((1, 1), lambda i, p, s: (0, 0), memory_space=pltpu.SMEM),
                    pl.BlockSpec((rpb, LANES), lambda i, p, s: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, LANES), lambda i, p, s: ((i + 1) * rpb // 8, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec((rpb, LANES), lambda i, p, s: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1), lambda i, p, s: (0, 0), memory_space=pltpu.SMEM),
                ),
                scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
            ),
            out_shape=(
                jax.ShapeDtypeStruct((total_rows, LANES), jnp.uint16),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        )(params, segs, c, data3, data3, e1, e2)

    outs = None
    for _ in range(k):
        outs, carry = call(carry)
    return outs, carry


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

    for rpb in (512, 1024, 2048):
        enc = B.PallasFlatEncoder(table, capacity_bytes=N, rows_per_block=rpb)
        assert enc.mode == "chd", enc.mode
        num_blocks = N // enc.block
        padded_rows = num_blocks * rpb + 8
        buf = np.zeros((padded_rows * LANES,), np.uint8)
        buf[:N] = host
        d3 = jax.device_put(buf.reshape(padded_rows, LANES))
        params = enc.params(N)
        zc = jax.device_put(np.zeros((1, 1), np.int32))
        variants = ("prod", "noscan2", "novalid") if rpb == 1024 else ("prod",)
        ref_out = None
        for variant in variants:
          try:
            t0 = time.perf_counter()
            outs, c = chain(params, enc.segs, zc, d3, enc.e1, enc.e2,
                            variant=variant, rpb=rpb)
            np.asarray(c)
            log(f"rpb={rpb} {variant}: compile+first {time.perf_counter()-t0:.1f}s")
            outs, c = chain(params, enc.segs, zc, d3, enc.e1, enc.e2,
                            variant=variant, rpb=rpb)
            np.asarray(c)
            t0 = time.perf_counter()
            r = 3
            for _ in range(r):
                outs, c = chain(params, enc.segs, zc, d3, enc.e1, enc.e2,
                                variant=variant, rpb=rpb)
            np.asarray(c)
            dt = time.perf_counter() - t0
            log(f"rpb={rpb} {variant}: {N*K*r/dt/1e9:.2f} GB/s")
            if variant == "prod":
                ref_out = np.asarray(outs)[: 1 << 20]
          except Exception as e:
            log(f"rpb={rpb} {variant} FAILED: {type(e).__name__}: {str(e)[:200]}")
        del d3


if __name__ == "__main__":
    main()
