"""Kernel-optimization variants for flat BPE, measured on the real TPU.

Variants stack:
- base: production kernel (via flat_encode_chained)
- p2: phase-2 scan over row maxima reshaped (r,1)->(r/128,128)
- hoist: cuckoo segment rows materialized once into VMEM scratch
- swap: values pre-byteswapped in the table, d shifted instead of swapped

Each variant is validated against the NumPy engine on a 4MB prefix.
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
from blt_tpu.ops.bpe_numpy import bpe_encode_flat
from blt_tpu.utils.compcache import enable_compilation_cache

LANES = 128
N = 64 * 1024 * 1024
K = 8
RULES = 500
_NEG = -(2**31) + 1


def log(m):
    print(m, file=sys.stderr, flush=True)


def _scan_max_p2(z, lane_iota):
    """Max-scan with the phase-2 row-maxima scan done in a (r/128,128) view."""
    r = z.shape[0]
    s = z
    shift = 1
    while shift < LANES:
        rolled = pltpu.roll(s, shift, axis=1)
        s = jnp.maximum(s, jnp.where(lane_iota >= shift, rolled, _NEG))
        shift *= 2
    row_max = s[:, LANES - 1 :]  # (r,1) inclusive row totals
    # exclusive shift down the rows, then scan the (r2,128) view
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    excl = jnp.where(row_iota == 0, _NEG, pltpu.roll(row_max, 1, axis=0))
    r2 = r // LANES
    w = excl.reshape(r2, LANES)  # row-major: preserves linear row order
    li2 = jax.lax.broadcasted_iota(jnp.int32, (r2, LANES), 1)
    t = w
    shift = 1
    while shift < LANES:
        rolled = pltpu.roll(t, shift, axis=1)
        t = jnp.maximum(t, jnp.where(li2 >= shift, rolled, _NEG))
        shift *= 2
    tm = t[:, LANES - 1 :]  # (r2,1)
    ri2 = jax.lax.broadcasted_iota(jnp.int32, (r2, 1), 0)
    ex2 = jnp.where(ri2 == 0, _NEG, pltpu.roll(tm, 1, axis=0))
    shift = 1
    while shift < r2:
        rolled = pltpu.roll(ex2, shift, axis=0)
        ex2 = jnp.maximum(ex2, jnp.where(ri2 >= shift, rolled, _NEG))
        shift *= 2
    scanned = jnp.maximum(t, jnp.broadcast_to(ex2, t.shape))  # (r2,128) incl
    excl_rows = scanned.reshape(r, 1)
    return jnp.maximum(s, jnp.broadcast_to(excl_rows, s.shape))


def make_kernel(p2, hoist, swap, segs, rpb):
    n_scratch_rows = segs * rpb if hoist else 1

    def kernel(params_ref, carry_in_ref, data_ref, halo_ref, e1_ref, e2_ref,
               out_ref, carry_out_ref, carry_ref, bc1_ref, bc2_ref):
        i = pl.program_id(0)
        length = params_ref[0]
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

        h1 = ((p * a1) >> shift) & slots_mask
        h2 = ((p * a2) >> shift) & slots_mask

        if hoist:
            @pl.when(i == 0)
            def _():
                for k in range(segs):
                    bc1_ref[k * r:(k + 1) * r, :] = jnp.broadcast_to(
                        e1_ref[k:k + 1, :], (r, LANES))
                    bc2_ref[k * r:(k + 1) * r, :] = jnp.broadcast_to(
                        e2_ref[k:k + 1, :], (r, LANES))

            def lookup(bc_ref, h):
                hi = h >> 7
                lo = h & (LANES - 1)
                acc = jnp.full(h.shape, -1, dtype=jnp.int32)
                for k in range(segs):
                    g = jnp.take_along_axis(bc_ref[k * r:(k + 1) * r, :], lo, axis=1)
                    acc = jnp.where(hi == k, g, acc)
                return acc

            e1 = lookup(bc1_ref, h1)
            e2 = lookup(bc2_ref, h2)
        else:
            e1 = B._tree_lookup(e1_ref, h1)
            e2 = B._tree_lookup(e2_ref, h2)

        key1 = (e1 >> 16) & 0xFFFF
        key2 = (e2 >> 16) & 0xFFFF
        hit1 = key1 == p
        hit2 = key2 == p
        val = jnp.where(hit1, e1 & 0xFFFF, e2 & 0xFFFF)
        m = hit1 | hit2

        valid_pair = (gidx < length - 1) | ((gidx == length - 1) & (next_byte >= 0))
        m = m & valid_pair

        carry_in = jnp.where(i == 0, carry_call, carry_ref[0])
        z = jnp.where(m, _NEG, gidx)
        if p2:
            lnm = _scan_max_p2(z, lane_iota)
        else:
            lnm = B._scan_max_linear(z, lane_iota)
        sentinel = block_start - 1 - carry_in
        lz = jnp.maximum(lnm, sentinel)
        starts = m & (((gidx - lz) & 1) == 1)

        starts_i = starts.astype(jnp.int32)
        consumed = B._shift_right_linear(starts_i, carry_in, lane_iota) != 0
        if swap:
            tok = jnp.where(starts, val, d << 8)
            tok = jnp.where(consumed, 0, tok)
            out_ref[:] = tok.astype(jnp.uint16)
        else:
            tok = jnp.where(starts, val, d)
            tok = jnp.where(consumed, 0, tok)
            out_ref[:] = (((tok & 0xFF) << 8) | ((tok >> 8) & 0xFF)).astype(jnp.uint16)

        last_pos = jnp.minimum(block_start + block - 1, length - 1)
        computed = jnp.sum(jnp.where(gidx == last_pos, starts_i, 0))
        c_next = jnp.where(last_pos >= block_start, computed, carry_in)
        carry_ref[0] = c_next
        carry_out_ref[0, 0] = c_next

    return kernel, n_scratch_rows


@functools.partial(jax.jit, static_argnames=("p2", "hoist", "swap", "segs", "rpb", "k"))
def chain(params, carry, data3, e1, e2, p2, hoist, swap, segs, rpb=1024, k=K):
    total_rows = data3.shape[0] - 8
    num_blocks = total_rows // rpb
    kernel, nsr = make_kernel(p2, hoist, swap, segs, rpb)

    def call(c):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(num_blocks,),
                in_specs=[
                    pl.BlockSpec((1, 1), lambda i, p: (0, 0), memory_space=pltpu.SMEM),
                    pl.BlockSpec((rpb, LANES), lambda i, p: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, LANES), lambda i, p: ((i + 1) * rpb // 8, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec((rpb, LANES), lambda i, p: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1), lambda i, p: (0, 0), memory_space=pltpu.SMEM),
                ),
                scratch_shapes=[
                    pltpu.SMEM((1,), jnp.int32),
                    pltpu.VMEM((nsr, LANES), jnp.int32),
                    pltpu.VMEM((nsr, LANES), jnp.int32),
                ],
            ),
            out_shape=(
                jax.ShapeDtypeStruct((total_rows, LANES), jnp.uint16),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        )(params, c, data3, data3, e1, e2)

    for _ in range(k):
        out, carry = call(carry)
    return out, carry


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
    rpb = 1024
    enc = B.PallasFlatEncoder(table, capacity_bytes=N, rows_per_block=rpb)
    segs = enc.e1.shape[0]
    log(f"segs={segs}")

    # pre-swapped tables for the swap variant
    def preswap(e):
        e = np.asarray(e)
        key = e & np.int32(-65536)
        val = e & 0xFFFF
        vs = ((val & 0xFF) << 8) | (val >> 8)
        return jnp.asarray((key | vs).astype(np.int32))

    e1s, e2s = preswap(enc.e1), preswap(enc.e2)

    num_blocks = N // enc.block
    padded_rows = num_blocks * rpb + 8
    buf = np.zeros((padded_rows * LANES,), np.uint8)
    buf[:N] = host
    d3 = jax.device_put(buf.reshape(padded_rows, LANES))
    params = jnp.asarray(np.array([N, 0, -1, enc.a1, enc.a2, 0, enc.shift, 0], np.int32))
    zc = jax.device_put(np.zeros((1, 1), np.int32))

    mexp = 4 * 1024 * 1024
    exp_prefix = bpe_encode_flat(host[:mexp], table)

    for name, p2, hoist, swap in (
        ("base", False, False, False),
        ("p2", True, False, False),
        ("p2+hoist", True, True, False),
        ("p2+hoist+swap", True, True, True),
    ):
        t1, t2 = (e1s, e2s) if swap else (enc.e1, enc.e2)
        try:
            t0 = time.perf_counter()
            out, c = chain(params, zc, d3, t1, t2, p2, hoist, swap, segs, rpb=rpb)
            np.asarray(c)
            log(f"{name}: compile+first {time.perf_counter()-t0:.2f}s")
            # correctness on 4MB prefix
            slots_prefix = np.asarray(out).reshape(-1)[:mexp]
            toks_be, _ = B.filter_slots(slots_prefix, 0)
            toks = np.frombuffer(toks_be.tobytes(), ">u2").astype(np.int64)
            kk = min(len(toks), len(exp_prefix)) - 2
            ok = toks[:kk].tolist() == exp_prefix[:kk].tolist()
            log(f"{name}: exact={ok}")
            np.asarray(chain(params, zc, d3, t1, t2, p2, hoist, swap, segs, rpb=rpb)[1])
            t0 = time.perf_counter()
            r = 3
            for _ in range(r):
                res = chain(params, zc, d3, t1, t2, p2, hoist, swap, segs, rpb=rpb)[1]
            np.asarray(res)
            dt = time.perf_counter() - t0
            log(f"{name}: {N*K*r/dt/1e9:.2f} GB/s")
        except Exception as e:
            log(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
