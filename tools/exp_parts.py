"""Cost breakdown of the flat-BPE kernel + sublane-gather microbenchmark.

Variants (all emit the same-shaped output so traffic is identical):
- full: the production kernel body
- nolookup: match bit from a trivial predicate (measures scan+emit cost)
- noscan: starts = match (measures lookup+emit cost)
- emit: no lookup, no scan (floor: widen + shifts)
- subgather: out = T[idx[i,j], j] sublane dynamic_gather microtest
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


def make_variant_kernel(variant):
    def kernel(params_ref, carry_in_ref, data_ref, halo_ref, e1_ref, e2_ref,
               out_ref, carry_out_ref, carry_ref):
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

        if variant in ("full", "noscan"):
            h1 = ((p * a1) >> shift) & slots_mask
            h2 = ((p * a2) >> shift) & slots_mask
            e1 = B._tree_lookup(e1_ref, h1)
            e2 = B._tree_lookup(e2_ref, h2)
            key1 = (e1 >> 16) & 0xFFFF
            key2 = (e2 >> 16) & 0xFFFF
            hit1 = key1 == p
            hit2 = key2 == p
            val = jnp.where(hit1, e1 & 0xFFFF, e2 & 0xFFFF)
            m = hit1 | hit2
        else:
            m = (p & 7) == 0
            val = p & 0xFFFF

        valid_pair = (gidx < length - 1) | ((gidx == length - 1) & (next_byte >= 0))
        m = m & valid_pair

        if variant in ("full", "nolookup"):
            carry_in = jnp.where(i == 0, carry_call, carry_ref[0])
            z = jnp.where(m, _NEG, gidx)
            lnm = B._scan_max_linear(z, lane_iota)
            sentinel = block_start - 1 - carry_in
            lz = jnp.maximum(lnm, sentinel)
            starts = m & (((gidx - lz) & 1) == 1)
        else:
            carry_in = jnp.where(i == 0, carry_call, carry_ref[0])
            starts = m

        starts_i = starts.astype(jnp.int32)
        consumed = B._shift_right_linear(starts_i, carry_in, lane_iota) != 0
        tok = jnp.where(starts, val, d)
        tok = jnp.where(consumed, 0, tok)
        out_ref[:] = (((tok & 0xFF) << 8) | ((tok >> 8) & 0xFF)).astype(jnp.uint16)

        last_pos = jnp.minimum(block_start + block - 1, length - 1)
        computed = jnp.sum(jnp.where(gidx == last_pos, starts_i, 0))
        c_next = jnp.where(last_pos >= block_start, computed, carry_in)
        carry_ref[0] = c_next
        carry_out_ref[0, 0] = c_next

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "rpb", "k"))
def chain(params, carry, data3, e1, e2, variant="full", rpb=1024, k=K):
    total_rows = data3.shape[0] - 8
    num_blocks = total_rows // rpb

    def call(c):
        return pl.pallas_call(
            make_variant_kernel(variant),
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
                scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
            ),
            out_shape=(
                jax.ShapeDtypeStruct((total_rows, LANES), jnp.uint16),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        )(params, c, data3, data3, e1, e2)

    for _ in range(k):
        out, carry = call(carry)
    return carry


def _subgather_kernel(t_ref, i_ref, o_ref, done_ref):
    idx = i_ref[:]
    o_ref[:] = jnp.take_along_axis(t_ref[:], idx, axis=0)
    done_ref[0, 0] = pl.program_id(0)


@functools.partial(jax.jit, static_argnames=("rpb",))
def subgather(tbl, idx2, rpb=1024):
    rows = idx2.shape[0]
    return pl.pallas_call(
        _subgather_kernel,
        grid=(rows // rpb,),
        in_specs=[
            pl.BlockSpec((rpb, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rpb, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rpb, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
    )(tbl, idx2)


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
    # this harness re-implements the CUCKOO probe inline, so pin the
    # encoder to cuckoo placement (the production default is CHD now)
    enc = B.PallasFlatEncoder(
        table, capacity_bytes=N, rows_per_block=1024, force_mode="cuckoo"
    )
    log(f"cuckoo segs per table: {enc.e1.shape[0]}")

    rpb = 1024
    num_blocks = N // (rpb * LANES)
    padded_rows = num_blocks * rpb + 8
    buf = np.zeros((padded_rows * LANES,), np.uint8)
    buf[:N] = host
    d3 = jax.device_put(buf.reshape(padded_rows, LANES))
    params = jnp.asarray(np.array([N, 0, -1, enc.a1, enc.a2, 0, enc.shift, 0], np.int32))
    zc = jax.device_put(np.zeros((1, 1), np.int32))

    for variant in ("emit", "noscan", "nolookup", "full"):
        t0 = time.perf_counter()
        np.asarray(chain(params, zc, d3, enc.e1, enc.e2, variant=variant, rpb=rpb))
        log(f"{variant}: compile+first {time.perf_counter()-t0:.2f}s")
        np.asarray(chain(params, zc, d3, enc.e1, enc.e2, variant=variant, rpb=rpb))
        t0 = time.perf_counter()
        r = 3
        for _ in range(r):
            res = chain(params, zc, d3, enc.e1, enc.e2, variant=variant, rpb=rpb)
        np.asarray(res)
        dt = time.perf_counter() - t0
        log(f"{variant}: {N*K*r/dt/1e9:.2f} GB/s device-chained")
    del d3

    # sublane gather microtest: table (rows,128) == idx shape, idx in [0, rows)
    rows = N // LANES // 4  # int32 idx buffer = 64MB
    rng = np.random.default_rng(0)
    tbl = jax.device_put(rng.integers(0, 1 << 30, (rows, LANES), dtype=np.int32))
    idx = jax.device_put(rng.integers(0, rows, (rows, LANES), dtype=np.int32))
    try:
        t0 = time.perf_counter()
        out, done = subgather(tbl, idx, rpb=1024)
        np.asarray(done)
        log(f"subgather(full-block row range): compile+first {time.perf_counter()-t0:.2f}s")
        t0 = time.perf_counter()
        r = 3
        for _ in range(r):
            out, done = subgather(tbl, idx, rpb=1024)
        np.asarray(done)
        dt = time.perf_counter() - t0
        log(f"subgather rows-range=1024: {rows*LANES*r/dt/1e9:.2f} Gelem/s")
    except Exception as e:
        log(f"subgather FAILED: {type(e).__name__}: {str(e)[:300]}")

    # small row range (fits few vregs): idx in [0, 8) and [0, 64)
    for rng_rows in (8, 64, 256):
        idx_s = jax.device_put(
            rng.integers(0, rng_rows, (rows, LANES), dtype=np.int32))
        try:
            t0 = time.perf_counter()
            out, done = subgather(tbl, idx_s, rpb=1024)
            np.asarray(done)
            log(f"subgather idx<{rng_rows}: compile+first {time.perf_counter()-t0:.2f}s")
            t0 = time.perf_counter()
            r = 3
            for _ in range(r):
                out, done = subgather(tbl, idx_s, rpb=1024)
            np.asarray(done)
            dt = time.perf_counter() - t0
            log(f"subgather idx<{rng_rows}: {rows*LANES*r/dt/1e9:.2f} Gelem/s")
        except Exception as e:
            log(f"subgather idx<{rng_rows} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
