"""Measure true device throughput by chaining K kernel calls in one jit.

Each call consumes the previous call's tiny output (carry/token), so the
device executes K back-to-back kernels with no host round-trip between
them. This separates kernel rate from per-dispatch tunnel overhead.
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
    PallasFlatEncoder,
    _flat_encode_pallas_call,
)
from blt_tpu.utils.compcache import enable_compilation_cache

N = 64 * 1024 * 1024
K = 96
RULES = 500


def log(m):
    print(m, file=sys.stderr, flush=True)


def _copy_kernel(tok_ref, d_ref, o_ref, done_ref):
    o_ref[:] = d_ref[:]
    done_ref[0, 0] = pl.program_id(0) + tok_ref[0, 0]


def _widen_kernel(tok_ref, d_ref, o_ref, done_ref):
    o_ref[:] = (d_ref[:].astype(jnp.int32) << 8).astype(jnp.uint16)
    done_ref[0, 0] = pl.program_id(0) + tok_ref[0, 0]


def _call(kernel, data2, tok, rpb, out_dtype):
    rows = data2.shape[0]
    return pl.pallas_call(
        kernel,
        grid=(rows // rpb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((rpb, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rpb, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), out_dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
    )(tok, data2)


@functools.partial(jax.jit, static_argnames=("rpb", "k"))
def copy_chain(data2, tok, rpb=2048, k=K):
    for _ in range(k):
        out, tok = _call(_copy_kernel, data2, tok, rpb, jnp.uint8)
    return tok


@functools.partial(jax.jit, static_argnames=("rpb", "k"))
def widen_chain(data2, tok, rpb=2048, k=K):
    for _ in range(k):
        out, tok = _call(_widen_kernel, data2, tok, rpb, jnp.uint16)
    return tok


@functools.partial(jax.jit, static_argnames=("rpb", "k", "mode"))
def bpe_chain(params, carry, data3, e1, e2, rpb=1024, k=K, mode="cuckoo"):
    for _ in range(k):
        out, carry = _flat_encode_pallas_call(
            params, jnp.zeros(8, jnp.int32), carry, data3, e1, e2,
            mode=mode, rows_per_block=rpb
        )
    return carry


def main():
    enable_compilation_cache()
    log(f"backend={jax.default_backend()}")
    base = np.load("/root/.cache/blt_tpu_bench_corpus.npy")
    host = np.tile(base, -(-N // base.shape[0]))[:N]
    rows = N // LANES
    buf0 = jax.device_put(host.reshape(rows, LANES))
    tok0 = jax.device_put(np.zeros((1, 1), np.int32))

    for name, fn, rpbs in (
        ("copy", copy_chain, (2048,)),
        ("widen", widen_chain, (2048, 8192)),
    ):
        for rpb in rpbs:
            t0 = time.perf_counter()
            np.asarray(fn(buf0, tok0, rpb=rpb))
            log(f"{name} rpb={rpb}: compile+first {time.perf_counter()-t0:.2f}s")
            np.asarray(fn(buf0, tok0, rpb=rpb))
            t0 = time.perf_counter()
            r = 4
            for _ in range(r):
                res = fn(buf0, tok0, rpb=rpb)
            np.asarray(res)
            dt = time.perf_counter() - t0
            log(f"{name} rpb={rpb}: {N*K*r/dt/1e9:.2f} GB/s device-chained")
    del buf0

    sample = host[: 4 * 1024 * 1024]
    pairs, counts = np.unique(
        sample[:-1].astype(np.int32) * 256 + sample[1:].astype(np.int32),
        return_counts=True,
    )
    top = pairs[np.argsort(-counts)][:RULES]
    merges = {(int(p) // 256, int(p) % 256): 256 + i for i, p in enumerate(top)}
    table = MergeTable.build(merges)

    for rpb in (1024,):
        enc = PallasFlatEncoder(table, capacity_bytes=N, rows_per_block=rpb)
        num_blocks = N // enc.block
        padded_rows = num_blocks * rpb + 8
        buf = np.zeros((padded_rows * LANES,), np.uint8)
        buf[:N] = host
        d3 = jax.device_put(buf.reshape(padded_rows, LANES))
        params = enc.params(N)
        zc = jax.device_put(np.zeros((1, 1), np.int32))
        t0 = time.perf_counter()
        np.asarray(bpe_chain(params, zc, d3, enc.e1, enc.e2, rpb=rpb, mode=enc.mode))
        log(f"bpe rpb={rpb}: compile+first {time.perf_counter()-t0:.2f}s")
        np.asarray(bpe_chain(params, zc, d3, enc.e1, enc.e2, rpb=rpb, mode=enc.mode))
        t0 = time.perf_counter()
        r = 4
        for _ in range(r):
            res = bpe_chain(params, zc, d3, enc.e1, enc.e2, rpb=rpb, mode=enc.mode)
        np.asarray(res)
        dt = time.perf_counter() - t0
        log(f"bpe rpb={rpb}: {N*K*r/dt/1e9:.2f} GB/s device-chained")


if __name__ == "__main__":
    main()
