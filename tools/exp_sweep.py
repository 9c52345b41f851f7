"""Block-size sweep for the Pallas kernels on the real TPU.

Measures device throughput of the basic widen kernel, the flat-BPE kernel,
and a raw u8 copy kernel (the dispatch/DMA floor) at several rows_per_block
values, to pick the production block size.
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
    basic_encode_pallas,
)
from blt_tpu.utils.compcache import enable_compilation_cache

N = 64 * 1024 * 1024
ITERS = 8
RULES = 500


def log(m):
    print(m, file=sys.stderr, flush=True)


def force(x):
    np.asarray(x)


def _copy_kernel(d_ref, o_ref, done_ref):
    o_ref[:] = d_ref[:]
    done_ref[0, 0] = pl.program_id(0)


@functools.partial(jax.jit, static_argnames=("rpb",))
def copy_pallas(data2, rpb=2048):
    rows = data2.shape[0]
    return pl.pallas_call(
        _copy_kernel,
        grid=(rows // rpb,),
        in_specs=[pl.BlockSpec((rpb, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((rpb, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
    )(data2)


def main():
    enable_compilation_cache()
    log(f"backend={jax.default_backend()}")
    cache = "/root/.cache/blt_tpu_bench_corpus.npy"
    base = np.load(cache)
    host = np.tile(base, -(-N // base.shape[0]))[:N]

    rows = N // LANES
    buf0 = jax.device_put(host.reshape(rows, LANES))

    for rpb in (512, 2048, 8192):
        t0 = time.perf_counter()
        out, done = copy_pallas(buf0, rpb=rpb)
        force(done)
        log(f"copy rpb={rpb}: compile+first {time.perf_counter()-t0:.2f}s")
        out, done = copy_pallas(buf0, rpb=rpb)
        force(done)
        t0 = time.perf_counter()
        dones = [copy_pallas(buf0, rpb=rpb)[1] for _ in range(ITERS)]
        force(dones[-1])
        log(f"copy rpb={rpb}: {N*ITERS/(time.perf_counter()-t0)/1e9:.2f} GB/s")

    for rpb in (512, 2048, 8192):
        t0 = time.perf_counter()
        out, done = basic_encode_pallas(buf0, rows_per_block=rpb)
        force(done)
        log(f"basic rpb={rpb}: compile+first {time.perf_counter()-t0:.2f}s")
        out, done = basic_encode_pallas(buf0, rows_per_block=rpb)
        force(done)
        t0 = time.perf_counter()
        dones = [basic_encode_pallas(buf0, rows_per_block=rpb)[1] for _ in range(ITERS)]
        force(dones[-1])
        log(f"basic rpb={rpb}: {N*ITERS/(time.perf_counter()-t0)/1e9:.2f} GB/s")
    del buf0

    sample = host[: 4 * 1024 * 1024]
    pairs, counts = np.unique(
        sample[:-1].astype(np.int32) * 256 + sample[1:].astype(np.int32),
        return_counts=True,
    )
    top = pairs[np.argsort(-counts)][:RULES]
    merges = {(int(p) // 256, int(p) % 256): 256 + i for i, p in enumerate(top)}
    table = MergeTable.build(merges)

    for rpb in (512, 1024, 2048):
        enc = PallasFlatEncoder(table, capacity_bytes=N, rows_per_block=rpb)
        num_blocks = N // enc.block
        padded_rows = num_blocks * rpb + 8
        buf = np.zeros((padded_rows * LANES,), np.uint8)
        buf[:N] = host
        d3 = jax.device_put(buf.reshape(padded_rows, LANES))
        params = enc.params(N)
        zc = jnp.asarray(np.zeros((1, 1), np.int32))

        def run():
            return _flat_encode_pallas_call(
                params, enc.segs, zc, d3, enc.e1, enc.e2,
                mode=enc.mode, rows_per_block=rpb,
            )[1]

        t0 = time.perf_counter()
        force(run())
        log(f"bpe rpb={rpb}: compile+first {time.perf_counter()-t0:.2f}s")
        force(run())
        t0 = time.perf_counter()
        cs = [run() for _ in range(ITERS)]
        force(cs[-1])
        log(f"bpe rpb={rpb}: {N*ITERS/(time.perf_counter()-t0)/1e9:.2f} GB/s")
        del d3


if __name__ == "__main__":
    main()
