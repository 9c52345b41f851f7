"""Packed-dense (large-table) flat BPE: true device rate, chained dispatch."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from blt_tpu.merges import MergeTable
from blt_tpu.ops.bpe_pallas import (
    LANES,
    PallasFlatEncoder,
    filter_slots,
    flat_encode_chained,
)
from blt_tpu.ops.bpe_numpy import bpe_encode_flat
from blt_tpu.utils.compcache import enable_compilation_cache

N = 64 * 1024 * 1024
K = 8
RULES = 50_000


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    enable_compilation_cache()
    log(f"backend={jax.default_backend()}")
    base = np.load("/root/.cache/blt_tpu_bench_corpus.npy")
    host = np.tile(base, -(-N // base.shape[0]))[:N]

    rng = np.random.default_rng(1)
    all_pairs = rng.permutation(65536)[:RULES]
    merges = {(int(p) // 256, int(p) % 256): 256 + i for i, p in enumerate(all_pairs)}
    table = MergeTable.build(merges)

    for rpb in (512, 1024):
        enc = PallasFlatEncoder(table, capacity_bytes=N, rows_per_block=rpb)
        assert enc.direct, "expected packed-dense mode"
        num_blocks = N // enc.block
        padded_rows = num_blocks * rpb + 8
        buf = np.zeros((padded_rows * LANES,), np.uint8)
        buf[:N] = host
        d3 = jax.device_put(buf.reshape(padded_rows, LANES))
        params = enc.params(N)
        zc = jax.device_put(np.zeros((1, 1), np.int32))

        def run():
            return flat_encode_chained(
                params, enc.segs, zc, d3, enc.e1, enc.e2,
                k=K, mode="direct", rows_per_block=rpb,
            )

        t0 = time.perf_counter()
        out, c = run()
        np.asarray(c)
        log(f"dense rpb={rpb}: compile+first {time.perf_counter()-t0:.2f}s")
        m = 1024 * 1024
        slots_prefix = np.asarray(out).reshape(-1)[:m]
        toks_be, _ = filter_slots(slots_prefix, 0)
        toks = np.frombuffer(toks_be.tobytes(), ">u2").astype(np.int64)
        exp = bpe_encode_flat(host[:m], table)
        kk = min(len(toks), len(exp)) - 2
        log(f"dense rpb={rpb}: exact={toks[:kk].tolist() == exp[:kk].tolist()}")
        np.asarray(run()[1])
        t0 = time.perf_counter()
        r = 3
        for _ in range(r):
            res = run()[1]
        np.asarray(res)
        dt = time.perf_counter() - t0
        log(f"dense rpb={rpb}: {N*K*r/dt/1e9:.2f} GB/s device-chained")
        del d3


if __name__ == "__main__":
    main()
