"""Multipass (hierarchical-table) encode on the real TPU:
Pallas token-pass kernel + host compaction vs the XLA sparse-lookup path.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from blt_tpu.merges import MergeTable
from blt_tpu.ops.bpe_numpy import bpe_encode_multipass
from blt_tpu.ops.bpe_pallas import PallasTokenEncoder
from blt_tpu.utils.compcache import enable_compilation_cache


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    enable_compilation_cache()
    log(f"backend={jax.default_backend()}")
    base = np.load("/root/.cache/blt_tpu_bench_corpus.npy")

    # hierarchical table: byte pairs + chained rules over merged ids
    merges = {(101, 116): 256, (256, 97): 257, (257, 111): 258,
              (32, 101): 259, (259, 116): 260, (115, 104): 261,
              (261, 114): 262, (100, 108): 263, (258, 263): 264}
    t = MergeTable.build(merges)
    assert not t.flat

    n = 16 * 1024 * 1024
    chunk = np.tile(base, -(-n // base.shape[0]))[:n]

    enc = PallasTokenEncoder(t, capacity_tokens=n)
    t0 = time.perf_counter()
    got = enc.encode(chunk)
    log(f"pallas multipass 16MB: first (incl compile) {time.perf_counter()-t0:.2f}s")
    t0 = time.perf_counter()
    got = enc.encode(chunk)
    dt = time.perf_counter() - t0
    log(f"pallas multipass 16MB: {dt*1e3:.1f} ms = {n/dt/1e9:.2f} GB/s end-to-end")

    # exactness on a 1MB prefix chunk
    m = 1024 * 1024
    small = chunk[:m]
    exp = bpe_encode_multipass(small, t)
    got_small = enc.encode(small)
    log(f"exact 1MB: {got_small.tolist() == exp.tolist()}")

    # XLA multipass path on the same 1MB (16MB would take too long)
    from blt_tpu.ops import bpe_jax
    from blt_tpu.utils.chunking import align_up

    keys, vals = bpe_jax.sparse_table_device(t)
    ns = align_up(m)
    buf = np.zeros(ns, np.uint8)
    buf[:m] = small
    dev = jnp.asarray(buf)
    t0 = time.perf_counter()
    toks, count = bpe_jax.multipass_encode(dev, jnp.int32(m), keys, vals)
    toks.block_until_ready()
    log(f"xla multipass 1MB: first (incl compile) {time.perf_counter()-t0:.2f}s")
    t0 = time.perf_counter()
    toks, count = bpe_jax.multipass_encode(dev, jnp.int32(m), keys, vals)
    host = np.asarray(toks)[: int(count)]
    dt = time.perf_counter() - t0
    log(f"xla multipass 1MB: {dt*1e3:.1f} ms = {m/dt/1e9:.3f} GB/s")
    log(f"xla == oracle: {host.tolist() == exp.tolist()}")


if __name__ == "__main__":
    main()
