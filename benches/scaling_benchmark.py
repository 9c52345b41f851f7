#!/usr/bin/env python3
"""Scaling-efficiency benchmark: bytes/s/chip at mesh sizes 1..N.

The BASELINE.json target is >= 80% multi-host scaling efficiency measured
at 1 chip / 1 host / N hosts. This harness times the sharded flat-BPE
encode (row-sharded corpus, replicated merges, carry-composition
collectives — blt_tpu/parallel/sharded.py) over meshes of increasing size
and reports throughput per chip and efficiency vs the 1-device run.

On a real pod slice, run one process per host after
blt_tpu.parallel.distributed.initialize(); every host executes the same
program. Without TPU hardware it validates the harness on virtual CPU
devices (XLA_FLAGS=--xla_force_host_platform_device_count=8), where the
absolute numbers are meaningless but sharding, collectives, and
bit-exactness are real.

Usage:
    python benches/scaling_benchmark.py [--mesh-sizes 1,2,4,8] [--mb 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh-sizes", default="")
    ap.add_argument("--mb", type=float, default=8.0, help="MB per device")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    if args.cpu:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    from blt_tpu.merges import MergeTable
    from blt_tpu.ops.bpe_numpy import bpe_encode_flat
    from blt_tpu.parallel.mesh import (
        make_mesh,
        replicated,
        row_sharding,
        vec_sharding,
    )
    from blt_tpu.parallel.sharded import sharded_flat_encode
    from blt_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    devices = jax.devices()
    sizes = (
        [int(s) for s in args.mesh_sizes.split(",") if s]
        if args.mesh_sizes
        else sorted({1, 2, len(devices)} & set(range(1, len(devices) + 1)))
        or [1]
    )
    sizes = [s for s in sizes if s <= len(devices)]

    per_dev = int(args.mb * 1024 * 1024)
    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"etaoinshrdlu cmfwyp", np.uint8)
    merges = {}
    vocab = 256
    sample = rng.choice(alphabet, size=65536).astype(np.uint8)
    pairs, counts = np.unique(
        sample[:-1].astype(np.int32) * 256 + sample[1:], return_counts=True
    )
    for p in pairs[np.argsort(-counts)][:200]:
        merges[(int(p) // 256, int(p) % 256)] = vocab
        vocab += 1
    table = MergeTable.build(merges)

    base_bps = None
    results = []
    for n_dev in sizes:
        mesh = make_mesh(devices[:n_dev])
        rows = row_sharding(mesh)
        vec = vec_sharding(mesh)
        rep = replicated(mesh)
        batch = rng.choice(alphabet, size=(n_dev, per_dev)).astype(np.uint8)
        lengths = np.full(n_dev, per_dev, np.int32)
        batch_d = jax.device_put(batch, rows)
        lengths_d = jax.device_put(lengths, vec)
        dense_d = jax.device_put(table.dense, rep)
        step = jax.jit(
            sharded_flat_encode,
            in_shardings=(rows, vec, rep),
            out_shardings=(rows, vec, rep),
        )
        tokens, counts_out, _ = step(batch_d, lengths_d, dense_d)
        jax.block_until_ready((tokens, counts_out))
        # spot-check row 0 against the host oracle
        got = np.asarray(tokens)[0][: int(np.asarray(counts_out)[0])]
        exp = bpe_encode_flat(batch[0], table)
        assert got.tolist() == exp.tolist(), "sharded encode mismatch"

        t0 = time.perf_counter()
        for _ in range(args.iters):
            tokens, counts_out, _ = step(batch_d, lengths_d, dense_d)
        jax.block_until_ready((tokens, counts_out))
        dt = time.perf_counter() - t0
        total = n_dev * per_dev * args.iters
        bps_chip = total / dt / n_dev
        if base_bps is None:
            base_bps = bps_chip
        results.append(
            {
                "mesh_devices": n_dev,
                "bytes_per_sec_per_chip": bps_chip,
                "scaling_efficiency_vs_1": bps_chip / base_bps,
                "backend": jax.default_backend(),
            }
        )
        print(json.dumps(results[-1]))


if __name__ == "__main__":
    main()
