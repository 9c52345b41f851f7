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


def run_processes(nproc: int, mb_total: float, merges_lines: str) -> dict:
    """Multi-PROCESS scaling: N real jax.distributed workers, one shared
    output file, through the public multi-host runner (parallel/multihost).

    Returns wall-clock + aggregate throughput; caller compares against a
    1-process run for host-level scaling efficiency (BASELINE configs 4-5).
    """
    import socket
    import subprocess
    import tempfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    size = int(mb_total * 1024 * 1024)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    with tempfile.TemporaryDirectory() as td:
        ip = os.path.join(td, "in.bin")
        op = os.path.join(td, "out.bin")
        mp = os.path.join(td, "m.txt")
        rng = np.random.default_rng(0)
        alphabet = np.frombuffer(b"etaoinshrdlu cmfwyp", np.uint8)
        rng.choice(alphabet, size=size).astype(np.uint8).tofile(ip)
        with open(mp, "w") as f:
            f.write(merges_lines)
        worker = (
            "import sys\nimport jax\n"
            "jax.config.update('jax_platforms','cpu')\n"
            "from blt_tpu.cli import main\n"
            "sys.exit(main(sys.argv[1:]))\n"
        )
        cli = ["-i", ip, "-o", op, "--merges", mp, "--engine", "numpy"]

        def env_for(pid):
            env = dict(os.environ)
            env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
            if nproc > 1:
                env["BLT_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
                env["BLT_NUM_PROCESSES"] = str(nproc)
                env["BLT_PROCESS_ID"] = str(pid)
            return env

        t0 = time.perf_counter()
        procs = [
            __import__("subprocess").Popen(
                [sys.executable, "-c", worker] + cli, env=env_for(pid),
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            )
            for pid in range(nproc)
        ]
        for p in procs:
            _, err = p.communicate(timeout=600)
            assert p.returncode == 0, err.decode()
        dt = time.perf_counter() - t0
        out_bytes = os.path.getsize(op)
    return {
        "processes": nproc,
        "input_bytes": size,
        "output_bytes": out_bytes,
        "wall_seconds": dt,
        "bytes_per_sec_aggregate": size / dt,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh-sizes", default="")
    ap.add_argument("--mb", type=float, default=8.0, help="MB per device")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument(
        "--processes", default="",
        help="comma list of process counts: multi-process (jax.distributed) "
             "host-scaling mode, e.g. --processes 1,2",
    )
    args = ap.parse_args()

    if args.processes:
        merges_lines = "101 116\n116 97\n97 111\n32 101\n"
        base = None
        for n in [int(x) for x in args.processes.split(",") if x]:
            rec = run_processes(n, args.mb, merges_lines)
            if base is None:
                base = rec["bytes_per_sec_aggregate"]
            rec["scaling_efficiency_vs_1proc"] = (
                rec["bytes_per_sec_aggregate"] / (base * rec["processes"])
            )
            print(json.dumps(rec), flush=True)
        return

    if args.cpu:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    sizes = [int(s) for s in args.mesh_sizes.split(",") if s] or None
    for rec in run_mesh_scaling(
        jax, mb_per_dev=args.mb, iters=args.iters, sizes=sizes
    ):
        print(json.dumps(rec))


def run_mesh_scaling(jax, mb_per_dev: float = 8.0, iters: int = 5,
                     sizes=None) -> list:
    """Time the sharded flat-BPE encode over meshes of 1..N devices.

    Returns one record per mesh size with bytes/s/chip and efficiency vs
    the 1-device run. Callable from bench.py's extras so a real
    multi-chip environment records scaling automatically.
    """
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
    if sizes is None:
        sizes = sorted(
            {1, 2, len(devices)} & set(range(1, len(devices) + 1))
        ) or [1]
    sizes = [s for s in sizes if s <= len(devices)]

    per_dev = int(mb_per_dev * 1024 * 1024)
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
        # Check the assembled stream against the host oracle: rows are one
        # contiguous stream (cross-row carries), so per-row comparison
        # against independent row encodes would be wrong at row tails.
        tokens_h, counts_h = np.asarray(tokens), np.asarray(counts_out)
        got = np.concatenate(
            [tokens_h[r, : counts_h[r]] for r in range(n_dev)]
        )
        exp = bpe_encode_flat(batch.reshape(-1), table)
        assert got.tolist() == exp.tolist(), "sharded encode mismatch"

        t0 = time.perf_counter()
        for _ in range(iters):
            tokens, counts_out, _ = step(batch_d, lengths_d, dense_d)
        jax.block_until_ready((tokens, counts_out))
        dt = time.perf_counter() - t0
        total = n_dev * per_dev * iters
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
    return results


if __name__ == "__main__":
    main()
