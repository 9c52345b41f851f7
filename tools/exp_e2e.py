"""E2E pipeline tuning probe (VERDICT r2 items 1/7).

Measured facts this probe chases (BENCH r3 instrumentation):
- the tunnel is HALF-duplex (duplex_factor 0.99), so the serial bound
  1/(1/h2d + r/d2h) is the correct ceiling;
- at the default 64MB device batch a 100MB file is only 2 batches, so
  host pack/filter work cannot hide behind link transfers (stage
  occupancy shows it serialized);
- the 10MB warm run has ~4s of per-run fixed cost that is NOT compile.

Sweeps BLT_DEVICE_BATCH_BYTES over one live process and phase-times a
small run. Usage: python tools/exp_e2e.py [--size-mb 100]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size-mb", type=int, default=100)
    ap.add_argument("--batches-mb", default="64,16,8")
    ap.add_argument("--mode", default="basic")
    args = ap.parse_args()

    import tempfile

    from benches.pipeline_benchmark import make_file, run_once
    from blt_tpu.config import Engine
    from blt_tpu.pipeline import feeder
    from blt_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    size = args.size_mb * 1024 * 1024
    results = {}
    with tempfile.TemporaryDirectory() as td:
        ip = os.path.join(td, "in.bin")
        op = os.path.join(td, "out.bin")
        mp = os.path.join(td, "m.txt")
        make_file(ip, size)
        with open(mp, "w") as f:
            for a, b in [(101, 116), (116, 97), (97, 111), (32, 101)]:
                f.write(f"{a} {b}\n")

        for bs_mb in [int(x) for x in args.batches_mb.split(",")]:
            os.environ["BLT_DEVICE_BATCH_BYTES"] = str(bs_mb * 1024 * 1024)
            run_once(ip, op, args.mode, Engine.JAX, mp)  # compile + warm
            feeder.stage_stats(reset=True)
            t0 = time.perf_counter()
            dt = run_once(ip, op, args.mode, Engine.JAX, mp)
            occ = feeder.stage_stats(reset=True)
            rate = size / dt
            log(f"batch {bs_mb}MB: {rate/1e6:.2f} MB/s  occupancy={ {k: {kk: round(vv,2) if isinstance(vv,float) else vv for kk,vv in v.items()} for k,v in occ.items()} }")
            results[f"batch_{bs_mb}mb"] = {"rate": rate, "occupancy": occ}

        # phase-timed small run: where do the fixed seconds go?
        ip10 = os.path.join(td, "in10.bin")
        n10 = 10 * 1024 * 1024
        make_file(ip10, n10)
        os.environ["BLT_DEVICE_BATCH_BYTES"] = str(16 * 1024 * 1024)
        run_once(ip10, op, args.mode, Engine.JAX, mp)  # compile+warm
        from blt_tpu.config import CoreConfig
        from blt_tpu.pipeline.runner import run_tokenizer

        t0 = time.perf_counter()
        cfg = CoreConfig.new_from_cli(
            input=ip10, output=op, merges=mp, engine=Engine.JAX
        )
        t_cfg = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_tokenizer(cfg)
        t_run = time.perf_counter() - t0
        log(f"10MB warm: config {t_cfg*1e3:.0f}ms run {t_run:.2f}s "
            f"({n10 / t_run / 1e6:.2f} MB/s)")
        results["small_run"] = {"config_s": t_cfg, "run_s": t_run}

        # decompose: raw link time for the same bytes, same process
        import jax

        x = np.fromfile(ip10, dtype=np.uint8)
        f = jax.jit(lambda a: (a.astype(np.uint16) << 8))
        d = jax.device_put(x[: 1 << 20])
        np.asarray(f(d))
        t0 = time.perf_counter()
        d = jax.device_put(x)
        jax.block_until_ready(d)
        t_h2d = time.perf_counter() - t0
        o = f(d)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        np.asarray(o)
        t_d2h = time.perf_counter() - t0
        log(f"10MB raw link: h2d {t_h2d:.2f}s d2h(x2) {t_d2h:.2f}s "
            f"=> pure transfer {t_h2d + t_d2h:.2f}s")
        results["small_link"] = {"h2d_s": t_h2d, "d2h2x_s": t_d2h}

    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
