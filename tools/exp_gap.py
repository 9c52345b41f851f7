"""Measure the gap-tolerant resident multipass vs the sort-per-pass loop.

Same 8MB workload as bench.py's multipass_resident section (hier table,
3 rounds). Timing: 2 pipelined calls per sample, forced by reading the
SECOND call's scalar m (device executes enqueued programs in order, so
the read bounds both makespans — the bench.py `force` protocol).

Usage: python tools/exp_gap.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from blt_tpu.utils.compcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import make_corpus, rate_stats  # noqa: E402
from blt_tpu.merges import MergeTable  # noqa: E402
from blt_tpu.ops.bpe_numpy import bpe_encode_multipass  # noqa: E402
from blt_tpu.ops.bpe_pallas import (  # noqa: E402
    LANES,
    PallasTokenEncoder,
    _multipass_gap_wire_call,
    _multipass_resident_call,
    _padded_rows,
    expand_gap_wire_host,
)

NBYTES = 8 * 1024 * 1024
REPS = 5
PIPE = 6


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    results = {"backend": jax.default_backend(), "nbytes": NBYTES}
    rng = np.random.default_rng(0)
    host = make_corpus(rng, NBYTES)
    hier = {(97, 98): 256, (256, 99): 257, (257, 257): 258, (32, 97): 259}
    table = MergeTable.build(hier)
    enc = PallasTokenEncoder(table, capacity_tokens=NBYTES)
    cap = enc.capacity
    pr = _padded_rows(cap, enc.block, enc.rows_per_block)
    bufg = np.full((cap,), -1, np.int32)  # gap contract: -1 padding
    bufg[: host.shape[0]] = host
    bufg_d = jnp.asarray(bufg)
    buf = np.zeros((pr * LANES,), np.int32)  # sort-loop layout
    buf[: host.shape[0]] = host
    buf_d = jnp.asarray(buf)
    n_d = jnp.int32(host.shape[0])
    hp = jnp.asarray([enc.a1, enc.a2, enc.shift], jnp.int32)
    kw = dict(capacity=cap, interpret=False,
              rows_per_block=enc.rows_per_block)

    def gap_call():
        return _multipass_gap_wire_call(
            bufg_d, n_d, hp, enc.k1, enc.v1, enc.k2, enc.v2, **kw)

    def sort_call():
        return _multipass_resident_call(
            buf_d, n_d, hp, enc.k1, enc.v1, enc.k2, enc.v2, **kw)

    # --- exactness on hardware first ---
    t0 = time.perf_counter()
    wire_d, m_d = gap_call()
    log(f"gap compile+first: {time.perf_counter()-t0:.1f}s")
    wire_h = np.asarray(wire_d)
    toks = expand_gap_wire_host(wire_h, cap)
    exp = bpe_encode_multipass(host, table)
    exp_wire = np.asarray(exp, np.uint16).astype(">u2").tobytes()
    ok = toks.shape[0] == int(m_d) and toks.tobytes() == exp_wire
    results["gap_exact_vs_oracle"] = bool(ok)
    log(f"gap exactness vs oracle (8MB hardware): {ok}")

    # host expansion cost (drain-thread work)
    t0 = time.perf_counter()
    for _ in range(3):
        toks = expand_gap_wire_host(wire_h, cap)
    results["expand_host_ms"] = (time.perf_counter() - t0) / 3 * 1e3
    log(f"host expand: {results['expand_host_ms']:.1f} ms")

    # --- rates ---
    def timed(name, fn):
        fn()
        rates = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = None
            for _ in range(PIPE):
                out = fn()
            int(np.asarray(out[1]))  # scalar m of the LAST call
            rates.append(PIPE * NBYTES / (time.perf_counter() - t0))
        st = rate_stats(rates)
        results[name] = st
        log(f"{name}: {st['median']/1e6:.1f} MB/s "
            f"(IQR {st['iqr']/1e6:.1f}, n={REPS})")

    timed("gap_wire_bytes_per_sec", gap_call)

    # rows_per_block=1024 variant (flat kernel's optimum; exp_mp_ablate
    # saw 4% on the plain pass)
    enc2 = PallasTokenEncoder(table, capacity_tokens=NBYTES,
                              rows_per_block=1024)
    buf2 = np.full((cap,), -1, np.int32)
    buf2[: host.shape[0]] = host
    buf2_d = jnp.asarray(buf2)
    kw2 = dict(capacity=cap, interpret=False, rows_per_block=1024)

    def gap1024():
        return _multipass_gap_wire_call(
            buf2_d, n_d, hp, enc2.k1, enc2.v1, enc2.k2, enc2.v2, **kw2)

    t0 = time.perf_counter()
    w2, m2 = gap1024()
    log(f"gap1024 compile+first: {time.perf_counter()-t0:.1f}s")
    ok2 = expand_gap_wire_host(np.asarray(w2), cap).tobytes() == exp_wire
    results["gap1024_exact"] = bool(ok2)
    log(f"gap1024 exact: {ok2}")
    timed("gap1024_wire_bytes_per_sec", gap1024)

    t0 = time.perf_counter()
    sort_call()
    log(f"sort compile+first: {time.perf_counter()-t0:.1f}s")
    timed("sort_loop_bytes_per_sec", sort_call)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
