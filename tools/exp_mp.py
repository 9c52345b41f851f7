"""Device-resident multipass experiment.

PallasTokenEncoder.encode round-trips the full token array through the
host between every merge pass (D2H + compaction + H2D per pass) — on a
tunneled chip that is link-bound, and even on a local host it wastes
PCIe. This prototypes the device-resident loop: the token-pass kernel
inside lax.while_loop with ON-DEVICE stable compaction
(sort_key_val over [alive ? iota : n+iota]), one H2D + one D2H total.

Compares exactness vs the host oracle and rate vs the host-compaction
encoder on a pass-heavy hierarchical table.

Usage: python tools/exp_mp.py [--mb 4] [--interpret]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from blt_tpu.merges import MergeTable
from blt_tpu.ops.bpe_pallas import LANES, PallasTokenEncoder, _token_pass_call
from blt_tpu.utils.compcache import enable_compilation_cache


def log(m):
    print(m, file=sys.stderr, flush=True)


def device_multipass(enc: PallasTokenEncoder, capacity: int):
    """Jitted (tokens_padded, n) -> (tokens_padded, m): full multipass."""
    rpb = enc.rows_per_block
    num_blocks = capacity // enc.block
    padded_rows = num_blocks * rpb + 8
    total = padded_rows * LANES
    iota = jnp.arange(capacity, dtype=jnp.int32)

    def one_pass(buf, n):
        params = jnp.concatenate([
            jnp.asarray([n], jnp.int32),
            jnp.asarray([enc.a1, enc.a2, enc.shift, 0, 0, 0, 0], jnp.int32),
        ])
        out = _token_pass_call(
            params, buf.reshape(padded_rows, LANES),
            enc.k1, enc.v1, enc.k2, enc.v2,
            interpret=enc.interpret, rows_per_block=rpb,
        ).reshape(-1)[:capacity]
        alive = (out != -1) & (iota < n)
        m = jnp.sum(alive.astype(jnp.int32))
        # stable partition: survivors first, original order
        keys = jnp.where(alive, iota, capacity + iota)
        _, compacted = jax.lax.sort_key_val(keys, out)
        buf2 = jnp.zeros((total,), jnp.int32).at[:capacity].set(compacted)
        return buf2, m

    def cond(state):
        _, n, m, first = state
        return first | ((m < n) & (m > 1))

    def body(state):
        buf, _, m, _ = state
        buf2, m2 = one_pass(buf, m)
        return buf2, m, m2, jnp.asarray(False)

    @jax.jit
    def run(buf, n):
        buf, _, m, _ = jax.lax.while_loop(
            cond, body, (buf, n + 1, n, jnp.asarray(True))
        )
        return buf[:capacity], m

    return run, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=4.0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    enable_compilation_cache()
    log(f"backend={jax.default_backend()}")

    # pass-heavy hierarchical table: chains force ~8 rounds
    merges = {(97, 98): 256, (256, 99): 257, (257, 257): 258,
              (258, 258): 259, (259, 100): 260, (32, 97): 261,
              (260, 261): 262, (262, 262): 263}
    table = MergeTable.build(merges)
    n = int(args.mb * 1024 * 1024)
    rng = np.random.default_rng(3)
    data = rng.choice(
        np.frombuffer(b"abcabccdabcd abcabc", np.uint8), size=n
    ).astype(np.uint8)

    from blt_tpu.ops.bpe_numpy import bpe_encode_multipass

    t0 = time.perf_counter()
    expected = bpe_encode_multipass(data, table)
    log(f"host oracle: {time.perf_counter() - t0:.2f}s "
        f"({n} bytes -> {expected.shape[0]} tokens)")

    enc = PallasTokenEncoder(
        table, capacity_tokens=n, interpret=args.interpret
    )
    capacity = enc.capacity

    # host-compaction encoder (current production path)
    t0 = time.perf_counter()
    got_host = enc.encode(data)
    dt_host_first = time.perf_counter() - t0
    ok_host = (got_host.shape == expected.shape
               and bool((got_host == expected).all()))
    log(f"host-compaction: first {dt_host_first:.2f}s exact={ok_host}")
    t0 = time.perf_counter()
    for _ in range(args.reps):
        got_host = enc.encode(data)
    dt_host = (time.perf_counter() - t0) / args.reps
    log(f"host-compaction: {n / dt_host / 1e6:.1f} MB/s")

    # device-resident loop
    run, total = device_multipass(enc, capacity)
    buf = np.zeros((total,), np.int32)
    buf[:n] = data
    buf_d = jnp.asarray(buf)
    t0 = time.perf_counter()
    out_d, m = run(buf_d, jnp.int32(n))
    m_i = int(m)
    got = np.asarray(out_d)[:m_i]
    dt_dev_first = time.perf_counter() - t0
    ok = got.shape == expected.shape and bool((got == expected).all())
    log(f"device-resident: first {dt_dev_first:.2f}s exact={ok}")
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out_d, m = run(buf_d, jnp.int32(n))
        m_i = int(m)
        got = np.asarray(out_d)[:m_i]
    dt_dev = (time.perf_counter() - t0) / args.reps
    log(f"device-resident: {n / dt_dev / 1e6:.1f} MB/s "
        f"(incl. H2D+D2H; {n / 1e6:.0f}MB input)")

    # device-resident COMPUTE rate (resident input, no transfers)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out_d, m = run(buf_d, jnp.int32(n))
    jax.block_until_ready((out_d, m))
    dt_res = (time.perf_counter() - t0) / args.reps
    log(f"device-resident compute-only: {n / dt_res / 1e6:.1f} MB/s")

    import json

    print(json.dumps({
        "exact_host": ok_host, "exact_device": ok,
        "host_compaction_mb_s": n / dt_host / 1e6,
        "device_resident_mb_s": n / dt_dev / 1e6,
        "device_compute_only_mb_s": n / dt_res / 1e6,
    }))


if __name__ == "__main__":
    main()
