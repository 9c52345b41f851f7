"""Same-session A/B of the gap-resident loop glue variants.

Cross-session runs of tools/exp_gap.py swung 316-377 MB/s while the
sort control stayed at 103-106 — too much drift to attribute to the
glue edits. This probe compiles all four glue variants (same gap
kernel) and times them ROUND-ROBIN so tunnel/session drift hits every
variant equally:

  A  full(-1) rebuild per pass + m from fused SMEM counts
  B  carry.at[:cap].set (aliasable) + m from fused SMEM counts
  C  carry.at[:cap].set + m from an XLA reduce over the output
  D  full(-1) rebuild + XLA reduce

Usage: python tools/exp_gapvar.py
"""

from __future__ import annotations

import functools
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
from blt_tpu.ops.bpe_pallas import (  # noqa: E402
    LANES,
    _GAP_COMPACT_EVERY,
    PallasTokenEncoder,
    _padded_rows,
    _token_pass_gap_call,
    expand_gap_wire_host,
)
from blt_tpu.ops.bpe_numpy import bpe_encode_multipass  # noqa: E402

NBYTES = 8 * 1024 * 1024
ROUNDS = 5


def log(m):
    print(m, file=sys.stderr, flush=True)


@functools.partial(
    jax.jit, static_argnames=("capacity", "rows_per_block", "glue")
)
def loop_variant(buf, n, hp, k1, v1, k2, v2, capacity, rows_per_block,
                 glue: str):
    rpb = rows_per_block
    padded_rows = buf.shape[0] // LANES
    total = padded_rows * LANES
    iota_cap = jnp.arange(capacity, dtype=jnp.int32)
    params = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), hp, jnp.zeros(4, jnp.int32)]
    )

    def one_pass(b):
        out, counts = _token_pass_gap_call(
            params, b.reshape(padded_rows, LANES), k1, v1, k2, v2,
            rows_per_block=rpb,
        )
        flat = out.reshape(-1)
        if glue in ("A", "B"):
            m2 = jnp.sum(counts)
        else:
            m2 = jnp.sum((flat >= 0).astype(jnp.int32))
        if glue in ("A", "D"):
            b2 = jnp.full((total,), -1, jnp.int32).at[:capacity].set(flat)
        else:
            b2 = b.at[:capacity].set(flat)
        return b2, m2

    def compact(b):
        s = b[:capacity]
        alive = s >= 0
        keys = jnp.where(alive, iota_cap, capacity + iota_cap)
        _, comp = jax.lax.sort_key_val(keys, s)
        return b.at[:capacity].set(comp)

    def cond(state):
        _, prev, m, _, first = state
        return first | ((m < prev) & (m > 1))

    def body(state):
        b, _, m, c, _ = state
        b2, m2 = one_pass(b)
        c2 = c + 1
        do_compact = (c2 % _GAP_COMPACT_EVERY == 0) & (m2 < m) & (m2 > 1)
        b3 = jax.lax.cond(do_compact, compact, lambda x: x, b2)
        return b3, m, m2, c2, jnp.asarray(False)

    b, _, m, _, _ = jax.lax.while_loop(
        cond, body, (buf, n + 1, n, jnp.int32(0), jnp.asarray(True))
    )
    return b[:capacity], m


def main():
    results = {"backend": jax.default_backend(), "nbytes": NBYTES}
    rng = np.random.default_rng(0)
    host = make_corpus(rng, NBYTES)
    hier = {(97, 98): 256, (256, 99): 257, (257, 257): 258, (32, 97): 259}
    table = MergeTable.build(hier)
    enc = PallasTokenEncoder(table, capacity_tokens=NBYTES)
    cap = enc.capacity
    pr = _padded_rows(cap, enc.block, enc.rows_per_block)
    buf = np.full((pr * LANES,), -1, np.int32)
    buf[: host.shape[0]] = host
    buf_d = jnp.asarray(buf)
    n_d = jnp.int32(host.shape[0])
    hp = jnp.asarray([enc.a1, enc.a2, enc.shift], jnp.int32)

    exp = bpe_encode_multipass(host, table)

    fns = {}
    for glue in ("A", "B", "C", "D"):
        def fn(g=glue):
            return loop_variant(buf_d, n_d, hp, enc.k1, enc.v1, enc.k2,
                                enc.v2, capacity=cap,
                                rows_per_block=enc.rows_per_block, glue=g)

        t0 = time.perf_counter()
        toks_d, m_d = fn()
        toks = np.asarray(toks_d)
        ok = (toks[toks >= 0] == exp).all() and exp.size == int(m_d)
        log(f"{glue}: compile {time.perf_counter()-t0:.1f}s exact={bool(ok)}")
        results[f"{glue}_exact"] = bool(ok)
        fns[glue] = fn

    samples = {g: [] for g in fns}
    for _ in range(ROUNDS):
        for g, fn in fns.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(2):
                out = fn()
            int(np.asarray(out[1]))
            samples[g].append(2 * NBYTES / (time.perf_counter() - t0))
    for g in fns:
        st = rate_stats(samples[g])
        results[g] = st
        log(f"{g}: {st['median']/1e6:.1f} MB/s (IQR {st['iqr']/1e6:.1f})")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
