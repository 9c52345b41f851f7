"""Component costs of the device-resident multipass loop (VERDICT r4 #1).

The general-table multipass (`_multipass_resident_call`) runs at 104 MB/s
vs the 625 MB/s per-chip north-star bar. The bench workload makes only
3 passes (2 merge rounds + the zero-merge fixpoint check), so per-pass
cost is ~26ms for 8M tokens. This probe times each candidate primitive
RESIDENT on the device (chained samples, no link traffic in the timed
region) to decide the compaction redesign:

  pass      one _token_pass_call (the merge kernel itself)
  sortkv    lax.sort_key_val over capacity (current compaction)
  sort1bit  stable sort keyed by the 1-bit alive flag (less key entropy)
  cumsum    jnp.cumsum int32 (prefix sums: the building block)
  take      monotone gather x[idx]
  scatter   zeros.at[pos].set(vals), monotone unique pos
  fullloop  _multipass_resident_call end-to-end (the current 104 MB/s)

Usage: python tools/exp_compact.py [--json out.json]
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

from bench import make_corpus  # noqa: E402
from blt_tpu.merges import MergeTable  # noqa: E402
from blt_tpu.ops.bpe_pallas import (  # noqa: E402
    LANES,
    PallasTokenEncoder,
    _multipass_resident_call,
    _token_pass_call,
)

CAP = 8 * 1024 * 1024  # tokens, = the bench's multipass capacity
REPS = 5
INNER = 3


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(name, fn, bytes_per_call, results):
    fn()  # compile + warm
    jax.block_until_ready(fn())
    rates = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = None
        for _ in range(INNER):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / INNER
        rates.append(dt)
    med = sorted(rates)[len(rates) // 2]
    results[name] = {
        "ms": med * 1e3,
        "melem_per_s": CAP / med / 1e6,
        "eff_bytes_per_s": bytes_per_call / med,
    }
    log(f"{name}: {med*1e3:.2f} ms ({CAP/med/1e6:.0f} Melem/s)")


def main():
    results = {"backend": jax.default_backend(), "cap": CAP}
    rng = np.random.default_rng(0)
    host = make_corpus(rng, CAP)
    hier = {(97, 98): 256, (256, 99): 257, (257, 257): 258, (32, 97): 259}
    table = MergeTable.build(hier)
    enc = PallasTokenEncoder(table, capacity_tokens=CAP)

    nb = CAP // enc.block
    pr = nb * enc.rows_per_block + 8
    buf = np.zeros((pr * LANES,), np.int32)
    buf[: host.shape[0]] = host
    buf_d = jnp.asarray(buf)
    data3 = jnp.asarray(buf.reshape(pr, LANES))
    hp = jnp.asarray([enc.a1, enc.a2, enc.shift], jnp.int32)
    params = jnp.asarray(
        np.array([CAP, enc.a1, enc.a2, enc.shift, 0, 0, 0, 0], np.int32)
    )

    # --- the merge-pass kernel alone ---
    @jax.jit
    def one_pass():
        return _token_pass_call(
            params, data3, enc.k1, enc.v1, enc.k2, enc.v2,
            rows_per_block=enc.rows_per_block,
        )

    timed("pass", one_pass, CAP, results)

    # tombstone pattern matching the real pass-1 output (isolated holes)
    out1 = np.asarray(one_pass()).reshape(-1)[:CAP]
    alive_h = out1 != -1
    log(f"pass-1 tombstones: {CAP - int(alive_h.sum())}")
    vals_d = jnp.asarray(out1)
    alive_d = jnp.asarray(alive_h)
    iota = jnp.arange(CAP, dtype=jnp.int32)

    @jax.jit
    def sortkv(vals, alive):
        keys = jnp.where(alive, iota, CAP + iota)
        return jax.lax.sort_key_val(keys, vals)[1]

    timed("sortkv", lambda: sortkv(vals_d, alive_d), CAP * 4, results)

    @jax.jit
    def sort1bit(vals, alive):
        key = (~alive).astype(jnp.int32)
        return jax.lax.sort((key, vals), is_stable=True, num_keys=1)[1]

    timed("sort1bit", lambda: sort1bit(vals_d, alive_d), CAP * 4, results)

    @jax.jit
    def cumsum(alive):
        return jnp.cumsum(alive.astype(jnp.int32))

    timed("cumsum", lambda: cumsum(alive_d), CAP * 4, results)

    idx_h = np.minimum(
        np.arange(CAP, dtype=np.int32)
        + np.cumsum(~alive_h).astype(np.int32),
        CAP - 1,
    )
    idx_d = jnp.asarray(idx_h)

    @jax.jit
    def take(vals, idx):
        return vals[idx]

    timed("take", lambda: take(vals_d, idx_d), CAP * 4, results)

    pos_h = np.where(
        alive_h, np.cumsum(alive_h).astype(np.int32) - 1, CAP
    ).astype(np.int32)
    pos_d = jnp.asarray(pos_h)

    @jax.jit
    def scatter(vals, pos):
        return jnp.zeros(CAP, jnp.int32).at[pos].set(
            vals, mode="drop", unique_indices=True, indices_are_sorted=False
        )

    timed("scatter", lambda: scatter(vals_d, pos_d), CAP * 4, results)

    # --- the current full loop, for reference ---
    args = dict(capacity=CAP, rows_per_block=enc.rows_per_block)

    @functools.partial(jax.jit, static_argnames=())
    def full():
        return _multipass_resident_call(
            buf_d, jnp.int32(host.shape[0]), hp,
            enc.k1, enc.v1, enc.k2, enc.v2, **args,
        )

    timed("fullloop", full, CAP, results)
    results["fullloop"]["mb_per_s"] = (
        host.shape[0] / (results["fullloop"]["ms"] / 1e3) / 1e6
    )
    log(f"fullloop rate: {results['fullloop']['mb_per_s']:.1f} MB/s")

    out = json.dumps(results)
    print(out, flush=True)
    if "--json" in sys.argv:
        path = sys.argv[sys.argv.index("--json") + 1]
        with open(path, "w") as f:
            f.write(out)


if __name__ == "__main__":
    main()
