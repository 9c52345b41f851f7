"""Benchmark: tokenization bytes/sec/chip (basic + flat BPE device kernels).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "bytes/s", "vs_baseline": N, ...}

Baseline: the reference's best published number, ~2.6 GB/s end-to-end on a
CPU dev machine in passthrough mode (reference README.md:274-278; it
publishes no basic/BPE numbers — see BASELINE.md). The headline value here
is the geometric mean of basic-mode and BPE-mode steady-state device
throughput on one chip, i.e. real tokenization work, not passthrough.

Methodology: device-resident input (the feeder pipeline overlaps host I/O;
this measures the compute ceiling per chip), jit-compiled once, then timed
over repeated dispatches with a final block_until_ready.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_BASELINE_BYTES_PER_SEC = 2.6e9
N = 64 * 1024 * 1024  # 64MB device buffer
WARMUP = 3
ITERS = 10


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from blt_tpu.merges import MergeTable
    from blt_tpu.ops import bpe_jax
    from blt_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()

    backend = jax.default_backend()
    log(f"backend={backend} devices={jax.devices()}")

    # Text-like corpus: zipf-ish over ASCII so BPE rules actually fire.
    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(
        b"etaoinshrdlucmfwypvbgkjqxz ETAOIN,.;:'\"!?0123456789", np.uint8
    )
    probs = np.ones(len(alphabet)) / len(alphabet)
    weights = 1.0 / np.arange(1, len(alphabet) + 1)
    probs = weights / weights.sum()
    host = rng.choice(alphabet, size=N, p=probs).astype(np.uint8)

    # 500-rule flat merge table over the frequent byte pairs.
    pair_hist = {}
    sample = host[: 4 * 1024 * 1024]
    pairs, counts = np.unique(
        sample[:-1].astype(np.int32) * 256 + sample[1:].astype(np.int32),
        return_counts=True,
    )
    top = pairs[np.argsort(-counts)][:500]
    merges = {(int(p) // 256, int(p) % 256): 256 + i for i, p in enumerate(top)}
    table = MergeTable.build(merges)
    assert table.flat

    data = jnp.asarray(host)
    dense = bpe_jax.dense_table_device(table)
    length = jnp.int32(N)
    no_carry = jnp.asarray(False)
    eof = jnp.int32(-1)

    # --- basic mode ---
    t0 = time.perf_counter()
    out = bpe_jax.basic_encode(data)
    out.block_until_ready()
    log(f"basic compile+first: {time.perf_counter()-t0:.2f}s")
    for _ in range(WARMUP):
        out = bpe_jax.basic_encode(data)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = bpe_jax.basic_encode(data)
    out.block_until_ready()
    basic_bps = N * ITERS / (time.perf_counter() - t0)
    log(f"basic: {basic_bps/1e9:.2f} GB/s")

    # --- flat BPE mode ---
    t0 = time.perf_counter()
    r = bpe_jax.flat_encode(data, length, dense, no_carry, eof)
    jax.block_until_ready(r)
    log(f"bpe compile+first: {time.perf_counter()-t0:.2f}s")
    n_tokens = int(r[1])
    for _ in range(WARMUP):
        r = bpe_jax.flat_encode(data, length, dense, no_carry, eof)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = bpe_jax.flat_encode(data, length, dense, no_carry, eof)
    jax.block_until_ready(r)
    bpe_bps = N * ITERS / (time.perf_counter() - t0)
    log(f"bpe: {bpe_bps/1e9:.2f} GB/s ({n_tokens} tokens, ratio {N/n_tokens:.2f})")

    value = float(np.sqrt(basic_bps * bpe_bps))
    print(
        json.dumps(
            {
                "metric": "tokenization_bytes_per_sec_chip_geomean_basic_bpe",
                "value": value,
                "unit": "bytes/s",
                "vs_baseline": value / REFERENCE_BASELINE_BYTES_PER_SEC,
                "basic_bytes_per_sec": basic_bps,
                "bpe_bytes_per_sec": bpe_bps,
                "backend": backend,
                "buffer_bytes": N,
                "bpe_rules": len(merges),
            }
        )
    )


if __name__ == "__main__":
    main()
