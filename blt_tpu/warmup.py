"""Device-kernel pre-compilation (BLT_WARMUP=1).

Every distinct encoder capacity is a distinct Mosaic/XLA compile; through
a tunneled TPU a cold shape costs ~10s at first dispatch (BENCH_r03
``basic_10mb_compile_overhead_s``). The persistent compilation cache
(utils/compcache.py) already makes any PREVIOUSLY seen shape start in
<1s in every later process; this module closes the remaining gap by
compiling the standard shapes ahead of use:

- the power-of-two serving buckets (engines.device_capacity_hint grid,
  floor..device batch bytes) used by the HTTP server and in-memory API;
- the run's own equalized-batch shape (runner._plan_feed_size).

Enabled via BLT_WARMUP=1 for CLI runs (the runner calls warm_for_run
before streaming) or the server's ``--warmup SIZE`` flag; both populate
the shared persistent cache, so warming once benefits every process on
the machine.
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np

from blt_tpu.utils.logging import get_logger

log = get_logger("warmup")


def pow2_buckets(max_bytes: int) -> list:
    from blt_tpu.pipeline.engines import DEVICE_HINT_FLOOR

    out = []
    size = DEVICE_HINT_FLOOR
    while size <= max(max_bytes, DEVICE_HINT_FLOOR):
        out.append(size)
        size <<= 1
    return out


def ladder_buckets(max_bytes: int) -> list:
    """Every shape the device pipeline can dispatch up to ``max_bytes``:
    the serving pow2 grid UNION the stream tail ladder
    (engines.bucket_feed — pow2 to 1MB, then 1MB steps). ~20 shapes at
    the default 16MB batch size; BLT_WARMUP=full seeds them all."""
    from blt_tpu.pipeline.engines import bucket_feed

    shapes = set(pow2_buckets(max_bytes))
    mb = 1 << 20
    size = mb
    while size <= max(max_bytes, mb):
        shapes.add(bucket_feed(size))
        size += mb
    return sorted(shapes)


def warm_shapes(
    mode,
    table,
    capacities: Iterable[int],
    threads: int = 0,
) -> int:
    """Compile the device kernels for each capacity; returns how many
    encoder shapes were touched. The flat-BPE program warmed follows the
    run's actual D2H mode (engines._flat_d2h_mode): the fused
    encode+repack jit for ``packed`` (the default dispatch), the plain
    kernel for ``slots``, and kernel + device compaction for ``compact``
    — warming a program the pipeline never dispatches would leave the
    first batch cold. No-op off-TPU (compiles there are cheap and
    backend-specific). Single-device programs only: the sharded engine's
    shard-mapped kernels are skipped by warm_for_run."""
    import jax
    import jax.numpy as jnp

    from blt_tpu.config import Mode
    from blt_tpu.ops.bpe_pallas import (
        PallasBasicEncoder,
        PallasFlatEncoder,
        compact_slots_device,
    )
    from blt_tpu.pipeline.engines import _flat_d2h_mode

    if jax.default_backend() != "tpu":
        return 0
    probe = np.zeros(64, np.uint8)
    warmed = 0
    d2h = _flat_d2h_mode()
    for cap in sorted(set(int(c) for c in capacities if c > 0)):
        if mode == Mode.BASIC:
            enc = PallasBasicEncoder(cap)
            out, _ = enc.encode(probe)
            jax.block_until_ready(out)
        elif mode == Mode.BPE and table is not None and table.flat:
            if not PallasFlatEncoder.supports(table):
                return warmed
            enc = PallasFlatEncoder(table, capacity_bytes=cap)
            rows = enc.padded_bytes // 128
            buf = np.zeros(enc.padded_bytes, np.uint8)
            dev = jnp.asarray(buf.reshape(rows, 128))
            if d2h == "packed":
                # the FUSED encode+repack jit is what the pipeline
                # dispatches (engines._bpe_pallas_stream packed mode) —
                # warm that exact program, not its separate halves
                wire, carry, _ = enc.encode_packed_device(
                    dev, probe.size, False, -1, jnp.int32(0)
                )
                jax.block_until_ready((wire, carry))
            else:
                slots, _, carry = enc.encode_device(
                    dev, probe.size, False, -1
                )
                if d2h == "compact":
                    comp, m, _ = compact_slots_device(
                        slots, jnp.int32(probe.size), jnp.int32(0),
                        capacity=enc.capacity,
                    )
                    jax.block_until_ready((comp, m))
                jax.block_until_ready(carry)
        else:
            return warmed  # passthrough / non-flat: nothing device-compiled
        warmed += 1
        log.info("warmup: compiled %s kernels for %d-byte capacity (%s)",
                 mode.value, cap, d2h)
    return warmed


def warm_for_run(
    mode,
    table,
    feed_size: int,
    max_bucket: int,
    threads: int = 0,
    full: bool = False,
    total_size: Optional[int] = None,
) -> Optional[int]:
    """BLT_WARMUP entry: pre-compile the run's planned shapes — the
    main batch bucket plus the stream's tail bucket when the input size
    is known (engines.bucket_feed ladder; BLT_WARMUP=1) — and with
    ``full`` (BLT_WARMUP=full) also the standard pow2 serving buckets
    into the persistent cache — each UNSEEN bucket is a fresh remote
    Mosaic compile (minutes on a tunneled TPU), so the grid is opt-in
    for cache-seeding runs, not the per-run default. Failures only log
    — warming must never break a run."""
    try:
        from blt_tpu.pipeline.engines import bucket_feed

        if total_size and total_size < feed_size:
            shapes = [bucket_feed(total_size)]
        else:
            shapes = [bucket_feed(feed_size)]
            if total_size:
                tail = total_size - (total_size // feed_size) * feed_size
                if tail:
                    shapes.append(bucket_feed(tail))
        if full:
            shapes += ladder_buckets(max_bucket)
        return warm_shapes(mode, table, shapes, threads)
    except Exception as e:  # pragma: no cover - defensive
        log.warning("warmup failed (%s); continuing uncached", e)
        return None
