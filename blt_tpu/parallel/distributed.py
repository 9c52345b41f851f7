"""Multi-host initialization and corpus sharding.

The reference is strictly single-node (SURVEY.md 2: no distributed
backend). The BASELINE.json north star defines the multi-host shape:
``jax.distributed`` over a pod slice, corpus chunks sharded data-parallel
across hosts, merges table replicated, boundary state and per-pair counts
over ICI/DCN collectives.

Launch on each host (or let the TPU runtime auto-configure):

    import blt_tpu.parallel.distributed as dist
    dist.initialize()                      # jax.distributed.initialize()
    mesh = dist.global_mesh()              # 1-D data mesh over all chips
    lo, hi = dist.host_byte_range(total)   # this host's corpus slice

Each host feeds only its byte range. The full multi-process runner —
merge-transparent boundary planning, per-host encoding, and host-order
output assembly (pwrite at offset prefix(h) after a tiny all-gather of
per-host counts) — lives in blt_tpu/parallel/multihost.py and is wired
into the pipeline runner via the BLT_COORDINATOR_ADDRESS /
BLT_NUM_PROCESSES / BLT_PROCESS_ID environment contract.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from blt_tpu.parallel.mesh import make_mesh
from blt_tpu.utils.logging import get_logger

log = get_logger("distributed")

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with idempotence and solo fallback.

    With no arguments, relies on the TPU runtime's auto-bootstrap (the
    standard path on Cloud TPU pods). Single-process environments are a
    no-op, so code written for multi-host runs unchanged on one host.
    With an EXPLICIT coordinator address (the BLT_COORDINATOR_ADDRESS
    contract), failures re-raise — silently degrading an explicit
    multi-process launch to N independent solo runs would corrupt the
    shared output.
    """
    global _initialized
    if _initialized:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
        log.info(
            "distributed initialized: process %d/%d",
            jax.process_index(),
            jax.process_count(),
        )
    except (ValueError, RuntimeError) as e:
        if coordinator_address is not None:
            raise
        # already initialized, or single-process without coordinator info
        log.debug("distributed init skipped: %s", e)
        _initialized = True


def global_mesh():
    """1-D data-parallel mesh over every chip in the slice."""
    return make_mesh(jax.devices())


def host_byte_range(total_bytes: int) -> Tuple[int, int]:
    """This host's contiguous corpus slice (chunk-range sharding).

    Contiguous ranges (not striding) keep shard boundaries identical to
    chunk boundaries so the carry-composition stitching applies unchanged.
    """
    p = jax.process_index()
    n = jax.process_count()
    per = -(-total_bytes // n)
    lo = min(p * per, total_bytes)
    hi = min(lo + per, total_bytes)
    return lo, hi
