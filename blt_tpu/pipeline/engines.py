"""Tokenization engines: NumPy host engine and JAX/TPU device engine.

The TPU-native replacement for the reference's strategy objects
(reference: blt_core/src/tokenizer.rs trait TokenizationStrategy). An engine
consumes an ordered iterator of uint8 chunk arrays (each at most
``chunk_hint`` bytes) and yields ordered bytes-like results; ordering is
positional (array index = chunk id), which replaces the reference's
mpsc-channel reorder buffer (pipeline.rs:153-168).

JaxEngine pipelining: device dispatch is asynchronous, so up to ``depth``
batches are in flight; the BPE stitching carry stays ON DEVICE between
batches (a scalar dependency XLA pipelines), and the only host syncs are the
ordered result drains. The merges table is uploaded once per run — the
replicate-once analog of the reference's Arc<BpeMerges> (lib.rs:277).
"""

from __future__ import annotations

import collections
import os
from typing import Iterable, Iterator, Optional

import numpy as np

from blt_tpu.merges import MergeTable
from blt_tpu.ops import bpe_numpy
from blt_tpu.utils.chunking import align_up
from blt_tpu.utils.logging import get_logger

log = get_logger("engine")

# In-memory device payloads (server/API) bucket their encoder capacity to
# powers of two so a long-lived process compiles O(log max-payload)
# kernels total instead of one Mosaic compile per distinct payload size
# (the kernels are shape-specialized at 64KB block granularity,
# ops/bpe_pallas.py). 64KB floor = one kernel block.
DEVICE_HINT_FLOOR = 1 << 16

# Flat-BPE D2H modes (BLT_D2H env):
#   packed (default): the kernel slots are repacked on device to 1 byte
#     per input position + a 1-bit flag plane (ops/bpe_pallas.
#     pack_slots_device) — 1.125x input bytes over the link instead of
#     the 2x slot array, with STATIC shapes (no count sync, no sort);
#     the host expands at memcpy speed (native.unpack_slots).
#   slots: transfer the raw 2x slot array + host drop-after-merge filter
#     (the pre-r4 default; escape hatch).
#   compact: device sort-based compaction (compact_slots_device) +
#     bucketed dynamic-size transfers. Loses to packed everywhere
#     measured (the sort costs ~90 Melem/s and the count sync breaks
#     dispatch overlap); kept for comparison. BLT_DEVICE_COMPACT=1 is
#     the legacy alias.


def _flat_d2h_mode() -> str:
    if os.environ.get("BLT_DEVICE_COMPACT", "0") == "1":
        return "compact"
    mode = os.environ.get("BLT_D2H", "packed")
    if mode not in ("packed", "slots", "compact"):
        # a typo'd opt-out must not silently keep the default running
        log.warning(
            "Unknown BLT_D2H value %r (expected packed|slots|compact); "
            "using 'packed'", mode,
        )
        return "packed"
    return mode


def bucket_feed(nbytes: int) -> int:
    """Ladder-bucketed encoder capacity for a device feed batch.

    Every distinct encoder capacity is a distinct Mosaic compile (~10s
    through a remote tunnel), so batch capacities come from a FIXED
    ladder — pow2 to 1MB, 1MB steps to 16MB, pow2 beyond — ~20 shapes
    total, all warmable once per machine into the persistent compile
    cache. The ladder wastes at most one step of padding on a stream's
    final short batch (vs r4's exact equalization, which minted a fresh
    kernel shape for nearly every file size: the 11.7s cold start of
    e2e_tpu_r4b).
    """
    mb = 1 << 20
    if nbytes <= DEVICE_HINT_FLOOR:
        return DEVICE_HINT_FLOOR
    if nbytes <= mb:
        return 1 << (nbytes - 1).bit_length()
    if nbytes <= 16 * mb:
        return align_up(nbytes, mb)
    # custom batch sizes above 16MB (BLT_DEVICE_BATCH_BYTES / a large
    # --chunksize): 2MB steps, NOT pow2 — rounding a 17MB batch to 32MB
    # would make every full batch pay ~2x capacity over the link
    return align_up(nbytes, 2 * mb)


_MAX_STREAM_BUCKETS = 3


def _stream_bucket(n: int, encoders: dict) -> int:
    """Bucket for one stream chunk, bounded to _MAX_STREAM_BUCKETS live
    encoder shapes: beyond the cap, odd chunk sizes (pipes can read
    short anywhere, io/sources.py) pad into the smallest existing
    bucket that fits (or the largest one outright) instead of minting
    another mid-stream Mosaic compile."""
    cap = bucket_feed(n)
    if cap in encoders or len(encoders) < _MAX_STREAM_BUCKETS:
        return cap
    fitting = [c for c in encoders if c >= n]
    # nothing large enough: a fresh shape is unavoidable (must hold n)
    return min(fitting) if fitting else cap


def device_capacity_hint(size: int, engine) -> int:
    """Capacity hint for a single in-memory payload of ``size`` bytes.

    Device engines get the power-of-two bucket >= size; host engines keep
    the exact size (no shape-specialized compilation to amortize).
    """
    if size <= 0 or getattr(engine, "name", "") not in ("jax", "shard"):
        return size
    return max(DEVICE_HINT_FLOOR, 1 << (size - 1).bit_length())


class NumpyEngine:
    """Vectorized host engine (CPU path; also the small-input fast path).

    Uses the native C++ library (multithreaded widen / flat-BPE scan) when
    built, falling back to pure NumPy — the host-side stand-in for the
    reference's Tokio worker pool (pipeline.rs:86-100); ``threads`` carries
    the CLI --threads / num_cpus policy (utils.rs:79-97).
    """

    name = "numpy"

    def __init__(self, threads: int = 0):
        from blt_tpu import native

        self.threads = threads if threads > 0 else (os.cpu_count() or 1)
        self._native = native if native.available() else None

    def basic_stream(
        self, chunks: Iterable[np.ndarray], chunk_hint: int
    ) -> Iterator[bytes]:
        for chunk in chunks:
            if self._native is not None:
                yield self._native.widen_be(chunk, self.threads)
            else:
                yield chunk.astype(">u2")  # fresh array; writer takes the buffer

    def passthrough_stream(
        self, chunks: Iterable[np.ndarray], chunk_hint: int
    ) -> Iterator[bytes]:
        for chunk in chunks:
            yield memoryview(np.ascontiguousarray(chunk)).cast("B")

    def bpe_stream(
        self, chunks: Iterable[np.ndarray], table: MergeTable, chunk_hint: int
    ) -> Iterator[bytes]:
        if table.flat:
            yield from self._bpe_flat_stream(chunks, table)
        else:
            # General tables: independent per-chunk multipass, which is the
            # reference's own chunked behavior (BPE output then depends on
            # chunk size exactly as the reference's does, SURVEY.md 2.1.6).
            for chunk in chunks:
                toks = bpe_numpy.bpe_encode_multipass(chunk, table)
                yield toks.astype(">u2")

    def _bpe_flat_stream(
        self, chunks: Iterable[np.ndarray], table: MergeTable
    ) -> Iterator[bytes]:
        carry = False
        prev: Optional[np.ndarray] = None

        def encode(data: np.ndarray, carry_in: bool, next_byte: int):
            if self._native is not None:
                return self._native.flat_bpe(
                    data, table.dense, carry_in, next_byte, self.threads
                )
            toks, c = bpe_numpy.bpe_encode_flat_carry(
                data, table, carry_in, next_byte
            )
            return toks.astype(">u2"), c

        for chunk in chunks:
            if chunk.shape[0] == 0:
                continue
            if prev is not None:
                wire, carry = encode(prev, carry, int(chunk[0]))
                yield wire
            prev = chunk
        if prev is not None:
            wire, _ = encode(prev, carry, -1)
            yield wire


class JaxEngine:
    """TPU/device engine: async pipelined batches, on-device carries."""

    name = "jax"

    def __init__(self, depth: int = 2, threads: int = 0):
        import jax  # lazy: keep CLI startup fast on the pure-host paths

        from blt_tpu.utils.compcache import enable_compilation_cache

        enable_compilation_cache()
        self._jax = jax
        self.depth = depth
        # --threads policy for the host-side stages (pack/upload/drain);
        # 0 = auto (cpu count), matching NumpyEngine
        self.threads = threads if threads > 0 else (os.cpu_count() or 1)

    def _pad_to(self, chunk: np.ndarray, n: int) -> np.ndarray:
        if chunk.shape[0] == n:
            return np.ascontiguousarray(chunk)
        buf = np.zeros(n, dtype=np.uint8)
        buf[: chunk.shape[0]] = chunk
        return buf

    def basic_stream(
        self, chunks: Iterable[np.ndarray], chunk_hint: int
    ) -> Iterator[bytes]:
        # chunk_hint == 0 (empty in-memory payloads) would build a
        # zero-capacity encoder; the XLA/stream path below handles it
        if self._jax.default_backend() == "tpu" and chunk_hint > 0:
            from blt_tpu.ops.bpe_pallas import PallasBasicEncoder
            from blt_tpu.pipeline.feeder import BufferPool, prefetch_iter

            # per-chunk LADDER-bucketed encoders: full batches share one
            # shape; the stream's short tail gets its own bucket instead
            # of paying the full capacity over the link. File sources
            # touch <= 2 buckets (full + tail); pipe sources can read
            # short ANYWHERE, so cap the live encoders (each is a
            # Mosaic compile) and pad odd sizes into an existing bucket
            encoders: dict = {}

            def enc_for(n: int):
                cap = _stream_bucket(n, encoders)
                if cap not in encoders:
                    e = PallasBasicEncoder(cap)
                    encoders[cap] = (e, BufferPool(e.padded_bytes, 2))
                return encoders[cap]

            def feed():
                for chunk in chunks:
                    if chunk.shape[0] == 0:
                        continue
                    encoder, pool = enc_for(chunk.shape[0])
                    buf = pool.get()
                    dev, n = encoder.upload(chunk, buf)
                    pool.put(buf)
                    yield encoder.encode_device(dev, n)

            def drain(items):
                for out, n in items:
                    host = np.asarray(out).reshape(-1)
                    # u16 view; LE image == BE wire. Copy only when the
                    # valid slice is a small part of the bucketed
                    # transfer buffer: a view would pin the whole buffer
                    # in holders that account by nbytes (the multihost
                    # _Spool memcap contract), while copying every full
                    # batch would waste host bandwidth.
                    if 2 * n < host.nbytes:
                        yield host[:n].copy()
                    else:
                        yield host[:n]

            yield from prefetch_iter(
                drain(prefetch_iter(feed(), self.depth, "feed")),
                self.depth,
                "drain",
            )
            return

        from blt_tpu.ops import bpe_jax

        jnp = self._jax.numpy
        n_static = align_up(chunk_hint)
        pending = collections.deque()
        for chunk in chunks:
            length = chunk.shape[0]
            if length == 0:
                continue
            dev = jnp.asarray(self._pad_to(chunk, n_static))
            pending.append((bpe_jax.basic_encode(dev), length))
            if len(pending) > self.depth:
                yield self._drain_basic(pending)
        while pending:
            yield self._drain_basic(pending)

    def _drain_basic(self, pending) -> bytes:
        out, length = pending.popleft()
        # uint16 LE image == u16-BE wire stream; flatten host-side
        host = np.asarray(out).reshape(-1)
        return host[:length]  # u16 view; LE image == BE wire

    def passthrough_stream(
        self, chunks: Iterable[np.ndarray], chunk_hint: int
    ) -> Iterator[bytes]:
        # Identity map: never round-trip through the device.
        for chunk in chunks:
            yield memoryview(np.ascontiguousarray(chunk)).cast("B")

    def bpe_stream(
        self, chunks: Iterable[np.ndarray], table: MergeTable, chunk_hint: int
    ) -> Iterator[bytes]:
        if table.flat:
            yield from self._bpe_flat_stream(chunks, table, chunk_hint)
        else:
            yield from self._bpe_multipass_stream(chunks, table, chunk_hint)

    def _bpe_flat_stream(
        self, chunks: Iterable[np.ndarray], table: MergeTable, chunk_hint: int
    ) -> Iterator[bytes]:
        if self._jax.default_backend() == "tpu" and chunk_hint > 0:
            from blt_tpu.ops.bpe_pallas import PallasFlatEncoder

            if PallasFlatEncoder.supports(table):
                # Build the primary encoder EAGERLY so a construction
                # failure (e.g. cuckoo placement) falls back to the XLA
                # path before any output is emitted; a mid-stream failure
                # must raise, never silently re-emit the stream through
                # another path. (Placement depends only on the table, so
                # the tail-bucket encoders built later cannot fail.)
                try:
                    encoder = PallasFlatEncoder(
                        table, capacity_bytes=bucket_feed(chunk_hint)
                    )
                except ValueError:
                    encoder = None
                if encoder is not None:
                    yield from self._bpe_pallas_stream(
                        chunks, encoder, chunk_hint
                    )
                    return
        yield from self._bpe_xla_stream(chunks, table, chunk_hint)

    def _bpe_pallas_stream(
        self, chunks: Iterable[np.ndarray], encoder, chunk_hint: int
    ) -> Iterator[bytes]:
        """Pallas TPU kernel path: 4-stage overlapped pipeline.

        feed thread: pack into reused buffers + upload + dispatch (carry
        chaining stays on-device and serial by construction); d2h thread:
        device->host transfer; filter thread: drop-after-merge drain (its
        prev_tok carry is serial, making it a clean stage). End-to-end
        rate is max(stage), not sum(stage) — see blt_tpu/pipeline/feeder.py.
        """
        from blt_tpu import native
        from blt_tpu.ops.bpe_pallas import (
            compact_slots_device,
            filter_slots,
            unpack_slots_host,
        )
        from blt_tpu.pipeline.feeder import BufferPool, prefetch_iter

        use_native = native.available()
        threads = self.threads
        jnp = self._jax.numpy
        capacity = getattr(encoder, "capacity", 0)
        mode = _flat_d2h_mode() if capacity > 0 else "slots"

        # per-chunk ladder-bucketed encoders (see basic_stream): the
        # primary encoder serves full batches, the stream's short tail
        # gets its own bucket. Test fakes (no real capacity) are reused
        # for every size.
        encoders = {capacity: (encoder, BufferPool(encoder.padded_bytes, 2))}

        def enc_for(n: int):
            if capacity <= 0 or not hasattr(encoder, "with_capacity"):
                return next(iter(encoders.values()))
            cap = _stream_bucket(n, encoders)
            if cap not in encoders:
                e = encoder.with_capacity(cap)
                encoders[cap] = (e, BufferPool(e.padded_bytes, 2))
            return encoders[cap]

        def feed():
            carry = False  # replaced by device scalars after the first batch
            prev_chunk: Optional[np.ndarray] = None
            prev_slot = jnp.int32(0)  # drop-rule carry (device scalar)

            def dispatch(data: np.ndarray, next_byte: int):
                nonlocal carry, prev_slot
                enc, pool = enc_for(data.shape[0])
                buf = pool.get()
                dev, n = enc.upload(data, buf, threads)
                pool.put(buf)
                cap = getattr(enc, "capacity", 0)
                if mode == "packed":
                    # kernel + repack in ONE dispatch, bytes+flags in ONE
                    # combined transfer (each extra round trip costs
                    # whole-RTT latency through a remote link)
                    wire, carry, prev_slot = enc.encode_packed_device(
                        dev, n, carry, next_byte, prev_slot
                    )
                    return wire, n, cap
                slots, _, carry = enc.encode_device(dev, n, carry, next_byte)
                if mode == "compact":
                    comp, m, prev_slot = compact_slots_device(
                        slots, jnp.int32(n), prev_slot, capacity=cap
                    )
                    return comp, m, cap
                return slots, n, cap

            for chunk in chunks:
                if chunk.shape[0] == 0:
                    continue
                if prev_chunk is not None:
                    yield dispatch(prev_chunk, int(chunk[0]))
                prev_chunk = chunk
            if prev_chunk is not None:
                yield dispatch(prev_chunk, -1)

        def d2h(items):
            if mode == "packed":
                for wire_dev, n, cap in items:
                    w = np.asarray(wire_dev)
                    yield w[:cap], w[cap:], n
                return
            if mode == "compact":
                for comp_dev, m_dev, cap in items:
                    m = int(m_dev)
                    if m == 0:
                        yield np.empty(0, np.uint16)
                        continue
                    # transfer-size buckets for the compacted prefix
                    # (each distinct slice shape compiles once; 16
                    # buckets bound the padding to ~6%)
                    step = max(1024, align_up(cap // 16, 1024))
                    k = min(cap, -(-m // step) * step)
                    yield np.asarray(comp_dev[:k])[:m]
                return
            for slots_dev, n, _cap in items:
                yield np.asarray(slots_dev).reshape(-1)[:n]

        def drain(items):
            if mode == "packed":
                for packed_h, flags_h, n in items:
                    if use_native:
                        yield native.unpack_slots(packed_h, flags_h, n, threads)
                    else:
                        yield unpack_slots_host(packed_h, flags_h, n)
                return
            if mode == "compact":
                # already drained and compacted on device: the uint16 LE
                # image is the exact u16-BE wire stream
                yield from items
                return
            prev_tok = 0
            for slots in items:
                if use_native:
                    wire, prev_tok = native.filter_slots_native(
                        slots, prev_tok, threads
                    )
                else:
                    toks, prev_tok = filter_slots(slots, prev_tok)
                    # byteswapped u16: LE image is already the BE wire stream
                    wire = toks
                yield wire

        yield from prefetch_iter(
            drain(prefetch_iter(d2h(prefetch_iter(feed(), self.depth, "feed")),
                                self.depth, "d2h")),
            self.depth,
            "drain",
        )

    def _bpe_xla_stream(
        self, chunks: Iterable[np.ndarray], table: MergeTable, chunk_hint: int
    ) -> Iterator[bytes]:
        from blt_tpu.ops import bpe_jax

        jnp = self._jax.numpy
        dense = bpe_jax.dense_table_device(table)
        n_static = align_up(chunk_hint)
        pending = collections.deque()
        carry = jnp.asarray(False)
        prev: Optional[np.ndarray] = None

        def dispatch(chunk: np.ndarray, next_byte: int):
            nonlocal carry
            dev = jnp.asarray(self._pad_to(chunk, n_static))
            _, count, carry_out, be = bpe_jax.flat_encode(
                dev,
                jnp.int32(chunk.shape[0]),
                dense,
                carry,
                jnp.int32(next_byte),
            )
            carry = carry_out
            pending.append((count, be))

        for chunk in chunks:
            if chunk.shape[0] == 0:
                continue
            if prev is not None:
                dispatch(prev, int(chunk[0]))
                if len(pending) > self.depth:
                    yield self._drain_bpe(pending)
            prev = chunk
        if prev is not None:
            dispatch(prev, -1)
        while pending:
            yield self._drain_bpe(pending)

    def _drain_bpe(self, pending) -> bytes:
        count, be = pending.popleft()
        n_tokens = int(count)
        host = np.asarray(be)  # uint16 LE image == u16-BE wire stream
        return host[:n_tokens]

    def _pallas_multipass_selected(self, encoder_cls, table) -> bool:
        """One policy for both engines: BLT_MULTIPASS=pallas|xla, TPU
        backend, and kernel support for this table."""
        impl = os.environ.get("BLT_MULTIPASS", "pallas")
        return (
            impl != "xla"
            and self._jax.default_backend() == "tpu"
            and encoder_cls.supports(table)
        )

    def _bpe_multipass_stream(
        self, chunks: Iterable[np.ndarray], table: MergeTable, chunk_hint: int
    ) -> Iterator[bytes]:
        """General (non-flat) tables: two device implementations.

        - ``pallas`` (default): one Pallas token-pass kernel per merge round
          at flat-kernel device speed, host compaction between rounds. Wins
          whenever host<->device bandwidth is healthy (PCIe-attached TPU:
          the kernel is ~50x faster than the XLA round-loop below).
        - ``xla``: whole repeat-until-done loop on device (lax.while_loop +
          searchsorted lookup) — no per-round transfers, so it wins on
          setups where transfers are the bottleneck (e.g. a tunneled
          remote TPU at ~50 MB/s).
        Select with BLT_MULTIPASS=pallas|xla.
        """
        from blt_tpu.ops.bpe_pallas import PallasTokenEncoder

        if self._pallas_multipass_selected(PallasTokenEncoder, table):
            yield from self._bpe_multipass_pallas_stream(
                chunks, table, chunk_hint
            )
            return
        yield from self._bpe_multipass_xla_stream(chunks, table, chunk_hint)

    def _bpe_multipass_pallas_stream(
        self, chunks: Iterable[np.ndarray], table: MergeTable, chunk_hint: int
    ) -> Iterator[bytes]:
        """Device-resident multipass: the whole repeat-until-done loop runs
        on device (lax.while_loop around the gap-tolerant token-pass
        kernel — bpe_pallas._multipass_gap_wire_call), one H2D + one D2H
        per chunk. The wire is the byteswapped-u16 image plus a packed
        alive-flag plane; tombstones are dropped host-side at memcpy
        speed instead of by the device sort (7x the sweep cost,
        tools/exp_mp_ablate.py). BLT_MP_COMPACT=sort restores the
        per-pass sort loop. ``depth`` chunks stay in flight so the D2H
        of one overlaps the passes of the next. Per-chunk semantics
        (general tables match the reference's chunk-dependent output,
        SURVEY.md 2.1.6)."""
        from blt_tpu.ops import bpe_jax
        from blt_tpu.ops.bpe_pallas import (
            PallasTokenEncoder,
            _mp_compact_mode,
            expand_gap_wire_host,
        )

        enc = PallasTokenEncoder(table, capacity_tokens=align_up(chunk_hint))
        pending = collections.deque()
        sort_mode = _mp_compact_mode() == "sort"

        def drain() -> bytes:
            if sort_mode:
                be_d, m_d = pending.popleft()
                # uint16 LE image == u16-BE wire stream. Copy the valid
                # slice: a view would pin the full capacity-sized transfer
                # buffer for as long as downstream (e.g. the multihost
                # _Spool) holds the result, breaking its nbytes-based
                # --memcap accounting.
                return np.asarray(be_d)[: int(m_d)].copy()
            wire_d, m_d, cap = pending.popleft()
            toks = expand_gap_wire_host(np.asarray(wire_d), cap)
            assert toks.shape[0] == int(m_d), (toks.shape[0], int(m_d))
            return toks  # fancy indexing already copied

        for chunk in chunks:
            if chunk.shape[0] == 0:
                continue
            if sort_mode:
                toks_d, m_d = enc.encode_resident_dispatch(chunk)
                pending.append(
                    (bpe_jax.tokens_to_be_bytes_device(toks_d), m_d)
                )
            else:
                pending.append(enc.encode_resident_wire_dispatch(chunk))
            if len(pending) > self.depth:
                yield drain()
        while pending:
            yield drain()

    def _bpe_multipass_xla_stream(
        self, chunks: Iterable[np.ndarray], table: MergeTable, chunk_hint: int
    ) -> Iterator[bytes]:
        from blt_tpu.ops import bpe_jax

        jnp = self._jax.numpy
        keys, vals = bpe_jax.sparse_table_device(table)
        n_static = align_up(chunk_hint)
        pending = collections.deque()
        for chunk in chunks:
            if chunk.shape[0] == 0:
                continue
            dev = jnp.asarray(self._pad_to(chunk, n_static))
            toks, count = bpe_jax.multipass_encode(
                dev, jnp.int32(chunk.shape[0]), keys, vals
            )
            be = bpe_jax.tokens_to_be_bytes_device(toks)
            pending.append((count, be))
            if len(pending) > self.depth:
                yield self._drain_bpe(pending)
        while pending:
            yield self._drain_bpe(pending)


class ShardedJaxEngine(JaxEngine):
    """Multi-chip engine: row-sharded batches over a 1-D device mesh.

    The pipeline-level integration of parallel.sharded: each feed batch is
    laid out as (n_devices, row_bytes) rows sharded over the mesh's data
    axis, the merges table is replicated, cross-row AND cross-batch BPE
    stitching is exact via the carry-composition scan + threaded batch
    carry (the multi-chip analog of the reference's in-order shard
    assembler, pipeline.rs:153-168). Non-flat tables keep the per-chunk
    reference semantics and run on the single-device paths.
    """

    name = "shard"

    def __init__(self, mesh=None, depth: int = 2, threads: int = 0):
        super().__init__(depth=depth, threads=threads)
        from blt_tpu.parallel.mesh import (
            make_mesh,
            replicated,
            row_sharding,
            vec_sharding,
        )

        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_rows = int(self.mesh.devices.size)
        self._row_sh = row_sharding(self.mesh)
        self._vec_sh = vec_sharding(self.mesh)
        self._rep_sh = replicated(self.mesh)

    def _layout(self, chunk: np.ndarray, row_bytes: int):
        """Fill a (n_rows, row_bytes) batch front-to-back + per-row lengths.

        Rows are consecutive slices of the chunk, so the fill is ONE
        contiguous (native multithreaded) copy into an uninitialized
        buffer — no memset, no per-row Python loop; bytes beyond each
        row's length are stale and every consumer masks by the lengths
        vector (sharded_flat_encode's valid_pair/keep masks; the basic
        drain slices the contiguous valid prefix)."""
        from blt_tpu.pipeline.feeder import pack_into

        b = self.n_rows
        n = chunk.shape[0]
        # a chunk beyond the batch capacity would silently drop its tail
        # (the single-device upload paths assert the same contract)
        assert n <= b * row_bytes, (n, b, row_bytes)
        batch = np.empty((b, row_bytes), np.uint8)
        pack_into(batch.reshape(-1), chunk, self.threads)
        full = n // row_bytes
        lengths = np.zeros(b, np.int32)
        lengths[:full] = row_bytes
        if full < b:
            lengths[full] = n - full * row_bytes
        return (
            self._jax.device_put(batch, self._row_sh),
            self._jax.device_put(lengths, self._vec_sh),
            lengths,
        )

    def _row_bytes(self, chunk_hint: int) -> int:
        return align_up(-(-chunk_hint // self.n_rows))

    def _mesh_platform(self) -> str:
        return str(self.mesh.devices.flat[0].platform)

    def _pallas_multipass_selected(self, encoder_cls, table) -> bool:
        # The mesh decides where shard_map runs: on a CPU (virtual) mesh
        # the compiled Pallas kernel cannot lower, even when the process
        # default backend is a TPU — route those to the XLA multipass.
        if self._mesh_platform() == "cpu":
            return False
        return super()._pallas_multipass_selected(encoder_cls, table)

    def basic_stream(
        self, chunks: Iterable[np.ndarray], chunk_hint: int
    ) -> Iterator[bytes]:
        from blt_tpu.parallel.sharded import sharded_basic_encode
        from blt_tpu.pipeline.feeder import prefetch_iter

        row_bytes = self._row_bytes(chunk_hint)

        def feed():
            for chunk in chunks:
                if chunk.shape[0] == 0:
                    continue
                batch_d, _, _ = self._layout(chunk, row_bytes)
                yield sharded_basic_encode(batch_d), chunk.shape[0]

        def drain(items):
            for out, n in items:
                # rows are filled front-to-back, so the valid tokens form a
                # CONTIGUOUS prefix of the flattened (b, row_bytes) u16
                # batch: one transfer, one slice, zero per-row joins (u16
                # LE image == u16-BE wire). Copy short tails so a view
                # does not pin the whole batch buffer (spool accounting).
                host = np.asarray(out).reshape(-1)
                if 2 * n < host.nbytes:
                    yield host[:n].copy()
                else:
                    yield host[:n]

        yield from prefetch_iter(
            drain(prefetch_iter(feed(), self.depth, "feed")),
            self.depth,
            "drain",
        )

    def _bpe_flat_stream(
        self, chunks: Iterable[np.ndarray], table: MergeTable, chunk_hint: int
    ) -> Iterator[bytes]:
        if self._mesh_platform() != "cpu":
            from blt_tpu.ops.bpe_pallas import ShardedFlatEncoder

            if ShardedFlatEncoder.supports(table):
                slab = align_up(-(-chunk_hint // self.n_rows)
                                + ShardedFlatEncoder.HALO)
                try:
                    enc = ShardedFlatEncoder(
                        table, self.mesh, capacity_bytes=slab
                    )
                except ValueError:
                    enc = None
                if enc is not None:
                    yield from self._bpe_flat_halo_stream(
                        chunks, table, enc, chunk_hint
                    )
                    return
        yield from self._bpe_flat_xla_stream(chunks, table, chunk_hint)

    def _bpe_flat_halo_stream(
        self,
        chunks: Iterable[np.ndarray],
        table: MergeTable,
        enc,
        chunk_hint: int,
    ) -> Iterator[bytes]:
        """Flat BPE over the mesh at Pallas-kernel rate per chip.

        Halo-convergence sharding (ops/bpe_pallas.ShardedFlatEncoder):
        slabs run the single-device kernel in parallel, carry-free; the
        drain is stateless per slab, so there is NO cross-batch state at
        all on the fast path. A batch with a degenerate (all-match) halo
        boundary routes through the exact XLA carry-composition path with
        the true boundary carry — materialized from the previous Pallas
        batch's carry plane only then.

        D2H (BLT_D2H=packed, the default): slots repack on device to
        1 byte/position + flag bits (pack_slots_batch) and each slab's
        payload range expands independently on the host — 1.78x less
        transfer and no per-slab filter/join. Packed emission splits a
        boundary-straddling merge (hi at the start's slab, lo at the
        consuming slab), which composes silently across slabs AND batches;
        only transitions to/from the XLA fallback (which emits whole
        tokens) need a convention bridge: after an XLA batch whose carry
        consumed this batch's first byte, the first packed position is
        SKIPPED (its token was already fully emitted); an XLA batch
        following a packed batch with a pending merge PREPENDS that
        merge's lo byte.
        """
        from blt_tpu import native
        from blt_tpu.ops.bpe_pallas import (
            ShardedFlatEncoder,
            filter_slots,
            pack_slots_batch,
            unpack_slots_host,
        )
        from blt_tpu.parallel.sharded import sharded_flat_encode
        from blt_tpu.pipeline.feeder import pack_into, prefetch_iter

        jnp = self._jax.numpy
        jax = self._jax
        H = ShardedFlatEncoder.HALO
        d_rows = enc.n_rows
        payload = enc.payload
        dense = table.dense
        use_native = native.available()
        threads = self.threads
        xla_row_bytes = self._row_bytes(chunk_hint)
        dense_d = None  # uploaded lazily: only degenerate batches need it
        packed_mode = _flat_d2h_mode() == "packed"

        def feed():
            tail = np.empty(0, np.uint8)
            # carry bookkeeping for the XLA fallback only:
            # ("const", bool) | ("dev", xla device scalar) |
            # ("pallas", carry plane (D,1,1), last nonempty slab index)
            carry_state = ("const", False)
            prev_kind = None  # "p" | "x": emission convention of last batch

            def boundary_carry():
                kind = carry_state[0]
                if kind == "const":
                    return carry_state[1]
                if kind == "dev":
                    return carry_state[1]
                c_all, r_last = carry_state[1], carry_state[2]
                return bool(np.asarray(c_all)[r_last, 0, 0])

            def dispatch(data: np.ndarray, next_byte: int):
                nonlocal tail, carry_state, dense_d, prev_kind
                n = data.shape[0]
                assert n <= d_rows * payload, (n, d_rows, payload)
                # fresh uninitialized buffer per dispatch: each in-flight
                # batch owns its memory (jax.device_put may alias numpy
                # buffers zero-copy on the CPU backend — the hazard
                # upload_owned documents — so a reused buffer could corrupt
                # a pipelined batch), and np.empty skips the memset: every
                # byte beyond a slab's written hl+pl region is masked by
                # that slab's params length.
                batch = np.empty((d_rows, enc.padded_bytes), np.uint8)
                lengths = np.zeros(d_rows, np.int32)
                next_bytes = np.full(d_rows, -1, np.int32)
                metas = []
                offset = 0
                converged = True
                for r in range(d_rows):
                    pl = min(payload, n - offset)
                    if pl <= 0:
                        metas.append((0, 0))
                        continue
                    halo = tail[-H:] if r == 0 else data[
                        max(0, offset - H) : offset
                    ]
                    hp1 = np.concatenate([halo, data[offset : offset + 1]])
                    if not ShardedFlatEncoder.halo_converges(dense, hp1):
                        converged = False
                        break
                    hl = halo.shape[0]
                    batch[r, :hl] = halo
                    # payload fill: native multithreaded copy for large slabs
                    pack_into(batch[r, hl:], data[offset : offset + pl],
                              threads)
                    lengths[r] = hl + pl
                    next_bytes[r] = (
                        int(data[offset + pl]) if offset + pl < n else next_byte
                    )
                    metas.append((hl, pl))
                    offset += pl
                if converged:
                    # bridge rule 1: the previous XLA batch's carry consumed
                    # this batch's first byte AND already emitted the whole
                    # merged token — skip the packed stream's first position
                    # (it would re-emit the lo byte). Rare (only right after
                    # a degenerate batch), so the host sync is off the hot
                    # path.
                    skip_first = (
                        packed_mode
                        and prev_kind == "x"
                        and bool(np.asarray(boundary_carry()))
                    )
                    slots, c_all = enc.encode_batch(batch, lengths, next_bytes)
                    r_last = max(r for r, (_, pl) in enumerate(metas) if pl)
                    carry_state = ("pallas", c_all, r_last)
                    prev_kind = "p"
                    tail = (
                        data[-H:].copy()
                        if n >= H
                        else np.concatenate([tail, data])[-H:]
                    )
                    if packed_mode:
                        return ("p", pack_slots_batch(slots), metas,
                                skip_first)
                    return ("ps", slots, metas)
                # degenerate halo: exact XLA carry-composition fallback
                if dense_d is None:
                    dense_d = jax.device_put(dense, self._rep_sh)
                carry = boundary_carry()
                # bridge rule 2: a pending merge from a packed batch emitted
                # only its hi byte; this batch's consumed first byte emits
                # nothing under XLA convention, so prepend the lo byte here
                # (the pair is (previous batch's last byte, this first byte))
                prefix = b""
                if packed_mode and prev_kind == "p" and bool(
                    np.asarray(carry)
                ):
                    v = int(dense[int(tail[-1]) * 256 + int(data[0])])
                    prefix = bytes([v & 0xFF])
                batch_d, lengths_d, _ = self._layout(data, xla_row_bytes)
                tokens, counts, carry_out = sharded_flat_encode(
                    batch_d, lengths_d, dense_d, carry, jnp.int32(next_byte)
                )
                carry_state = ("dev", carry_out)
                prev_kind = "x"
                tail = np.concatenate([tail, data])[-H:]
                return ("x", tokens, counts, prefix)

            prev: Optional[np.ndarray] = None
            for chunk in chunks:
                if chunk.shape[0] == 0:
                    continue
                if prev is not None:
                    yield dispatch(prev, int(chunk[0]))
                prev = chunk
            if prev is not None:
                yield dispatch(prev, -1)

        # combined per-slab wire layout: packed bytes then flag plane
        # (pack_slots_batch); split offset = the flattened slot count per
        # slab (the kernel output excludes the 8 halo rows: capacity, not
        # padded_bytes)
        slab_len = enc.capacity

        def d2h(items):
            for item in items:
                if item[0] == "p":
                    _, wire_dev, metas, skip_first = item
                    yield "p", np.asarray(wire_dev), metas, skip_first
                elif item[0] == "ps":
                    _, slots_dev, metas = item
                    yield "ps", np.asarray(slots_dev), metas
                else:
                    _, tokens_dev, counts_dev, prefix = item
                    yield "x", np.asarray(tokens_dev), np.asarray(
                        counts_dev
                    ), prefix

        def drain(items):
            for item in items:
                if item[0] == "p":
                    _, wire_h, metas, skip_first = item
                    for r, (hl, pl) in enumerate(metas):
                        if pl == 0:
                            continue
                        start, cnt = hl, pl
                        if r == 0 and skip_first:
                            start, cnt = hl + 1, pl - 1
                        if cnt == 0:
                            continue
                        packed_h = wire_h[r, :slab_len]
                        flags_h = wire_h[r, slab_len:]
                        if use_native:
                            yield native.unpack_slots(
                                packed_h, flags_h, cnt, threads, start
                            )
                        else:
                            yield unpack_slots_host(
                                packed_h, flags_h, cnt, start
                            )
                elif item[0] == "ps":
                    _, slots_h, metas = item  # (D, rows, 128)
                    for r, (hl, pl) in enumerate(metas):
                        if pl == 0:
                            continue
                        flat = slots_h[r].reshape(-1)
                        prev_tok = int(flat[hl - 1]) if hl > 0 else 0
                        seg = flat[hl : hl + pl]
                        if use_native:
                            wire, _ = native.filter_slots_native(
                                seg, prev_tok, threads
                            )
                        else:
                            toks, _ = filter_slots(seg, prev_tok)
                            wire = toks
                        yield wire
                else:
                    _, tokens_h, counts_h, prefix = item
                    if prefix:
                        yield prefix
                    total = int(counts_h.sum())
                    out = np.empty(total, dtype=">u2")
                    o = 0
                    for r in range(self.n_rows):
                        c = int(counts_h[r])
                        if c:
                            out[o : o + c] = tokens_h[r, :c]
                            o += c
                    yield out

        yield from prefetch_iter(
            drain(prefetch_iter(d2h(prefetch_iter(feed(), self.depth, "feed")),
                                self.depth, "d2h")),
            self.depth,
            "drain",
        )

    def _bpe_flat_xla_stream(
        self, chunks: Iterable[np.ndarray], table: MergeTable, chunk_hint: int
    ) -> Iterator[bytes]:
        from blt_tpu.parallel.sharded import sharded_flat_encode
        from blt_tpu.pipeline.feeder import prefetch_iter

        row_bytes = self._row_bytes(chunk_hint)
        dense_d = self._jax.device_put(table.dense, self._rep_sh)
        jnp = self._jax.numpy

        def feed():
            carry = jnp.asarray(False)  # device scalar after the first batch
            prev: Optional[np.ndarray] = None

            def dispatch(data: np.ndarray, next_byte: int):
                nonlocal carry
                batch_d, lengths_d, _ = self._layout(data, row_bytes)
                tokens, counts, carry = sharded_flat_encode(
                    batch_d, lengths_d, dense_d, carry, jnp.int32(next_byte)
                )
                return tokens, counts

            for chunk in chunks:
                if chunk.shape[0] == 0:
                    continue
                if prev is not None:
                    yield dispatch(prev, int(chunk[0]))
                prev = chunk
            if prev is not None:
                yield dispatch(prev, -1)

        def drain(items):
            for tokens_dev, counts_dev in items:
                # single-allocation assembly: per-row slices convert into a
                # preallocated >u2 output (empty rows have count 0)
                tokens_h = np.asarray(tokens_dev)
                counts_h = np.asarray(counts_dev)
                out = np.empty(int(counts_h.sum()), dtype=">u2")
                o = 0
                for r in range(self.n_rows):
                    c = int(counts_h[r])
                    if c:
                        out[o : o + c] = tokens_h[r, :c]
                        o += c
                yield out

        yield from prefetch_iter(
            drain(prefetch_iter(feed(), self.depth, "feed")),
            self.depth,
            "drain",
        )

    def _bpe_multipass_stream(
        self, chunks: Iterable[np.ndarray], table: MergeTable, chunk_hint: int
    ) -> Iterator[bytes]:
        """General (hierarchical) tables, row-parallel over the mesh.

        Chunks are independent in this mode (the reference's own per-chunk
        semantics, SURVEY.md 2.1.6), so groups of n_devices chunks run as
        one row-sharded multipass — every mode uses every chip. On TPU
        meshes each row runs the Pallas token-pass kernel (shard_map, one
        chunk per device; ~50x the XLA round-loop per chip); other
        backends keep the vmapped XLA multipass.
        """
        from blt_tpu.ops.bpe_pallas import ShardedTokenEncoder

        if self._pallas_multipass_selected(ShardedTokenEncoder, table):
            yield from self._bpe_multipass_sharded_pallas(
                chunks, table, chunk_hint
            )
            return
        yield from self._bpe_multipass_sharded_xla(chunks, table, chunk_hint)

    def _bpe_multipass_sharded_pallas(
        self, chunks: Iterable[np.ndarray], table: MergeTable, chunk_hint: int
    ) -> Iterator[bytes]:
        from blt_tpu.ops.bpe_pallas import ShardedTokenEncoder

        enc = ShardedTokenEncoder(
            table, self.mesh, capacity_tokens=align_up(chunk_hint)
        )
        group: list = []

        def flush():
            if not group:
                return
            # one device-resident repeat-until-done loop per device: no
            # per-round host compaction round trips; the wire variant
            # transfers byteswapped u16 (half the int32 volume) whose LE
            # image IS the u16-BE stream
            yield from enc.encode_batch_resident_wire(group)
            group.clear()

        for chunk in chunks:
            if chunk.shape[0] == 0:
                continue
            group.append(chunk)
            if len(group) == self.n_rows:
                yield from flush()
        yield from flush()

    def _bpe_multipass_sharded_xla(
        self, chunks: Iterable[np.ndarray], table: MergeTable, chunk_hint: int
    ) -> Iterator[bytes]:
        from blt_tpu.ops import bpe_jax

        jax = self._jax
        jnp = jax.numpy
        keys, vals = bpe_jax.sparse_table_device(table)
        keys = jax.device_put(keys, self._rep_sh)
        vals = jax.device_put(vals, self._rep_sh)
        n_static = align_up(chunk_hint)
        b = self.n_rows
        vmapped = jax.jit(
            jax.vmap(bpe_jax.multipass_encode, in_axes=(0, 0, None, None))
        )
        group: list = []
        pending = collections.deque()

        def flush():
            if not group:
                return
            batch = np.zeros((b, n_static), np.uint8)
            lengths = np.zeros(b, np.int32)
            for r, chunk in enumerate(group):
                batch[r, : chunk.shape[0]] = chunk
                lengths[r] = chunk.shape[0]
            toks, counts = vmapped(
                jax.device_put(batch, self._row_sh),
                jax.device_put(lengths, self._vec_sh),
                keys,
                vals,
            )
            pending.append((toks, counts, len(group)))
            group.clear()

        def drain() -> bytes:
            toks_d, counts_d, nrows = pending.popleft()
            toks_h = np.asarray(toks_d)
            counts_h = np.asarray(counts_d)
            out = np.empty(int(counts_h[:nrows].sum()), dtype=">u2")
            o = 0
            for r in range(nrows):
                c = int(counts_h[r])
                if c:
                    out[o : o + c] = toks_h[r, :c]
                    o += c
            return out

        for chunk in chunks:
            if chunk.shape[0] == 0:
                continue
            group.append(chunk)
            if len(group) == b:
                flush()
                if len(pending) > self.depth:
                    yield drain()
        flush()
        while pending:
            yield drain()


AUTO_DEVICE_THRESHOLD = 32 * 1024 * 1024


def _probe_device_engine():
    """The device engine for this process, or None (no accelerator)."""
    try:
        import jax

        backend = jax.default_backend()
        if backend in ("tpu", "gpu", "cuda", "rocm", "axon"):
            # every chip of a multi-chip slice by default
            if jax.device_count() > 1:
                return ShardedJaxEngine()
            return JaxEngine()
    except Exception as e:  # pragma: no cover - broken accelerator runtime
        log.warning("accelerator probe failed (%s); using NumPy engine", e)
    return None


class AutoStreamEngine:
    """AUTO engine for unknown-size inputs (stdin): peek, then commit.

    Selection is deferred until the first chunks arrive: the stream is
    buffered until EOF or the peek threshold of accumulated bytes, then
    the whole stream (buffered prefix + remainder) is replayed through the
    chosen engine — small pipes stay on the NumPy engine (device dispatch
    latency dominates), large pipes tokenize on the accelerator. Because no
    engine consumes a byte before selection, semantics are identical either
    way. The peek buffer honors the run's --memcap budget: the threshold is
    ``min(AUTO_DEVICE_THRESHOLD, mem_budget)``, so a small memory cap never
    gets blown by the selection peek itself. Deliberate consequence: when
    the budget is below the 32MB dispatch-latency threshold, reaching the
    budget commits to the accelerator — the stream is at least as large
    as we were allowed to look at, and the failure mode of keeping a
    many-GB pipe on the host engine outweighs a possibly-early device
    pick for a stream in the budget..32MB range.
    """

    name = "auto"

    def __init__(self, threads: int = 0, mem_budget: Optional[int] = None):
        self.threads = threads
        self.selected = None  # set on first stream; exposed for tests/logs
        self.peek_threshold = AUTO_DEVICE_THRESHOLD
        if mem_budget is not None and mem_budget > 0:
            self.peek_threshold = min(AUTO_DEVICE_THRESHOLD, mem_budget)

    def _select(self, chunks: Iterable[np.ndarray]):
        import itertools

        buffered = []
        total = 0
        it = iter(chunks)
        for chunk in it:
            buffered.append(chunk)
            total += chunk.shape[0]
            if total >= self.peek_threshold:
                break
        engine = None
        if total >= self.peek_threshold:
            engine = _probe_device_engine()
        if engine is None:
            engine = NumpyEngine(self.threads)
        self.selected = engine
        log.info("AUTO stream committed to %s engine (%d bytes peeked)",
                 engine.name, total)
        return engine, itertools.chain(buffered, it)

    def basic_stream(self, chunks, chunk_hint: int) -> Iterator[bytes]:
        engine, replay = self._select(chunks)
        yield from engine.basic_stream(replay, chunk_hint)

    def passthrough_stream(self, chunks, chunk_hint: int) -> Iterator[bytes]:
        # identity copy never benefits from the device
        engine = NumpyEngine(self.threads)
        self.selected = engine
        yield from engine.passthrough_stream(chunks, chunk_hint)

    def bpe_stream(self, chunks, table: MergeTable, chunk_hint: int) -> Iterator[bytes]:
        engine, replay = self._select(chunks)
        yield from engine.bpe_stream(replay, table, chunk_hint)


class PayloadAutoEngine:
    """Per-payload engine selection for known-size in-memory requests.

    The serving twin of the CLI's AUTO policy: each request's size is
    known up front (Content-Length), so selection is a simple threshold —
    small payloads stay on the host engine (device dispatch latency
    dominates), large payloads go to the accelerator when one exists.
    The device engine is probed lazily ONCE (first large payload) and
    shared across requests; callers resolve the concrete engine with
    ``select(size)`` before streaming.
    """

    name = "auto"

    def __init__(
        self, threads: int = 0, device_threshold: Optional[int] = None
    ):
        import threading

        self.threads = threads
        self.threshold = (
            device_threshold
            if device_threshold and device_threshold > 0
            else AUTO_DEVICE_THRESHOLD
        )
        self._host = NumpyEngine(threads)
        self._device = None
        self._probed = False
        # serialize the first probe: under ThreadingHTTPServer, two
        # concurrent large requests must not double-probe (duplicate
        # device init) or race check-then-act into silently serving a
        # large payload on the host engine
        self._probe_lock = threading.Lock()

    def select(self, size: int):
        if size >= self.threshold:
            if not self._probed:
                with self._probe_lock:
                    if not self._probed:
                        self._device = _probe_device_engine()
                        self._probed = True
                        if self._device is not None:
                            log.info(
                                "payload AUTO: %s engine for payloads "
                                ">= %d bytes",
                                self._device.name, self.threshold,
                            )
            if self._device is not None:
                return self._device
        return self._host


def select_engine(
    engine_pref,
    input_size: Optional[int],
    threads: int = 0,
    mem_budget: Optional[int] = None,
):
    """AUTO: device engine for large inputs on an accelerator, else NumPy.

    Device dispatch + compile latency dominates small inputs; the NumPy
    engine is already at memory-bandwidth speed there. Unknown-size streams
    get the peek-then-commit AutoStreamEngine, whose peek buffer is bounded
    by ``mem_budget`` (the --memcap-derived byte budget) when given.
    """
    from blt_tpu.config import Engine

    if engine_pref == Engine.NUMPY:
        return NumpyEngine(threads)
    if engine_pref == Engine.JAX:
        return JaxEngine(threads=threads)
    if engine_pref == Engine.SHARD:
        return ShardedJaxEngine(threads=threads)
    if input_size is None:
        return AutoStreamEngine(threads, mem_budget=mem_budget)
    if input_size < AUTO_DEVICE_THRESHOLD:
        return NumpyEngine(threads)
    engine = _probe_device_engine()
    return engine if engine is not None else NumpyEngine(threads)
