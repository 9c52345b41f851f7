"""Pallas TPU kernel for single-pass flat BPE (the hot inner loop).

TPU-native design notes (why this shape):

- XLA lowers >128-entry table gathers and irregular scatters to scalar code
  (~10M elem/s measured on v5e) — 100x off memory bandwidth. The only
  vectorized lookup primitive is ``tpu.dynamic_gather`` with a table that
  fits one vreg along the gather dimension (128 lanes), so every lookup is
  a per-128-segment chain of dynamic_gathers + selects on the VPU and the
  chain length IS the rate. The primary lookup is a CHD perfect hash
  (merges.MergeTable.build_chd): one displacement gather + ONE entry chain
  at ~0.98 load — (slots+B)/128 total segments vs the 2-table cuckoo's
  2*slots/128 at <=0.5 load (the cuckoo stays as a fallback when CHD
  placement fails or costs more; measured on v5e, 500 rules: CHD 5 segs
  18.1 GB/s vs cuckoo 8 segs 13.8 GB/s). Entries pack ``key<<16 | value``
  into one int32 so a probe is a single gather; a hit check compares the
  key half against the queried pair. Table values are stored
  pre-byteswapped so the emit path never swaps (a byte's wire form is
  just ``d << 8``).

- The reference's sequential in-buffer merge scan
  (reference: blt_core/src/tokenizer.rs:61-86) becomes the parity-scan
  recurrence (merge_start[i] = match[i] & ~merge_start[i-1]) resolved with
  a two-phase max-scan over "last non-match position": 7 masked lane-rolls
  within each 128-lane row, then a log-depth roll-scan over row maxima.
  No lax.cummax (XLA's flat 1D scan is ~1.3 GB/s; this is pure VPU work).

- Grid steps run sequentially on the TensorCore, so the cross-block carry
  bit (did the previous block's final byte start a merge?) lives in SMEM
  scratch — exact global semantics with zero collectives, the single-chip
  analog of the cross-batch carry in blt_tpu.ops.bpe_jax.flat_encode.

- Compaction is deferred: the kernel emits one byteswapped-uint16 token
  slot per input byte (merge value at starts, byte value elsewhere, 0 at
  consumed slots); the LE memory image of the kept slots IS the u16-BE
  wire stream. For every file-loadable table (values >= 256 > any byte)
  the drain rule "drop the slot whose predecessor has a nonzero low
  (swapped) byte" reconstructs the exact compacted stream, so no scatter
  is needed anywhere.

Scope: flat tables with all values >= 256 and byte-pair keys (every table
loadable from a merges file). Other tables fall back to the XLA kernels.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blt_tpu.merges import MergeTable

LANES = 128
ROWS_PER_BLOCK = 512  # default rows per grid step (tunable per encoder)
BLOCK = ROWS_PER_BLOCK * LANES
MAX_SLOTS = 8192  # cuckoo sizing cap (adaptive: merges.MergeTable.cuckoo_slots)
_NEG = -(2**31) + 1


def _padded_rows(capacity: int, block: int, rows_per_block: int) -> int:
    """Rows of a kernel buffer for ``capacity`` elements incl. the 8 halo
    rows (must match _token_pass_call/_flat_encode_pallas_call's
    ``data3.shape[0] - 8`` and their halo BlockSpecs)."""
    return (capacity // block) * rows_per_block + 8


def _tree_lookup(e_ref, h):
    """Gather int32 entries for slot indices h (R,128) from a (segs,128) table.

    One 128-lane dynamic_gather per table segment + a select chain; every op
    is a full-vreg VPU instruction. Segment count adapts to the rule count
    (merges.MergeTable.cuckoo_slots), so small tables cost few gathers.
    """
    r = h.shape[0]
    segs = e_ref.shape[0]
    hi = h >> 7
    lo = h & (LANES - 1)
    acc = jnp.full(h.shape, -1, dtype=jnp.int32)
    for k in range(segs):
        seg = jnp.broadcast_to(e_ref[k, :].reshape(1, LANES), (r, LANES))
        g = jnp.take_along_axis(seg, lo, axis=1)
        acc = jnp.where(hi == k, g, acc)
    return acc


def _tree_lookup_sparse(e_ref, segs_ref, h, unroll: int = 8):
    """Occupancy-compressed gather chain for the packed-dense table.

    Packed-dense segment k holds exactly the pairs whose FIRST byte is k,
    so only segments whose first byte appears in some rule can ever hit:
    the encoder ships the compacted table rows plus their original segment
    ids (SMEM-prefetched), and the chain iterates over the occupied rows
    only. Text-trained tables occupy ~50-100 of 256 segments, cutting the
    per-byte gather count 2.5-5x; a worst-case table degrades gracefully
    to the full chain. Partial unrolling (see below) keeps the live set
    bounded: a fully unrolled 256-segment chain blows the Mosaic
    scoped-VMEM stack (63MB vs the 16MB limit), while a fully rolled
    fori_loop pays a scalar-unit branch per segment that stalls the
    vector pipeline (~3x slower measured).

    Returns 0 (= no rule in either packed half) for unmatched words.
    """
    r = h.shape[0]
    segs = e_ref.shape[0]
    assert segs % unroll == 0, (segs, unroll)
    hi = h >> 7
    lo = h & (LANES - 1)

    def body(k, acc):
        for u in range(unroll):
            idx = k * unroll + u
            sid = segs_ref[idx]
            seg = jnp.broadcast_to(e_ref[pl.ds(idx, 1), :], (r, LANES))
            g = jnp.take_along_axis(seg, lo, axis=1)
            acc = jnp.where(hi == sid, g, acc)
        return acc

    return jax.lax.fori_loop(
        0, segs // unroll, body, jnp.zeros(h.shape, dtype=jnp.int32)
    )


def _shift_right_linear(x, first_fill, lane_iota, boundary_fill=None):
    """y[linear i] = x[linear i-1] over the (R,128) row-major layout.

    first_fill: scalar for linear position 0. boundary_fill lets the caller
    override what flows into lane 0 of row 0.
    """
    r = x.shape[0]
    rolled = pltpu.roll(x, 1, axis=1)
    last_col = x[:, LANES - 1 :]  # (R,1)
    prev_last = pltpu.roll(last_col, 1, axis=0)
    row_col_iota = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    # row 0 lane 0 gets first_fill (no .at[].set: scatter is unsupported
    # in Mosaic; iota-select lowers to a plain vselect)
    if boundary_fill is None:
        fill_col = jnp.where(row_col_iota == 0, first_fill, prev_last)
    else:
        fill_col = boundary_fill
    return jnp.where(lane_iota == 0, jnp.broadcast_to(fill_col, x.shape), rolled)


def _shift_left_linear(x, last_fill, lane_iota):
    """y[linear i] = x[linear i+1]; last linear position gets last_fill.

    last_fill is a (1,1) int32 array (broadcast in the select) — extracting
    sub-int32 scalars from vectors is unsupported in Mosaic.
    """
    r = x.shape[0]
    rolled = pltpu.roll(x, LANES - 1, axis=1)  # left-shift by 1 (wraps)
    first_col = x[:, 0:1]  # (R,1)
    next_first = pltpu.roll(first_col, r - 1, axis=0)  # up-shift by 1 (wraps)
    row_col_iota = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    next_first = jnp.where(row_col_iota == r - 1, last_fill, next_first)
    return jnp.where(
        lane_iota == LANES - 1, jnp.broadcast_to(next_first, x.shape), rolled
    )


def _scan_max_linear(z, lane_iota):
    """Inclusive max-scan over the row-major linearization of z (R,128)."""
    r = z.shape[0]
    # Phase 1: intra-row scan along lanes (Hillis-Steele, 7 steps).
    s = z
    shift = 1
    while shift < LANES:
        rolled = pltpu.roll(s, shift, axis=1)
        s = jnp.maximum(s, jnp.where(lane_iota >= shift, rolled, _NEG))
        shift *= 2
    # Phase 2: exclusive scan of row maxima down the rows.
    row_max = s[:, LANES - 1 :]  # (R,1) inclusive row totals
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    excl = jnp.where(row_iota == 0, _NEG, pltpu.roll(row_max, 1, axis=0))
    shift = 1
    while shift < r:
        rolled = pltpu.roll(excl, shift, axis=0)
        excl = jnp.maximum(excl, jnp.where(row_iota >= shift, rolled, _NEG))
        shift *= 2
    return jnp.maximum(s, jnp.broadcast_to(excl, s.shape))


def _make_kernel(mode: str):
    """Build the kernel body for one lookup mode.

    "chd": CHD perfect hash — one displacement gather (e2_ref) + one
      entry gather chain (e1_ref); fewest chain steps (merges.build_chd).
    "perfect": CHD degenerate case, injective multiply-shift hash with no
      displacement array (tiny tables; e2_ref is a dummy).
    "cuckoo": 2-probe cuckoo hash over e1_ref/e2_ref (fallback when CHD
      placement fails or needs more total segments).
    "direct": packed dense 64K-value table (256-segment gather chain, any
      rule count; e1_ref holds the packed table, e2_ref is unused).
    """
    assert mode in ("chd", "perfect", "cuckoo", "direct"), mode

    def kernel(
        params_ref,  # SMEM int32[8]: length, bshift, next_byte, a1, a2, ffff, shift
        segs_ref,  # SMEM int32[S]: occupied segment ids (packed-dense mode)
        carry_in_ref,  # SMEM (1,1) int32: cross-call carry (prior carry_out)
        data_ref,  # (R,128) uint8 block
        halo_ref,  # (8,128) uint8: first rows of the next block
        e1_ref,  # (S,128) int32 cuckoo t1 / CHD entries / packed table
        e2_ref,  # (segs,128) int32 cuckoo t2 / CHD displacements / dummy
        out_ref,  # (R,128) uint16 byteswapped token slots
        carry_out_ref,  # SMEM (1,1) int32
        carry_ref,  # SMEM scratch (1,) int32: inter-block carry
    ):
        return _kernel_body(
            mode, params_ref, segs_ref, carry_in_ref, data_ref, halo_ref,
            e1_ref, e2_ref, out_ref, carry_out_ref, carry_ref,
        )

    return kernel


def _kernel_body(
    mode,
    params_ref,
    segs_ref,
    carry_in_ref,
    data_ref,
    halo_ref,
    e1_ref,
    e2_ref,
    out_ref,
    carry_out_ref,
    carry_ref,
):
    i = pl.program_id(0)
    length = params_ref[0]
    carry_call = carry_in_ref[0, 0]
    next_byte = params_ref[2]
    a1 = params_ref[3]
    a2 = params_ref[4]
    ffff = params_ref[5]
    shift = params_ref[6]
    slots_mask = e1_ref.shape[0] * LANES - 1

    r = data_ref.shape[0]
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0)
    block = r * LANES
    block_start = i * block
    gidx = block_start + row_iota * LANES + lane_iota

    d = data_ref[:].astype(jnp.int32)
    # next byte in stream order; the block halo supplies the row that
    # follows this block, the cross-call halo (next_byte) patches the very
    # last valid byte's pair below.
    halo_fill = halo_ref[:].astype(jnp.int32)[0:1, 0:1]  # (1,1), no i8 extract
    nxt = _shift_left_linear(d, halo_fill, lane_iota)
    nxt = jnp.where(gidx == length - 1, jnp.maximum(next_byte, 0), nxt)

    p = d * 256 + nxt
    # Every table ships its 16-bit values PRE-byteswapped (encoder __init__),
    # so `val` below is already in wire byte order and the emit path never
    # swaps: a plain byte's wire form is just d << 8.
    if mode == "direct":
        # packed dense table: word p>>1 holds values for pairs 2k, 2k+1
        # (0 = no rule; legal sentinel since supported values are >= 256
        # and byteswapping preserves nonzero-ness); only occupied segments
        # are shipped and chained (segs_ref ids)
        w = _tree_lookup_sparse(e1_ref, segs_ref, p >> 1)
        val = jnp.where((p & 1) == 1, (w >> 16) & 0xFFFF, w & 0xFFFF)
        m = val != 0
    elif mode == "cuckoo":
        # cuckoo probes (int32 wrap-around multiply matches the host builder)
        h1 = ((p * a1) >> shift) & slots_mask
        h2 = ((p * a2) >> shift) & slots_mask
        e1 = _tree_lookup(e1_ref, h1)
        e2 = _tree_lookup(e2_ref, h2)
        key1 = (e1 >> 16) & 0xFFFF
        key2 = (e2 >> 16) & 0xFFFF
        # an empty slot is -1 = key 0xFFFF | value 0xFFFF, whose key half
        # equals the real pair (255,255): the key compare alone would
        # false-hit bytes FF FF against EMPTY slots, so a hit requires the
        # slot to be occupied too
        hit1 = (key1 == p) & (e1 != -1)
        hit2 = (key2 == p) & (e2 != -1)
        val = jnp.where(hit1, e1 & 0xFFFF, e2 & 0xFFFF)
        m = hit1 | hit2
        # the one entry whose packed form collides with the empty sentinel
        # (byteswap keeps 0xFFFF fixed, so the patched value needs no swap)
        is_ffff = (p == 0xFFFF) & (ffff != 0)
        m = m | is_ffff
        val = jnp.where(is_ffff, 0xFFFF, val)
    else:
        # CHD perfect hash: slot (base + displacement) & mask is
        # collision-free by construction, so ONE entry gather chain plus
        # (chd only) a short displacement gather; the key compare rejects
        # the 64K-space pairs that alias onto occupied slots
        bshift = params_ref[1]
        h = (p * a2) >> shift
        if mode == "chd":
            bmask = e2_ref.shape[0] * LANES - 1
            g = ((p * a1) >> bshift) & bmask
            h = h + _tree_lookup(e2_ref, g)
        h = h & slots_mask
        e = _tree_lookup(e1_ref, h)
        m = (((e >> 16) & 0xFFFF) == p) & (e != -1)
        val = e & 0xFFFF
        is_ffff = (p == 0xFFFF) & (ffff != 0)
        m = m | is_ffff
        val = jnp.where(is_ffff, 0xFFFF, val)

    valid_pair = (gidx < length - 1) | ((gidx == length - 1) & (next_byte >= 0))
    m = m & valid_pair

    # parity scan for leftmost-first non-overlapping merges
    carry_in = jnp.where(i == 0, carry_call, carry_ref[0])
    z = jnp.where(m, _NEG, gidx)
    lnm = _scan_max_linear(z, lane_iota)
    sentinel = block_start - 1 - carry_in
    lz = jnp.maximum(lnm, sentinel)
    starts = m & (((gidx - lz) & 1) == 1)

    starts_i = starts.astype(jnp.int32)
    consumed = _shift_right_linear(starts_i, carry_in, lane_iota) != 0

    # emit byteswapped u16: the LE memory image is the u16-BE wire stream,
    # and the drop-after-merge drain tests (slot & 0xFF) != 0. Table values
    # are pre-swapped (encoder __init__) and a byte's swapped form is d<<8,
    # so no elementwise swap runs here.
    tok = jnp.where(starts, val, d << 8)
    tok = jnp.where(consumed, 0, tok)
    out_ref[:] = tok.astype(jnp.uint16)

    # carry to the next block / call: did a merge start on the final valid
    # byte of this block? Blocks entirely past length-1 (fixed-capacity
    # padding) must leave the carry untouched.
    last_pos = jnp.minimum(block_start + block - 1, length - 1)
    computed = jnp.sum(jnp.where(gidx == last_pos, starts_i, 0))
    c_next = jnp.where(last_pos >= block_start, computed, carry_in)
    carry_ref[0] = c_next
    carry_out_ref[0, 0] = c_next


@functools.partial(
    jax.jit, static_argnames=("interpret", "mode", "rows_per_block")
)
def _flat_encode_pallas_call(
    params: jnp.ndarray,  # int32[8]
    segs: jnp.ndarray,  # int32[S]: occupied segment ids (direct mode)
    carry_in: jnp.ndarray,  # int32[1,1] (a prior call's carry output)
    data3: jnp.ndarray,  # uint8[num_blocks*R + 8, 128] (halo rows)
    e1: jnp.ndarray,  # int32[S,128]
    e2: jnp.ndarray,  # int32[segs,128]
    interpret: bool = False,
    mode: str = "cuckoo",
    rows_per_block: int = ROWS_PER_BLOCK,
):
    rpb = rows_per_block
    total_rows = data3.shape[0] - 8
    num_blocks = total_rows // rpb
    grid = (num_blocks,)
    out, carry = pl.pallas_call(
        _make_kernel(mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1), lambda i, params, segs: (0, 0), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec(
                    (rpb, LANES),
                    lambda i, params, segs: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (8, LANES),
                    lambda i, params, segs: ((i + 1) * rpb // 8, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(
                    (rpb, LANES),
                    lambda i, params, segs: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1), lambda i, params, segs: (0, 0), memory_space=pltpu.SMEM
                ),
            ),
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((total_rows, LANES), jnp.uint16),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(params, segs, carry_in, data3, data3, e1, e2)
    return out, carry


class PallasFlatEncoder:
    """Stateful wrapper: holds device tables, pads inputs, runs the kernel.

    ``capacity_bytes`` fixes the padded batch shape so the kernel compiles
    exactly once per encoder (remote TPU compiles are expensive); shorter
    batches pad up and the kernel masks by ``length``.
    """

    def __init__(
        self,
        table: MergeTable,
        interpret: bool = False,
        capacity_bytes: int = 0,
        rows_per_block: int | None = None,
        force_mode: str | None = None,
    ):
        """``force_mode`` pins a specific lookup mode ("chd"/"perfect"/
        "cuckoo"/"direct") instead of the cheapest available — used by the
        bench/tests to keep every kernel mode certified on hardware even
        though the selector would not normally pick it. Raises ValueError
        when the table cannot be built in that mode."""
        # remembered so with_capacity() clones preserve the configuration
        self._init_args = (table, interpret, rows_per_block, force_mode)
        if rows_per_block is None:
            # measured on v5e (benches/results/flat_ablation_r3.json sweep):
            # 1024-row (128KB) blocks run ~5% faster than 512 (18.4 -> 19.3
            # GB/s device-chained; 2048 is flat, 4096 fails to compile).
            # Small serving buckets keep 512 so a 64KB payload does not pad
            # to a 128KB block. Dynamic-capacity encoders (capacity_bytes=0,
            # the test/tool path — every e2e pipeline fixes a capacity) and
            # PallasTokenEncoder intentionally stay at 512: their shapes
            # recompile per distinct size anyway, so the ~5% large-batch
            # win is not worth a per-call block-size re-derivation.
            rows_per_block = (
                1024 if capacity_bytes >= (1 << 20) else ROWS_PER_BLOCK
            )
        if rows_per_block % 8 != 0:
            raise ValueError("rows_per_block must be a multiple of 8")
        self.rows_per_block = rows_per_block
        self.block = rows_per_block * LANES
        if not table.flat:
            raise ValueError("Pallas encoder requires a flat table")
        values = list(table.merges.values())
        if values and min(values) < 256:
            raise ValueError(
                "Pallas encoder requires all merge values >= 256 "
                "(drop-after-merge drain rule)"
            )
        def swap_vals(e: np.ndarray) -> np.ndarray:
            # byteswap the packed low-16 value half in place; empty (-1)
            # entries map to themselves (0xFFFF is swap-symmetric)
            e64 = e.astype(np.int64)
            lo = ((e64 & 0xFF) << 8) | ((e64 >> 8) & 0xFF)
            return (((e64 >> 16) << 16) | lo).astype(np.int32)

        if force_mode not in (None, "chd", "perfect", "cuckoo", "direct"):
            raise ValueError(f"unknown force_mode {force_mode!r}")
        built_chd = None
        built = None
        small = len(table.merges) <= MAX_SLOTS
        if small and force_mode in (None, "chd", "perfect"):
            built_chd = table.build_chd(MAX_SLOTS)
            if built_chd is not None and force_mode is not None:
                got = "perfect" if built_chd[1] is None else "chd"
                if got != force_mode:
                    raise ValueError(
                        f"CHD placement for this table is {got!r}, "
                        f"not {force_mode!r}"
                    )
        if small and force_mode in (None, "cuckoo"):
            # cuckoo is worth building only if it could need fewer total
            # gather segments than the CHD placement that was found
            ck_slots = table.cuckoo_slots(max_slots=MAX_SLOTS)
            chd_segs = (
                (built_chd[0].size + (built_chd[1].size if built_chd[1] is not None else 0))
                // LANES
                if built_chd is not None
                else None
            )
            if chd_segs is None or 2 * ck_slots // LANES < chd_segs:
                built = table.build_cuckoo(ck_slots)
                if built is None and ck_slots < MAX_SLOTS:
                    built = table.build_cuckoo(MAX_SLOTS)
                    ck_slots = MAX_SLOTS
                if built is not None and chd_segs is not None:
                    if 2 * ck_slots // LANES >= chd_segs:
                        built = None  # CHD still cheaper after fallback
        if force_mode is not None:
            want_err = (
                (force_mode in ("chd", "perfect") and built_chd is None)
                or (force_mode == "cuckoo" and built is None)
            )
            if want_err:
                raise ValueError(
                    f"table cannot be built in mode {force_mode!r}"
                )
            if force_mode == "direct":
                built_chd = None
                built = None
        if built_chd is not None and built is None:
            entries, disp, a1, a2, has_ffff = built_chd
            slots = entries.size
            self.mode = "perfect" if disp is None else "chd"
            self.shift = 32 - (slots.bit_length() - 1)
            self.bshift = (
                32 - (disp.size.bit_length() - 1) if disp is not None else 0
            )
            self.e1 = jnp.asarray(
                swap_vals(entries).reshape(slots // LANES, LANES)
            )
            self.e2 = jnp.asarray(
                disp.reshape(disp.size // LANES, LANES)
                if disp is not None
                else np.zeros((1, LANES), np.int32)
            )
            self.a1 = a1
            self.a2 = a2
            self.has_ffff = has_ffff
            self.segs = jnp.asarray(np.zeros(8, np.int32))  # unused
        elif built is not None:
            e1, e2, a1, a2, has_ffff = built
            slots = ck_slots
            self.mode = "cuckoo"
            self.shift = 32 - (slots.bit_length() - 1)
            self.bshift = 0
            self.e1 = jnp.asarray(swap_vals(e1).reshape(slots // LANES, LANES))
            self.e2 = jnp.asarray(swap_vals(e2).reshape(slots // LANES, LANES))
            self.a1 = a1
            self.a2 = a2
            self.has_ffff = has_ffff
            self.segs = jnp.asarray(np.zeros(8, np.int32))  # unused
        else:
            # Large tables: packed dense 64K-value table, direct lookup
            # through an occupancy-compressed gather chain — segment k
            # holds exactly the pairs with first byte k, so only first
            # bytes that occur in some rule are shipped and chained.
            packed = table.build_packed_dense()
            # byteswap BOTH u16 value halves of each packed word (the kernel
            # emits table values verbatim; see swap_vals above)
            p64 = packed.astype(np.int64) & 0xFFFFFFFF
            packed = (
                ((p64 & 0x00FF00FF) << 8) | ((p64 >> 8) & 0x00FF00FF)
            ).astype(np.uint32).view(np.int32).reshape(256, LANES)
            occupied = np.unique(
                np.array([a for (a, _) in table.merges], np.int32)
            )
            unroll = 8
            s_pad = max(unroll, -(-occupied.shape[0] // unroll) * unroll)
            seg_ids = np.full(s_pad, -1, np.int32)  # -1 never matches
            seg_ids[: occupied.shape[0]] = occupied
            compact = np.zeros((s_pad, LANES), np.int32)
            compact[: occupied.shape[0]] = packed[occupied]
            self.mode = "direct"
            self.shift = 0
            self.bshift = 0
            self.e1 = jnp.asarray(compact)
            self.e2 = jnp.asarray(np.zeros((8, LANES), np.int32))
            self.a1 = 1
            self.a2 = 1
            self.has_ffff = False
            self.segs = jnp.asarray(seg_ids)
        self.interpret = interpret
        self.capacity = (
            -(-capacity_bytes // self.block) * self.block
            if capacity_bytes
            else 0
        )

    @property
    def direct(self) -> bool:
        """True when the packed-dense direct-lookup kernel is in use."""
        return self.mode == "direct"

    def with_capacity(self, capacity_bytes: int) -> "PallasFlatEncoder":
        """A sibling encoder for another batch capacity, same table and
        configuration (the pipeline's tail-bucket encoder)."""
        table, interpret, rpb, force_mode = self._init_args
        return PallasFlatEncoder(
            table,
            interpret=interpret,
            capacity_bytes=capacity_bytes,
            rows_per_block=rpb,
            force_mode=force_mode,
        )

    @staticmethod
    def supports(table: MergeTable) -> bool:
        if not table.flat:
            return False
        values = list(table.merges.values())
        if values and min(values) < 256:
            return False
        return True  # CHD/cuckoo for small tables, packed-dense beyond

    def params(self, n: int, next_byte: int = -1) -> jnp.ndarray:
        """The kernel's SMEM parameter vector for a batch of ``n`` bytes."""
        return jnp.asarray(
            np.array(
                [
                    n,
                    self.bshift,
                    next_byte,
                    self.a1,
                    self.a2,
                    1 if self.has_ffff else 0,
                    self.shift,
                    0,
                ],
                dtype=np.int32,
            )
        )

    @property
    def padded_bytes(self) -> int:
        """Host-buffer size for upload() (capacity + halo rows)."""
        assert self.capacity, "padded_bytes requires a fixed capacity"
        return _padded_rows(self.capacity, self.block, self.rows_per_block) * LANES

    def upload(self, data: np.ndarray, buf: np.ndarray, threads: int = 0):
        """Pack ``data`` into the reusable padded host buffer and upload.

        Returns (data3_dev, n). Blocks until the H2D transfer completes so
        the caller may reuse ``buf`` immediately (the feeder-thread
        protocol, blt_tpu/pipeline/feeder.py). Tail bytes beyond ``n`` are
        left stale — the kernel masks every consumer of them by length.
        """
        from blt_tpu.pipeline.feeder import pack_into, upload_owned

        n = data.shape[0]
        assert self.capacity and n <= self.capacity
        assert buf.shape[0] == self.padded_bytes
        pack_into(buf, data, threads)
        rows = self.padded_bytes // LANES
        return upload_owned(buf.reshape(rows, LANES)), n

    def encode_device(
        self,
        data3: jnp.ndarray,
        n: int,
        carry_in,
        next_byte: int,
    ) -> Tuple[jnp.ndarray, int, jnp.ndarray]:
        """Kernel dispatch on an already-uploaded padded batch."""
        params = self.params(n, next_byte)
        if isinstance(carry_in, (bool, int, np.bool_, np.integer)):
            carry_in = jnp.asarray(
                np.array([[1 if carry_in else 0]], dtype=np.int32)
            )
        out, carry = _flat_encode_pallas_call(
            params,
            self.segs,
            carry_in,
            data3,
            self.e1,
            self.e2,
            interpret=self.interpret,
            mode=self.mode,
            rows_per_block=self.rows_per_block,
        )
        return out, n, carry

    def encode_packed_device(
        self,
        data3: jnp.ndarray,
        n: int,
        carry_in,
        next_byte: int,
        prev_slot: jnp.ndarray,
    ):
        """Kernel + packed-D2H repack in one dispatch (see
        _flat_encode_packed). Returns (wire uint8[capacity+capacity//8],
        carry_out, last_slot); split the wire at ``self.capacity``."""
        assert self.capacity, "packed encode requires a fixed capacity"
        params = self.params(n, next_byte)
        if isinstance(carry_in, (bool, int, np.bool_, np.integer)):
            carry_in = jnp.asarray(
                np.array([[1 if carry_in else 0]], dtype=np.int32)
            )
        return _flat_encode_packed(
            params, self.segs, carry_in, data3, self.e1, self.e2, prev_slot,
            capacity=self.capacity, interpret=self.interpret,
            mode=self.mode, rows_per_block=self.rows_per_block,
        )

    def encode(
        self,
        data: np.ndarray,  # uint8[n]
        carry_in,  # bool | int | device scalar from a previous carry_out
        next_byte: int,
    ) -> Tuple[jnp.ndarray, int, jnp.ndarray]:
        """Run the kernel over one batch.

        Returns (token_slots uint16[rows,128], n_valid_slots, carry_out)
        where carry_out is a (1,1) device array passed verbatim as the next
        batch's ``carry_in`` — the dependency stays on-device and batches
        pipeline without a host sync or any glue ops (glue slices/reshapes
        would each cost an uncached remote XLA compile on tunneled TPUs).
        Flatten token slots host-side after transfer; apply the
        drop-after-merge rule (filter_slots) over n_valid_slots slots.
        """
        n = data.shape[0]
        capacity = (
            self.capacity
            if self.capacity
            else -(-n // self.block) * self.block
        )
        assert n <= capacity, f"batch {n} exceeds encoder capacity {capacity}"
        num_blocks = capacity // self.block
        padded_rows = num_blocks * self.rows_per_block + 8
        buf = np.zeros((padded_rows * LANES,), np.uint8)
        buf[:n] = data
        data3 = jnp.asarray(buf.reshape(padded_rows, LANES))
        return self.encode_device(data3, n, carry_in, next_byte)


def filter_slots(slots: np.ndarray, prev_token: int) -> Tuple[np.ndarray, int]:
    """Apply the drop-after-merge drain rule on the host.

    slots: byteswapped uint16[n] (one per input byte); the LE memory image
    of the result is the exact u16-BE wire stream. A slot is dropped when
    the previous slot holds a merged token (original value >= 256, i.e.
    swapped low byte != 0) — the kernel writes merge values at start slots
    and 0 at consumed slots, so this reconstructs the compacted stream.
    prev_token (swapped domain) threads the rule across batch boundaries.
    Returns (be_tokens_u16, last_slot).
    """
    if slots.shape[0] == 0:
        return slots, prev_token
    prev = np.empty_like(slots)
    prev[0] = prev_token
    prev[1:] = slots[:-1]
    keep = (prev & 0xFF) == 0
    toks = slots[keep]
    return toks, int(slots[-1])


@functools.partial(jax.jit, static_argnames=("capacity",))
def compact_slots_device(
    slots: jnp.ndarray,  # (rows, 128) uint16 byteswapped slots
    n: jnp.ndarray,  # int32: valid slot count
    prev_slot: jnp.ndarray,  # int32: last slot of the previous batch
    # (literal s[n-1]; may be a merge start, which drops this batch's
    # first slot under the drop-after-merge rule)
    capacity: int,
):
    """Drop-after-merge drain + stable compaction ON DEVICE.

    The device-side twin of ``filter_slots``: keeps slot i iff the
    predecessor slot's low (swapped) byte is 0 (i.e. the predecessor is
    not a merged token), then stably partitions survivors to the front.
    Lets the pipeline transfer only ~the real output bytes instead of the
    full 2x-input slot array plus a host filter pass (BLT_D2H=compact).
    Superseded by pack_slots_device (the default), which moves less data
    with static shapes and no sort; kept for comparison benches.
    Returns (compacted uint16[capacity], m, last_raw_slot int32).
    """
    s = slots.reshape(-1)[:capacity].astype(jnp.int32)
    iota = jnp.arange(capacity, dtype=jnp.int32)
    prev = jnp.concatenate([prev_slot.reshape(1), s[:-1]])
    alive = ((prev & 0xFF) == 0) & (iota < n)
    m = jnp.sum(alive.astype(jnp.int32))
    keys = jnp.where(alive, iota, capacity + iota)
    _, comp = jax.lax.sort_key_val(keys, s)
    last = jnp.where(n > 0, s[jnp.maximum(n - 1, 0)], prev_slot)
    return comp.astype(jnp.uint16), m, last


@functools.partial(jax.jit, static_argnames=("capacity",))
def pack_slots_device(
    slots: jnp.ndarray,  # (rows, 128) uint16 byteswapped slots
    n: jnp.ndarray,  # int32: valid slot count
    prev_slot: jnp.ndarray,  # int32: last slot of the previous batch
    # (may be a merge start — required for the carry-free cross-batch
    # lo-byte emission; do NOT filter it to the last raw slot)
    capacity: int,
):
    """Pack kernel slots to 1 byte/position + 1 flag bit — the D2H diet.

    The u16 slot array is 2x the input; this emits a byte stream the size
    of the INPUT plus a 1-bit-per-position flag plane (1.125x total, a
    1.78x D2H cut), with STATIC output shapes — no device sort, no count
    sync, no bucketed slicing. Per position i:

      raw byte b  (slot b<<8, flag 0):  emit b          (host: 0x00, b)
      merge start (slot swapped(v)>=256, flag 1): emit v>>8   (hi)
      consumed    (slot 0, prev is a start, flag 1): emit v&0xFF (lo)

    Flag-1 positions contribute exactly their byte, flag-0 positions a
    zero plus their byte, so the host expansion
    (native.unpack_slots / unpack_slots_host) needs NO carry state: a
    merge split across batches emits its hi byte at the end of one batch
    and its lo byte at the start of the next. Relies on the kernel slot
    invariants: a slot with a nonzero low byte is always followed by a 0
    consumed slot, and the STREAM's final slot is never a start (at EOF
    the kernel has next_byte=-1, so no merge begins on the last byte) —
    equivalent to filter_slots only for such streams.
    Flags pack LSB-first, 8 consecutive positions per byte.
    Returns (packed uint8[capacity], flags uint8[capacity//8],
    last_raw_slot int32).
    """
    assert capacity % 8 == 0
    s = slots.reshape(-1)[:capacity].astype(jnp.int32)
    byte, fbytes = _pack_slots_core(s, prev_slot)
    last = jnp.where(n > 0, s[jnp.maximum(n - 1, 0)], prev_slot)
    return byte, fbytes, last


def _pack_slots_core(s: jnp.ndarray, prev_slot: jnp.ndarray):
    """Shared pack arithmetic over a flat int32 slot vector (see
    pack_slots_device). Returns (bytes uint8[n], flags uint8[n//8])."""
    prev = jnp.concatenate([prev_slot.reshape(1), s[:-1]])
    is_start = (s & 0xFF) != 0
    is_consumed = (prev & 0xFF) != 0
    byte = jnp.where(
        is_start, s & 0xFF, jnp.where(is_consumed, prev >> 8, s >> 8)
    )
    flag = (is_start | is_consumed).astype(jnp.int32).reshape(-1, 8)
    weights = jnp.left_shift(1, jnp.arange(8, dtype=jnp.int32))
    fbytes = jnp.sum(flag * weights, axis=1)
    return byte.astype(jnp.uint8), fbytes.astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=("capacity", "interpret", "mode", "rows_per_block"),
)
def _flat_encode_packed(
    params: jnp.ndarray,
    segs: jnp.ndarray,
    carry_in: jnp.ndarray,
    data3: jnp.ndarray,
    e1: jnp.ndarray,
    e2: jnp.ndarray,
    prev_slot: jnp.ndarray,
    capacity: int,
    interpret: bool,
    mode: str,
    rows_per_block: int,
):
    """Kernel + packed-D2H post-pass in ONE jit/dispatch.

    Returns (wire uint8[capacity + capacity//8], carry_out, last_slot):
    the wire holds the packed byte stream then the flag plane, so the
    drain needs a single D2H transfer — on a high-latency link the
    split (bytes, flags) transfer pair costs an extra round trip per
    batch, which dominates small serving payloads.
    """
    out, carry = _flat_encode_pallas_call(
        params, segs, carry_in, data3, e1, e2,
        interpret=interpret, mode=mode, rows_per_block=rows_per_block,
    )
    s = out.reshape(-1)[:capacity].astype(jnp.int32)
    byte, fbytes = _pack_slots_core(s, prev_slot)
    n = params[0]
    last = jnp.where(n > 0, s[jnp.maximum(n - 1, 0)], prev_slot)
    return jnp.concatenate([byte, fbytes]), carry, last


@jax.jit
def pack_slots_batch(slots: jnp.ndarray):
    """Per-slab pack for the halo-sharded drain: (B, rows, 128) slots ->
    (B, rows*128 + rows*16) combined wire (packed bytes then flag
    plane, one D2H transfer per batch), each slab packed independently
    with prev_slot=0 (slab position 0 is always inside the dropped halo
    region, so its prev never matters). vmapped elementwise work — XLA
    partitions it over the slab axis with no collectives when the input
    is row-sharded."""
    b = slots.shape[0]
    s = slots.reshape(b, -1).astype(jnp.int32)
    byte, fbytes = jax.vmap(_pack_slots_core, in_axes=(0, None))(
        s, jnp.int32(0)
    )
    return jnp.concatenate([byte, fbytes], axis=1)


def unpack_slots_host(
    packed: np.ndarray, flags: np.ndarray, n: int, start: int = 0
) -> np.ndarray:
    """Host expansion of pack_slots_device output to the u16-BE wire.

    NumPy fallback for native.unpack_slots: flag-0 positions expand to
    (0x00, byte), flag-1 positions to their single byte. Carry-free (see
    pack_slots_device); ``start`` expands only positions
    [start, start+n).
    """
    if n == 0:
        return np.empty(0, np.uint8)
    end = start + n
    bits = np.unpackbits(
        np.ascontiguousarray(flags[: (end + 7) // 8]), bitorder="little"
    )[start:end].astype(np.int64)
    total = int(2 * n - bits.sum())
    off = 2 * np.arange(n, dtype=np.int64)
    off[1:] -= np.cumsum(bits[:-1])
    out = np.zeros(total, np.uint8)
    out[off + (1 - bits)] = packed[start:end]
    return out


@functools.partial(
    jax.jit, static_argnames=("k", "interpret", "mode", "rows_per_block")
)
def flat_encode_chained(
    params: jnp.ndarray,
    segs: jnp.ndarray,
    carry_in: jnp.ndarray,
    data3: jnp.ndarray,
    e1: jnp.ndarray,
    e2: jnp.ndarray,
    k: int = 8,
    interpret: bool = False,
    mode: str = "cuckoo",
    rows_per_block: int = ROWS_PER_BLOCK,
):
    """Run the flat-BPE kernel k times back-to-back on the device.

    Each iteration consumes the previous carry, so the loop body cannot be
    hoisted and the device executes k kernels with no host round-trip —
    the steady-state dispatch shape for large streams (and the honest way
    to measure device throughput when per-dispatch host overhead is high,
    e.g. through a tunneled TPU).
    Returns (last_out, last_carry).
    """

    def body(c, _):
        out, c2 = _flat_encode_pallas_call(
            params,
            segs,
            c,
            data3,
            e1,
            e2,
            interpret=interpret,
            mode=mode,
            rows_per_block=rows_per_block,
        )
        return c2, ()

    carry, _ = jax.lax.scan(body, carry_in, None, length=k - 1)
    return _flat_encode_pallas_call(
        params,
        segs,
        carry,
        data3,
        e1,
        e2,
        interpret=interpret,
        mode=mode,
        rows_per_block=rows_per_block,
    )


def _token_pass_kernel(
    params_ref,  # SMEM int32[8]: length, a1, a2, shift
    data_ref,  # (R,128) int32 tokens
    halo_ref,  # (8,128) int32: first rows of the next block
    k1_ref,  # (segs,128) int32 cuckoo key plane 1
    v1_ref,  # (segs,128) int32 cuckoo value plane 1 (-1 = empty)
    k2_ref,
    v2_ref,
    out_ref,  # (R,128) int32: token, or -1 at consumed slots
    carry_ref,  # SMEM scratch (1,) int32: inter-block parity carry
):
    """One whole-sequence merge pass over u16 tokens (general tables).

    The multipass analog of the flat byte kernel: same parity scan and
    inter-block carry, but 32-bit pair keys ((a<<16)|b wrapped to int32)
    looked up through two-plane cuckoo tables, and consumed slots emitted
    as -1 tombstones for host-side compaction between passes. Reference
    semantics: one iteration of the repeat-until-no-merges loop in
    blt_core/src/tokenizer.rs:63-86.
    """
    i = pl.program_id(0)
    length = params_ref[0]
    a1 = params_ref[1]
    a2 = params_ref[2]
    shift = params_ref[3]
    slots_mask = k1_ref.shape[0] * LANES - 1

    r = data_ref.shape[0]
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0)
    block = r * LANES
    block_start = i * block
    gidx = block_start + row_iota * LANES + lane_iota

    d = data_ref[:]
    halo_fill = halo_ref[0:1, 0:1]
    nxt = _shift_left_linear(d, halo_fill, lane_iota)

    p = d * 65536 + nxt  # int32 wrap matches MergeTable.build_cuckoo32
    h1 = ((p * a1) >> shift) & slots_mask
    h2 = ((p * a2) >> shift) & slots_mask
    e_k1 = _tree_lookup(k1_ref, h1)
    e_v1 = _tree_lookup(v1_ref, h1)
    e_k2 = _tree_lookup(k2_ref, h2)
    e_v2 = _tree_lookup(v2_ref, h2)
    hit1 = (e_k1 == p) & (e_v1 >= 0)
    hit2 = (e_k2 == p) & (e_v2 >= 0)
    val = jnp.where(hit1, e_v1, e_v2)
    m = (hit1 | hit2) & (gidx < length - 1)

    carry_in = jnp.where(i == 0, 0, carry_ref[0])
    z = jnp.where(m, _NEG, gidx)
    lnm = _scan_max_linear(z, lane_iota)
    sentinel = block_start - 1 - carry_in
    lz = jnp.maximum(lnm, sentinel)
    starts = m & (((gidx - lz) & 1) == 1)

    starts_i = starts.astype(jnp.int32)
    consumed = _shift_right_linear(starts_i, carry_in, lane_iota) != 0
    tok = jnp.where(starts, val, d)
    out_ref[:] = jnp.where(consumed, -1, tok)

    last_pos = jnp.minimum(block_start + block - 1, length - 1)
    computed = jnp.sum(jnp.where(gidx == last_pos, starts_i, 0))
    carry_ref[0] = jnp.where(last_pos >= block_start, computed, carry_in)


@functools.partial(
    jax.jit, static_argnames=("interpret", "rows_per_block")
)
def _token_pass_call(
    params: jnp.ndarray,  # int32[8]
    data3: jnp.ndarray,  # int32[num_blocks*R + 8, 128] (halo rows)
    k1: jnp.ndarray,
    v1: jnp.ndarray,
    k2: jnp.ndarray,
    v2: jnp.ndarray,
    interpret: bool = False,
    rows_per_block: int = ROWS_PER_BLOCK,
):
    rpb = rows_per_block
    total_rows = data3.shape[0] - 8
    num_blocks = total_rows // rpb
    return pl.pallas_call(
        _token_pass_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_blocks,),
            in_specs=[
                pl.BlockSpec(
                    (rpb, LANES),
                    lambda i, params: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (8, LANES),
                    lambda i, params: ((i + 1) * rpb // 8, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (rpb, LANES),
                lambda i, params: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        ),
        out_shape=jax.ShapeDtypeStruct((total_rows, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(params, data3, data3, k1, v1, k2, v2)


@functools.partial(
    jax.jit, static_argnames=("capacity", "interpret", "rows_per_block")
)
def _multipass_resident_call(
    buf: jnp.ndarray,  # int32[padded_rows*128] (halo rows zeroed)
    n: jnp.ndarray,  # int32 scalar: valid token count
    hash_params: jnp.ndarray,  # int32[3]: a1, a2, shift
    k1: jnp.ndarray,
    v1: jnp.ndarray,
    k2: jnp.ndarray,
    v2: jnp.ndarray,
    capacity: int,
    interpret: bool = False,
    rows_per_block: int = ROWS_PER_BLOCK,
):
    """Full multipass with ON-DEVICE compaction: one H2D + one D2H total.

    The token-pass kernel runs inside lax.while_loop; between passes the
    -1 tombstones are compacted with a stable device partition
    (sort_key_val over [alive ? iota : capacity+iota]) instead of a host
    round trip. Measured on a tunneled v5e (4MB, ~10-round table):
    host-compaction 1.6 MB/s, this loop 9.6 MB/s end-to-end / 82 MB/s
    with resident buffers (tools/exp_mp.py). Loop semantics mirror
    reference tokenizer.rs:63-86: repeat until a pass makes zero merges.
    """
    rpb = rows_per_block
    padded_rows = buf.shape[0] // LANES
    iota = jnp.arange(capacity, dtype=jnp.int32)
    total = padded_rows * LANES

    def one_pass(b, m):
        params = jnp.concatenate(
            [m.reshape(1), hash_params, jnp.zeros(4, jnp.int32)]
        )
        out = _token_pass_call(
            params, b.reshape(padded_rows, LANES), k1, v1, k2, v2,
            interpret=interpret, rows_per_block=rpb,
        ).reshape(-1)[:capacity]
        alive = (out != -1) & (iota < m)
        m2 = jnp.sum(alive.astype(jnp.int32))
        keys = jnp.where(alive, iota, capacity + iota)
        _, compacted = jax.lax.sort_key_val(keys, out)
        b2 = jnp.zeros((total,), jnp.int32).at[:capacity].set(compacted)
        return b2, m2

    def cond(state):
        _, prev, m, first = state
        return first | ((m < prev) & (m > 1))

    def body(state):
        b, _, m, _ = state
        b2, m2 = one_pass(b, m)
        return b2, m, m2, jnp.asarray(False)

    b, _, m, _ = jax.lax.while_loop(
        cond, body, (buf, n + 1, n, jnp.asarray(True))
    )
    return b[:capacity], m


_GAP_LOOKAHEAD = 4  # next/prev-alive window: tolerates tombstone runs <= 3
_GAP_COMPACT_EVERY = 3  # passes between compactions (gap growth 0->1->3)


def _mp_compact_mode() -> str:
    """Resident-multipass compaction policy (BLT_MP_COMPACT env):
    ``gap`` (default) = gap-tolerant passes, sort every 3rd round only;
    ``sort`` = the pre-r5 stable-sort-every-pass loop (escape hatch /
    comparison baseline)."""
    import os

    mode = os.environ.get("BLT_MP_COMPACT", "gap")
    return mode if mode in ("gap", "sort") else "gap"


def _compose_affine(later, earlier):
    """Compose packed affine-bool transforms ``x -> a ^ (b & x)``.

    Packed as ``a | (b << 1)`` (identity = 2, reset-to-0 = 0, flip = 3,
    const-1 = 1). Returns ``later ∘ earlier`` (earlier applies first) —
    the merge-start recurrence of the scan as an associative operator.
    Bit algebra relies on operands staying in [0,3]:
    a' = aL ^ (bL & aE) = bit0 of L ^ ((L>>1) & E);
    b' << 1 = (bL & bE) << 1 = L & E & 2.  (6 vector ops.)
    """
    return ((later ^ ((later >> 1) & earlier)) & 1) | (later & earlier & 2)


def _scan_compose_linear(v, lane_iota):
    """Inclusive composition-scan of packed affine transforms over the
    row-major linearization of v (R,128) — the same two-phase structure
    as _scan_max_linear with compose in place of max."""
    r = v.shape[0]
    s = v
    shift = 1
    while shift < LANES:
        rolled = pltpu.roll(s, shift, axis=1)
        s = jnp.where(lane_iota >= shift, _compose_affine(s, rolled), s)
        shift *= 2
    row_tot = s[:, LANES - 1 :]  # (R,1) whole-row compositions
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    excl = jnp.where(row_iota == 0, 2, pltpu.roll(row_tot, 1, axis=0))
    shift = 1
    while shift < r:
        rolled = pltpu.roll(excl, shift, axis=0)
        excl = jnp.where(
            row_iota >= shift, _compose_affine(excl, rolled), excl
        )
        shift *= 2
    return _compose_affine(s, jnp.broadcast_to(excl, s.shape))


def _token_pass_gap_kernel(
    params_ref,  # SMEM int32[8]: unused, a1, a2, shift
    halos_ref,  # SMEM int32[num_blocks, LOOKAHEAD]: the next block's
    #   first LOOKAHEAD elements per block (-1 beyond the array) — tiny
    #   prefetched scalars instead of halo rows, so data and output are
    #   plain capacity-sized buffers that swap roles between rounds
    data_ref,  # (R,128) int32 tokens; -1 = tombstone (also beyond length)
    k1_ref,
    v1_ref,
    k2_ref,
    v2_ref,
    out_ref,  # (R,128) int32: token, or -1 at consumed/tombstone slots
    count_ref,  # (num_blocks, 1) int32 SMEM (unblocked): per-block alive
    #   counts of the OUTPUT, written at [program_id, 0]
    carry_ref,  # SMEM scratch (1,) int32: merge-start state entering
    #   the next block (the reference loop's merge_start[i-1] bit)
):
    """One merge pass over a TOMBSTONED token stream (gap-tolerant).

    Identical semantics to _token_pass_kernel run on the compacted
    stream: tombstone runs of up to _GAP_LOOKAHEAD-1 positions are
    skipped in place, so the resident multipass only needs a real
    compaction every _GAP_COMPACT_EVERY passes instead of every pass —
    the device sort was 7x the sweep cost (tools/exp_mp_ablate.py).
    Mechanics: pairs form between each alive element and its next alive
    neighbor (a select chain over shifted copies, the one gap-bounded
    construct); the reference's sequential merge_start recurrence over
    the alive subsequence becomes a composition scan of per-element
    affine-bool transforms (match=flip, non-match=reset, tombstone=
    identity), continued across blocks by one carried bit. The input
    must be -1-padded beyond its valid length (EOF then needs no length
    math: the last element finds no next-alive and never starts a merge
    — per-chunk semantics, reference tokenizer.rs:61-86).
    """
    i = pl.program_id(0)
    a1 = params_ref[1]
    a2 = params_ref[2]
    shift = params_ref[3]
    slots_mask = k1_ref.shape[0] * LANES - 1

    r = data_ref.shape[0]
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0)
    block = r * LANES
    block_start = i * block
    gidx = block_start + row_iota * LANES + lane_iota

    d = data_ref[:]
    alive = d >= 0

    # next-alive value within the lookahead window; shift^k's tail fill
    # is the k-th element of the next block (prefetched SMEM scalar)
    t = d
    nxt = None
    for k in range(1, _GAP_LOOKAHEAD + 1):
        fill = jnp.full((1, 1), halos_ref[i, k - 1], jnp.int32)
        t = _shift_left_linear(t, fill, lane_iota)
        nxt = t if nxt is None else jnp.where(nxt >= 0, nxt, t)

    p = d * 65536 + nxt  # int32 wrap matches MergeTable.build_cuckoo32
    h1 = ((p * a1) >> shift) & slots_mask
    h2 = ((p * a2) >> shift) & slots_mask
    e_k1 = _tree_lookup(k1_ref, h1)
    e_v1 = _tree_lookup(v1_ref, h1)
    e_k2 = _tree_lookup(k2_ref, h2)
    e_v2 = _tree_lookup(v2_ref, h2)
    hit1 = (e_k1 == p) & (e_v1 >= 0)
    hit2 = (e_k2 == p) & (e_v2 >= 0)
    val = jnp.where(hit1, e_v1, e_v2)
    m = (hit1 | hit2) & alive & (nxt >= 0)

    # the reference recurrence merge_start[i] = match[i] & ~merge_start
    # [i-1] over the ALIVE subsequence, as an affine-composition scan
    # (match = flip, non-match = reset-to-0, tombstone = identity — so
    # the previous ALIVE element's state survives gaps of any length
    # for free). The EXCLUSIVE state s_in at each position is exactly
    # the previous alive element's merge-start bit, giving both outputs
    # with no prev-alive chain: start = match & ~s_in, consumed =
    # alive & s_in.
    v = jnp.where(alive, jnp.where(m, 3, 0), 2)
    s_incl = _scan_compose_linear(v, lane_iota)
    fs = _shift_right_linear(s_incl, 2, lane_iota)  # exclusive; 2 = id
    x_in = jnp.where(i == 0, 0, carry_ref[0])
    s_in = (fs & 1) ^ ((fs >> 1) & x_in)
    starts = m & (s_in == 0)
    consumed = alive & (s_in == 1)

    tok = jnp.where(starts, val, d)
    dead = consumed | ~alive
    out_ref[:] = jnp.where(dead, -1, tok)
    # fused alive-count (saves a full XLA reduction pass per round)
    count_ref[i, 0] = jnp.sum((~dead).astype(jnp.int32))

    # carry: the merge-start state after this block's last element
    # (trailing tombstones are identity transforms — no last-alive
    # search needed)
    last_pos = block_start + block - 1
    x_out = (s_incl & 1) ^ ((s_incl >> 1) & x_in)
    carry_ref[0] = jnp.sum(jnp.where(gidx == last_pos, x_out, 0))


@functools.partial(
    jax.jit, static_argnames=("interpret", "rows_per_block")
)
def _token_pass_gap_call(
    params: jnp.ndarray,  # int32[8]
    data2: jnp.ndarray,  # int32[num_blocks*R, 128]; -1 beyond length
    k1: jnp.ndarray,
    v1: jnp.ndarray,
    k2: jnp.ndarray,
    v2: jnp.ndarray,
    interpret: bool = False,
    rows_per_block: int = ROWS_PER_BLOCK,
):
    """One gap-tolerant pass over a capacity-sized buffer (no halo
    rows: the next block's boundary elements ride a tiny prefetched
    halos array, so the output is a drop-in replacement buffer for the
    next round with no copy-back). Returns (tokens, per-block alive
    counts)."""
    rpb = rows_per_block
    total_rows = data2.shape[0]
    num_blocks = total_rows // rpb
    # boundary elements of the NEXT block per block, -1 past the end.
    # Row-strided slice, NOT a reshape to (num_blocks, rpb*LANES): that
    # reshape is layout-incompatible on TPU and forced a full relayout
    # copy of the buffer per pass (measured 1.4x on the whole loop).
    halos = jnp.concatenate(
        [
            data2[rpb::rpb, :_GAP_LOOKAHEAD],
            jnp.full((1, _GAP_LOOKAHEAD), -1, jnp.int32),
        ],
        axis=0,
    )
    return pl.pallas_call(
        _token_pass_gap_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_blocks,),
            in_specs=[
                pl.BlockSpec(
                    (rpb, LANES),
                    lambda i, params, halos: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec(
                    (rpb, LANES),
                    lambda i, params, halos: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((total_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((num_blocks, 1), jnp.int32),
        ],
        # NOTE: input_output_aliases={2: 0} was measured 1.4x SLOWER
        # (380 vs 550 MB/s full-loop): in-place buffers defeat Mosaic's
        # grid prefetch double-buffering. A fresh output costs one HBM
        # allocation and keeps the pipeline overlapped.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(params, halos, data2, k1, v1, k2, v2)


@functools.partial(
    jax.jit, static_argnames=("capacity", "interpret", "rows_per_block")
)
def _multipass_gap_resident_call(
    buf: jnp.ndarray,  # int32[capacity]; caller pads [n, capacity) = -1
    n: jnp.ndarray,  # int32 scalar: valid token count
    hash_params: jnp.ndarray,  # int32[3]: a1, a2, shift
    k1: jnp.ndarray,
    v1: jnp.ndarray,
    k2: jnp.ndarray,
    v2: jnp.ndarray,
    capacity: int,
    interpret: bool = False,
    rows_per_block: int = ROWS_PER_BLOCK,
):
    """Full multipass with GAP-TOLERANT passes: sort only every 3rd round.

    The repeat-until-no-merges loop (reference tokenizer.rs:63-86) with
    the tombstone-skipping pass kernel running IN PLACE (the kernel
    output aliases the loop buffer): consecutive passes leave -1
    tombstones where merges consumed tokens (runs grow 0 -> 1 -> 3,
    within the kernel's lookahead), and the stable-sort compaction —
    measured at 7x the sweep cost (tools/exp_mp_ablate.py) — runs only
    when a 4th round is actually needed. The -1 padding contract means
    no device-side masking pass: tombstone == padding, and a -1 "token"
    can never match a rule because matches require alive operands.
    Returns (tokens int32[capacity] WITH tombstones, alive count m);
    callers drop the -1s host-side (or ship the packed alive-flag
    plane, _multipass_gap_wire_call).
    """
    rpb = rows_per_block
    rows = capacity // LANES
    iota_cap = jnp.arange(capacity, dtype=jnp.int32)
    params = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), hash_params, jnp.zeros(4, jnp.int32)]
    )

    def one_pass(b):
        out, counts = _token_pass_gap_call(
            params, b.reshape(rows, LANES), k1, v1, k2, v2,
            interpret=interpret, rows_per_block=rpb,
        )
        return out.reshape(-1), jnp.sum(counts)

    def compact(b):
        alive = b >= 0
        keys = jnp.where(alive, iota_cap, capacity + iota_cap)
        _, comp = jax.lax.sort_key_val(keys, b)
        # tombstones carry value -1, so the sorted tail is already -1
        return comp

    def cond(state):
        _, prev, m, _, first = state
        return first | ((m < prev) & (m > 1))

    def body(state):
        b, _, m, c, _ = state
        b2, m2 = one_pass(b)
        c2 = c + 1
        # compact only when another round will actually run with gaps
        # beyond the kernel's lookahead
        do_compact = (
            (c2 % _GAP_COMPACT_EVERY == 0) & (m2 < m) & (m2 > 1)
        )
        b3 = jax.lax.cond(do_compact, compact, lambda x: x, b2)
        return b3, m, m2, c2, jnp.asarray(False)

    b, _, m, _, _ = jax.lax.while_loop(
        cond, body, (buf, n + 1, n, jnp.int32(0), jnp.asarray(True))
    )
    return b, m


def _gap_tokens_to_wire(toks: jnp.ndarray, capacity: int):
    """Tombstoned int32 tokens -> one uint8 wire array: byteswapped-u16
    image (2*capacity bytes; LE image of the alive entries is the u16-BE
    stream) followed by the LSB-first alive-flag plane (capacity//8
    bytes). Host expansion: expand_gap_wire_host / native."""
    alive = toks >= 0
    be = (((toks & 0xFF) << 8) | ((toks >> 8) & 0xFF)).astype(jnp.uint16)
    data8 = jax.lax.bitcast_convert_type(be, jnp.uint8).reshape(-1)
    flag = alive.astype(jnp.int32).reshape(-1, 8)
    weights = jnp.left_shift(1, jnp.arange(8, dtype=jnp.int32))
    fbytes = jnp.sum(flag * weights, axis=1).astype(jnp.uint8)
    return jnp.concatenate([data8, fbytes])


@functools.partial(
    jax.jit, static_argnames=("capacity", "interpret", "rows_per_block")
)
def _multipass_gap_wire_call(
    buf: jnp.ndarray,
    n: jnp.ndarray,
    hash_params: jnp.ndarray,
    k1: jnp.ndarray,
    v1: jnp.ndarray,
    k2: jnp.ndarray,
    v2: jnp.ndarray,
    capacity: int,
    interpret: bool = False,
    rows_per_block: int = ROWS_PER_BLOCK,
):
    """Resident multipass + wire emission in ONE dispatch: returns
    (wire uint8[2*capacity + capacity//8], m). One combined D2H transfer
    (the tunnel lesson: every extra array costs a whole round trip)."""
    toks, m = _multipass_gap_resident_call(
        buf, n, hash_params, k1, v1, k2, v2,
        capacity=capacity, interpret=interpret, rows_per_block=rows_per_block,
    )
    return _gap_tokens_to_wire(toks, capacity), m


def expand_gap_wire_host(wire: np.ndarray, capacity: int) -> np.ndarray:
    """Host expansion of _multipass_gap_wire_call output: drops the
    tombstoned entries. Returns byteswapped u16 tokens (LE image ==
    u16-BE wire stream)."""
    data = wire[: 2 * capacity]
    flags = wire[2 * capacity :]
    mask = np.unpackbits(
        np.ascontiguousarray(flags), bitorder="little"
    )[:capacity].astype(bool)
    return data.view(np.uint16)[mask]


class PallasTokenEncoder:
    """Multipass encoder for general tables (hierarchical rules included).

    Each device pass applies one whole-sequence merge round at flat-kernel
    speed. ``encode_resident`` keeps the repeat-until-done loop on device
    (lax.while_loop + stable sort compaction, one transfer each way);
    ``encode`` compacts -1 tombstones on the host between passes. Both
    implement the reference's repeat-until-no-merges loop
    (tokenizer.rs:63-86) with per-chunk semantics (no cross-chunk state,
    matching the reference's chunked behavior for general tables).
    """

    def __init__(
        self,
        table: MergeTable,
        interpret: bool = False,
        capacity_tokens: int = 0,
        rows_per_block: int = ROWS_PER_BLOCK,
    ):
        built = table.build_cuckoo32()
        if built is None:
            raise ValueError("cuckoo32 placement failed for this table")
        k1, v1, k2, v2, a1, a2 = built
        slots = k1.shape[0]
        self.rows_per_block = rows_per_block
        self.block = rows_per_block * LANES
        self.k1 = jnp.asarray(k1.reshape(slots // LANES, LANES))
        self.v1 = jnp.asarray(v1.reshape(slots // LANES, LANES))
        self.k2 = jnp.asarray(k2.reshape(slots // LANES, LANES))
        self.v2 = jnp.asarray(v2.reshape(slots // LANES, LANES))
        self.a1 = a1
        self.a2 = a2
        self.shift = 32 - (slots.bit_length() - 1)
        self.interpret = interpret
        self.capacity = (
            -(-capacity_tokens // self.block) * self.block
            if capacity_tokens
            else 0
        )

    @staticmethod
    def supports(table: MergeTable) -> bool:
        return table.build_cuckoo32() is not None

    def encode_pass(self, tokens: np.ndarray) -> np.ndarray:
        """Run one merge pass; returns int32 tokens with -1 tombstones."""
        n = tokens.shape[0]
        capacity = (
            self.capacity
            if self.capacity
            else -(-max(n, 1) // self.block) * self.block
        )
        assert n <= capacity, f"batch {n} exceeds encoder capacity {capacity}"
        padded_rows = _padded_rows(capacity, self.block, self.rows_per_block)
        buf = np.zeros((padded_rows * LANES,), np.int32)
        buf[:n] = tokens
        params = jnp.asarray(
            np.array(
                [n, self.a1, self.a2, self.shift, 0, 0, 0, 0], dtype=np.int32
            )
        )
        out = _token_pass_call(
            params,
            jnp.asarray(buf.reshape(padded_rows, LANES)),
            self.k1,
            self.v1,
            self.k2,
            self.v2,
            interpret=self.interpret,
            rows_per_block=self.rows_per_block,
        )
        return np.asarray(out).reshape(-1)[:n]

    def encode(self, data: np.ndarray) -> np.ndarray:
        """Full multipass encode of one chunk -> int32 token array."""
        toks = data.astype(np.int32)
        while toks.shape[0] > 1:
            out = self.encode_pass(toks)
            kept = out[out != -1]
            if kept.shape[0] == toks.shape[0]:
                return kept
            toks = np.ascontiguousarray(kept)
        return toks

    def _capacity_for(self, n: int) -> int:
        return (
            self.capacity
            if self.capacity
            else -(-max(n, 1) // self.block) * self.block
        )

    def _resident_args(self, data: np.ndarray, gap: bool = True):
        n = data.shape[0]
        capacity = self._capacity_for(n)
        assert n <= capacity, f"batch {n} exceeds encoder capacity {capacity}"
        # gap loop contract: a capacity-sized buffer padded with -1
        # tombstones (no halo rows — boundary fills ride the prefetched
        # halos array); the sort loop keeps the halo-row layout with 0s
        if gap:
            buf = np.full((capacity,), -1, np.int32)
        else:
            padded_rows = _padded_rows(
                capacity, self.block, self.rows_per_block
            )
            buf = np.zeros((padded_rows * LANES,), np.int32)
        buf[:n] = data
        return (
            jnp.asarray(buf),
            jnp.int32(n),
            jnp.asarray([self.a1, self.a2, self.shift], jnp.int32),
            capacity,
        )

    def encode_resident_dispatch(self, data: np.ndarray):
        """Dispatch the device-resident multipass; returns device handles.

        Returns (tokens_dev int32[capacity], count_dev int32 scalar) so a
        pipeline can overlap the D2H of one chunk with the next chunk's
        passes. With the default gap-tolerant loop (BLT_MP_COMPACT=gap)
        the token array may contain -1 tombstones between the m valid
        entries; ``BLT_MP_COMPACT=sort`` restores the per-pass sort loop
        whose output is a compacted prefix. Use ``encode_resident`` /
        ``encode_resident_wire_dispatch`` for drained forms.
        """
        sort_mode = _mp_compact_mode() == "sort"
        buf_d, n_d, hp, capacity = self._resident_args(data, gap=not sort_mode)
        call = (
            _multipass_resident_call
            if sort_mode
            else _multipass_gap_resident_call
        )
        return call(
            buf_d, n_d, hp, self.k1, self.v1, self.k2, self.v2,
            capacity=capacity,
            interpret=self.interpret,
            rows_per_block=self.rows_per_block,
        )

    def encode_resident_wire_dispatch(self, data: np.ndarray):
        """Resident multipass + wire emission in one dispatch.

        Returns (wire_dev uint8[2*capacity + capacity//8], m_dev,
        capacity); expand host-side with expand_gap_wire_host (the
        packed alive-flag plane replaces any device compaction — the
        sort costs 7x the sweep, tools/exp_mp_ablate.py).
        """
        buf_d, n_d, hp, capacity = self._resident_args(data)
        wire, m = _multipass_gap_wire_call(
            buf_d, n_d, hp, self.k1, self.v1, self.k2, self.v2,
            capacity=capacity,
            interpret=self.interpret,
            rows_per_block=self.rows_per_block,
        )
        return wire, m, capacity

    def encode_resident(self, data: np.ndarray) -> np.ndarray:
        """Full multipass encode, repeat-until-done loop on device."""
        if data.shape[0] <= 1:
            return data.astype(np.int32)
        toks_d, m_d = self.encode_resident_dispatch(data)
        toks = np.asarray(toks_d)
        if _mp_compact_mode() == "sort":
            return toks[: int(m_d)]
        out = toks[toks >= 0]
        assert out.shape[0] == int(m_d), (out.shape[0], int(m_d))
        return out


def _shard_mapped(mesh, per_shard, in_specs, out_specs):
    """shard_map + jit with the jax-version compat shims in one place."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    kwargs = dict(mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    try:
        mapped = shard_map(per_shard, check_vma=False, **kwargs)
    except TypeError:  # older jax spells it check_rep
        mapped = shard_map(per_shard, check_rep=False, **kwargs)
    return jax.jit(mapped)


class ShardedTokenEncoder:
    """Row-parallel multipass for general tables over a device mesh.

    Each device runs one chunk's token-pass kernel per round via
    ``shard_map`` (the kernel is opaque to the partitioner, so explicit
    per-device mapping is the idiomatic spelling); the host compacts -1
    tombstones per row between rounds and stops when no row changed.
    Chunks are independent in this mode (reference per-chunk semantics,
    SURVEY.md 2.1.6), so no cross-device stitching exists by construction
    — multi-chip speedup is a pure B-way scale-out of the single-device
    PallasTokenEncoder.
    """

    def __init__(
        self,
        table: MergeTable,
        mesh,
        interpret: bool = False,
        capacity_tokens: int = 0,
        rows_per_block: int = ROWS_PER_BLOCK,
    ):
        self._single = PallasTokenEncoder(
            table,
            interpret=interpret,
            capacity_tokens=capacity_tokens,
            rows_per_block=rows_per_block,
        )
        self.mesh = mesh
        self.n_rows = int(mesh.devices.size)
        self.capacity = self._single.capacity
        assert self.capacity, "ShardedTokenEncoder requires a fixed capacity"
        self._call = None
        self._resident_call = None

    @staticmethod
    def supports(table: MergeTable) -> bool:
        return PallasTokenEncoder.supports(table)

    def _shard_mapped(self, per_shard, in_specs, out_specs):
        return _shard_mapped(self.mesh, per_shard, in_specs, out_specs)

    def _build_call(self):
        from jax.sharding import PartitionSpec as P

        from blt_tpu.parallel.mesh import DATA_AXIS

        enc = self._single
        rpb = enc.rows_per_block
        interpret = enc.interpret

        def per_shard(params, data3, k1, v1, k2, v2):
            # local shapes: params (1, 8), data3 (1, rows3, 128)
            return _token_pass_call(
                params[0],
                data3[0],
                k1,
                v1,
                k2,
                v2,
                interpret=interpret,
                rows_per_block=rpb,
            )[None]

        row = P(DATA_AXIS, None)
        row3 = P(DATA_AXIS, None, None)
        rep = P()
        return self._shard_mapped(
            per_shard, (row, row3, rep, rep, rep, rep), row3
        )

    def encode_pass_batch(self, rows: list) -> list:
        """One merge round over up to n_rows token arrays (int32), each on
        its own device; returns per-row arrays with -1 tombstones."""
        enc = self._single
        b = self.n_rows
        padded_rows = _padded_rows(self.capacity, enc.block, enc.rows_per_block)
        batch = np.zeros((b, padded_rows * LANES), np.int32)
        params = np.zeros((b, 8), np.int32)
        for r, toks in enumerate(rows):
            assert toks.shape[0] <= self.capacity
            batch[r, : toks.shape[0]] = toks
            params[r] = [
                toks.shape[0], enc.a1, enc.a2, enc.shift, 0, 0, 0, 0,
            ]
        if self._call is None:
            self._call = self._build_call()
        out = self._call(
            jnp.asarray(params),
            jnp.asarray(batch.reshape(b, padded_rows, LANES)),
            enc.k1,
            enc.v1,
            enc.k2,
            enc.v2,
        )
        host = np.asarray(out).reshape(b, -1)
        return [host[r, : rows[r].shape[0]] for r in range(len(rows))]

    def encode_batch(self, chunks: list) -> list:
        """Full multipass encode of up to n_rows chunks -> token arrays."""
        toks = [c.astype(np.int32) for c in chunks]
        active = [t.shape[0] > 1 for t in toks]
        while any(active):
            outs = self.encode_pass_batch(toks)
            for r, out in enumerate(outs):
                if not active[r]:
                    continue
                kept = out[out != -1]
                if kept.shape[0] == toks[r].shape[0] or kept.shape[0] <= 1:
                    active[r] = False
                toks[r] = np.ascontiguousarray(kept)
        return toks

    def _build_resident_call(self):
        from jax.sharding import PartitionSpec as P

        from blt_tpu.parallel.mesh import DATA_AXIS

        enc = self._single
        rpb = enc.rows_per_block
        interpret = enc.interpret
        capacity = self.capacity

        sort_mode = _mp_compact_mode() == "sort"

        def per_shard(ns, bufs, hp, k1, v1, k2, v2):
            # local shapes: ns (1,), bufs (1, total); each device runs its
            # own repeat-until-done loop (no collectives inside, so
            # divergent trip counts across devices are fine). Tokens leave
            # the device as the gap wire: byteswapped u16 image + packed
            # alive-flag plane (tombstones dropped host-side; the device
            # sort costs 7x the sweep, tools/exp_mp_ablate.py).
            # BLT_MP_COMPACT=sort is honored here too (the escape hatch
            # must also bypass the gap kernel on multi-chip runs): the
            # sort loop's compacted prefix converts to the same wire by
            # tombstoning everything beyond its count.
            if sort_mode:
                iota = jnp.arange(capacity, dtype=jnp.int32)
                toks, m = _multipass_resident_call(
                    bufs[0], ns[0], hp, k1, v1, k2, v2,
                    capacity=capacity, interpret=interpret,
                    rows_per_block=rpb,
                )
                toks = jnp.where(iota < m, toks, -1)
                wire = _gap_tokens_to_wire(toks, capacity)
            else:
                wire, m = _multipass_gap_wire_call(
                    bufs[0], ns[0], hp, k1, v1, k2, v2,
                    capacity=capacity, interpret=interpret,
                    rows_per_block=rpb,
                )
            return wire[None], m[None]

        row = P(DATA_AXIS)
        row2 = P(DATA_AXIS, None)
        rep = P()
        return self._shard_mapped(
            per_shard, (row, row2, rep, rep, rep, rep, rep), (row2, row)
        )

    def encode_batch_resident_wire(self, chunks: list) -> list:
        """Full multipass of up to n_rows chunks, one device-resident
        repeat-until-done loop per device (no per-round host compaction:
        one H2D + one D2H for the whole batch). Returns byteswapped-u16
        rows whose LE memory image is the u16-BE wire stream."""
        enc = self._single
        b = self.n_rows
        assert len(chunks) <= b, (len(chunks), b)
        # buffer layout follows the compaction mode (read once at the
        # first call; flipping BLT_MP_COMPACT mid-process would not
        # rebuild the cached shard_map program): gap-loop contract is
        # -1 padding, capacity-sized rows; the sort loop keeps the
        # halo-row layout with zeros (PallasTokenEncoder._resident_args)
        if _mp_compact_mode() == "sort":
            padded_rows = _padded_rows(
                self.capacity, enc.block, enc.rows_per_block
            )
            batch = np.zeros((b, padded_rows * LANES), np.int32)
        else:
            batch = np.full((b, self.capacity), -1, np.int32)
        ns = np.zeros((b,), np.int32)
        for r, c in enumerate(chunks):
            assert c.shape[0] <= self.capacity
            batch[r, : c.shape[0]] = c
            ns[r] = c.shape[0]
        if self._resident_call is None:
            self._resident_call = self._build_resident_call()
        from blt_tpu.parallel.mesh import row_sharding, vec_sharding

        hp = jnp.asarray([enc.a1, enc.a2, enc.shift], jnp.int32)
        # direct per-device H2D: a plain asarray would land the whole
        # batch on device 0 and reshard over ICI
        wire_d, m_d = self._resident_call(
            jax.device_put(ns, vec_sharding(self.mesh)),
            jax.device_put(batch, row_sharding(self.mesh)),
            hp, enc.k1, enc.v1, enc.k2, enc.v2,
        )
        wire_h = np.asarray(wire_d)
        m_h = np.asarray(m_d)
        # the loop runs once even for 0/1-token rows, where the pass is an
        # identity (a lone token finds no next-alive), so m_h[r] == ns[r]
        # there; expand_gap_wire_host's fancy indexing yields fresh
        # arrays, so nothing pins the (b, wire) host buffer
        out = []
        for r in range(len(chunks)):
            toks = expand_gap_wire_host(wire_h[r], self.capacity)
            assert toks.shape[0] == int(m_h[r]), (toks.shape[0], int(m_h[r]))
            out.append(toks)
        return out

    def encode_batch_resident(self, chunks: list) -> list:
        """Full multipass of up to n_rows chunks -> int32 token arrays
        (the wire variant is what the engine drains; this unswaps it)."""
        return [
            (be.astype(np.int32) >> 8) | ((be.astype(np.int32) & 0xFF) << 8)
            for be in self.encode_batch_resident_wire(chunks)
        ]


class ShardedFlatEncoder:
    """Halo-convergence data parallelism for the flat kernel over a mesh.

    Each device runs the UNMODIFIED flat kernel (one grid, SMEM carries)
    on one contiguous slab of the stream, prefixed with a HALO copy of
    the previous slab's tail. The parity recurrence
    ``merge_start[i] = match[i] & ~merge_start[i-1]`` forgets its initial
    condition at the first non-matching pair: if any pair position inside
    the halo is a non-match, every slot from the slab's payload start on
    is bit-identical to the sequential result (``lz = max(lnm, sentinel)``
    is dominated by ``lnm`` past that point, see _kernel_body). Shards are
    therefore embarrassingly parallel — no collectives, no carry
    threading, no kernel changes; the host splices payload slot ranges
    and each slab's drain ``prev`` is its own halo's last slot, so even
    the drop-after-merge filter is stateless per slab.

    The caller must check the convergence precondition per slab boundary
    (``halo_converges``: >= 1 non-matching pair among the halo's pairs, a
    vectorized host lookup over HALO bytes) and route degenerate batches
    — a >=HALO-byte unbroken run of matching pairs at a slab boundary —
    to the exact XLA carry-composition path
    (parallel.sharded.sharded_flat_encode), which the engine does per
    batch. Reference semantics (tokenizer.rs:61-86) are preserved exactly
    either way; the Pallas route runs each chip at the single-device
    kernel rate instead of the XLA cummax rate.
    """

    HALO = 1024  # bytes of left context per slab

    def __init__(
        self,
        table: MergeTable,
        mesh,
        interpret: bool = False,
        capacity_bytes: int = 0,
        rows_per_block: int | None = None,
    ):
        self._single = PallasFlatEncoder(
            table,
            interpret=interpret,
            capacity_bytes=capacity_bytes,
            rows_per_block=rows_per_block,
        )
        assert self._single.capacity, (
            "ShardedFlatEncoder requires a fixed per-device capacity"
        )
        self.mesh = mesh
        self.n_rows = int(mesh.devices.size)
        # per-device slab = HALO bytes of context + payload bytes of new data
        self.capacity = self._single.capacity
        self.payload = self.capacity - self.HALO
        # payload >= HALO guarantees every internal slab halo is FULL
        # (halo_converges' len<2 stream-start case is then unreachable
        # mid-stream) and bounds halo compute overhead at <= 50%
        assert self.payload >= self.HALO, (self.capacity, self.HALO)
        self.table = table
        self._call = None

    @staticmethod
    def supports(table: MergeTable) -> bool:
        return PallasFlatEncoder.supports(table)

    @staticmethod
    def halo_converges(dense: np.ndarray, halo_plus_one: np.ndarray) -> bool:
        """True iff the parity recurrence converges within this halo.

        ``halo_plus_one``: the slab's halo bytes plus its first payload
        byte (so every halo pair is complete). An empty halo converges
        only at the true stream start (carry is genuinely 0 there) — the
        caller passes halos it actually has.
        """
        if halo_plus_one.shape[0] < 2:
            return True  # stream start: no halo, carry 0 is exact
        a = halo_plus_one[:-1].astype(np.int32)
        b = halo_plus_one[1:].astype(np.int32)
        from blt_tpu.merges import NO_RULE

        return bool((dense[a * 256 + b] == NO_RULE).any())

    def _build_call(self):
        from jax.sharding import PartitionSpec as P

        from blt_tpu.parallel.mesh import DATA_AXIS

        enc = self._single
        interpret = enc.interpret
        rpb = enc.rows_per_block
        mode = enc.mode

        def per_shard(params, carry, data3, segs, e1, e2):
            # local shapes: params (1,8), carry (1,1,1), data3 (1,rows3,128)
            out, c = _flat_encode_pallas_call(
                params[0],
                segs,
                carry[0],
                data3[0],
                e1,
                e2,
                interpret=interpret,
                mode=mode,
                rows_per_block=rpb,
            )
            return out[None], c[None]

        row = P(DATA_AXIS, None)
        row3 = P(DATA_AXIS, None, None)
        rep = P()
        return _shard_mapped(
            self.mesh, per_shard, (row, row3, row3, rep, rep, rep), (row3, row3)
        )

    @property
    def padded_bytes(self) -> int:
        return self._single.padded_bytes

    def encode_batch(
        self,
        batch: np.ndarray,  # uint8[n_rows, padded_bytes]: halo+payload slabs
        lengths: np.ndarray,  # int32[n_rows]: valid bytes incl. halo
        next_bytes: np.ndarray,  # int32[n_rows]: byte after each slab / -1
    ):
        """Run all slabs in parallel.

        Returns (slots uint16[n_rows, rows, 128], carry_out int32[n_rows,
        1,1]). Every slab runs with carry_in = 0 — exact under the
        convergence precondition the caller verified (or an empty halo at
        stream start). Slots for slab r: flatten row r, positions
        [halo_r, halo_r + payload_r) are the payload's token slots and
        position halo_r - 1 is the drain ``prev`` for stateless
        filtering. The last nonempty slab's carry_out is the true
        sequential carry at batch end (it converged), which the engine
        materializes only when a later batch needs the XLA fallback.
        """
        import jax as _jax

        from blt_tpu.parallel.mesh import row_sharding

        enc = self._single
        b = self.n_rows
        assert batch.shape == (b, self.padded_bytes), batch.shape
        # one SMEM params row per slab, via the single source of the
        # layout (PallasFlatEncoder.params)
        params = np.stack(
            [
                np.asarray(enc.params(int(lengths[r]), int(next_bytes[r])))
                for r in range(b)
            ]
        ).astype(np.int32)
        carries = np.zeros((b, 1, 1), np.int32)
        if self._call is None:
            self._call = self._build_call()
        rows3 = self.padded_bytes // LANES
        row_sh = row_sharding(self.mesh)
        out, carry = self._call(
            _jax.device_put(params, row_sh),
            _jax.device_put(carries, row_sh),
            _jax.device_put(batch.reshape(b, rows3, LANES), row_sh),
            enc.segs,
            enc.e1,
            enc.e2,
        )
        return out, carry


def _basic_chained_kernel(tok_ref, data_ref, out_ref, done_ref):
    out_ref[:] = (data_ref[:].astype(jnp.int32) << 8).astype(jnp.uint16)
    done_ref[0, 0] = pl.program_id(0) + tok_ref[0, 0]


@functools.partial(jax.jit, static_argnames=("k", "interpret", "rows_per_block"))
def basic_encode_chained(
    data2: jnp.ndarray,
    tok: jnp.ndarray,  # int32[1,1]
    k: int = 8,
    interpret: bool = False,
    rows_per_block: int = ROWS_PER_BLOCK,
):
    """k back-to-back widen kernels chained through a completion token.

    The token is an input of each kernel and derived from the previous
    one's output, so XLA cannot hoist or dedup the calls; see
    flat_encode_chained for why. Returns (last_out, last_token).
    """
    rows = data2.shape[0]
    rpb = rows_per_block

    def call(t):
        return pl.pallas_call(
            _basic_chained_kernel,
            grid=(rows // rpb,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (rpb, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=(
                pl.BlockSpec(
                    (rpb, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((rows, LANES), jnp.uint16),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ),
            interpret=interpret,
        )(t, data2)

    def body(t, _):
        out, t2 = call(t)
        return t2, ()

    tok, _ = jax.lax.scan(body, tok, None, length=k - 1)
    return call(tok)


def _basic_kernel(data_ref, out_ref, done_ref):
    # byte b -> u16 value b<<8, whose LE memory image is the BE pair [0, b].
    # Shift in int32 (Mosaic cannot legalize 16-bit shifts), then narrow.
    out_ref[:] = (data_ref[:].astype(jnp.int32) << 8).astype(jnp.uint16)
    # tiny completion token: reading it host-side is a plain D2H transfer
    # that forces device completion without compiling a slice op
    done_ref[0, 0] = pl.program_id(0)


@functools.partial(jax.jit, static_argnames=("interpret", "rows_per_block"))
def basic_encode_pallas(
    data2: jnp.ndarray,
    interpret: bool = False,
    rows_per_block: int = ROWS_PER_BLOCK,
) -> jnp.ndarray:
    """uint8[R,128] -> uint16[R,128] widen (basic mode) as a Pallas kernel.

    Functionally identical to bpe_jax.basic_encode; exists because XLA-jit
    compiles are not reliably persisted through remote-compile TPU setups,
    while Pallas kernels are — keeping repeated CLI/bench runs fast.
    """
    rows = data2.shape[0]
    rpb = rows_per_block
    return pl.pallas_call(
        _basic_kernel,
        grid=(rows // rpb,),
        in_specs=[
            pl.BlockSpec((rpb, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((rpb, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.uint16),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        interpret=interpret,
    )(data2)


class PallasBasicEncoder:
    """Fixed-capacity basic-mode encoder (pad + run + trim protocol)."""

    def __init__(
        self,
        capacity_bytes: int,
        interpret: bool = False,
        rows_per_block: int = ROWS_PER_BLOCK,
    ):
        if rows_per_block % 8 != 0:
            raise ValueError("rows_per_block must be a multiple of 8")
        self.rows_per_block = rows_per_block
        block = rows_per_block * LANES
        self.capacity = -(-capacity_bytes // block) * block
        self.interpret = interpret

    @property
    def padded_bytes(self) -> int:
        return self.capacity

    def upload(self, data: np.ndarray, buf: np.ndarray, threads: int = 0):
        """Pack + upload into a reusable host buffer (see PallasFlatEncoder)."""
        from blt_tpu.pipeline.feeder import pack_into, upload_owned

        n = data.shape[0]
        assert n <= self.capacity and buf.shape[0] == self.capacity
        pack_into(buf, data, threads)
        return upload_owned(buf.reshape(self.capacity // LANES, LANES)), n

    def encode_device(self, data2: jnp.ndarray, n: int):
        out, done = basic_encode_pallas(
            data2,
            interpret=self.interpret,
            rows_per_block=self.rows_per_block,
        )
        return out, n

    def encode(self, data: np.ndarray) -> Tuple[jnp.ndarray, int]:
        n = data.shape[0]
        assert n <= self.capacity
        rows = self.capacity // LANES
        buf = np.zeros((rows * LANES,), np.uint8)
        buf[:n] = data
        return self.encode_device(jnp.asarray(buf.reshape(rows, LANES)), n)
