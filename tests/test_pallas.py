"""Pallas flat-BPE kernel tests (interpreter mode on CPU).

The kernel's real-TPU compilation is exercised by bench.py and was
validated bit-exact on hardware; this suite pins the kernel's semantics
(including the cuckoo-hash build, fixed-capacity padding, and cross-batch
carry protocol) against the NumPy engine via the Pallas interpreter.
"""

import random

import numpy as np
import pytest

from blt_tpu.merges import MergeTable
from blt_tpu.ops.bpe_numpy import bpe_encode_flat
from blt_tpu.ops.bpe_pallas import (
    BLOCK,
    PallasFlatEncoder,
    filter_slots,
)


def run_encoder(enc, data, pieces=None):
    """Encode (optionally in chained pieces), drain, return token-id list."""
    if pieces is None:
        pieces = [data]
    wire = bytearray()
    carry = False
    prev = 0
    for j, piece in enumerate(pieces):
        if piece.shape[0] == 0:
            continue
        nb = int(pieces[j + 1][0]) if j + 1 < len(pieces) else -1
        slots, nv, c = enc.encode(piece, carry, nb)
        carry = c  # (1,1) device array threads to the next batch verbatim
        toks, prev = filter_slots(np.asarray(slots).reshape(-1)[:nv], prev)
        wire.extend(toks.tobytes())  # byteswapped u16 == BE wire stream
    return np.frombuffer(bytes(wire), ">u2").astype(np.int64).tolist()


def test_cuckoo_build_and_support():
    t = MergeTable.build({(97, 98): 256, (99, 100): 257})
    assert PallasFlatEncoder.supports(t)
    built = t.build_cuckoo()
    assert built is not None
    e1, e2, a1, a2, ffff = built
    assert not ffff
    # every rule is findable in exactly one of the tables
    found = 0
    for (a, b), v in t.merges.items():
        key = a * 256 + b
        packed = (key << 16) | v
        found += int(packed in e1.tolist()) + int(packed in e2.tolist())
    assert found == len(t.merges)


def test_unsupported_tables():
    # hierarchical keys
    assert not PallasFlatEncoder.supports(
        MergeTable.build({(97, 98): 256, (256, 99): 257})
    )
    # value below 256 breaks the drop-after-merge drain rule
    assert not PallasFlatEncoder.supports(MergeTable.build({(120, 121): 90}))


def test_kernel_exact_small():
    t = MergeTable.build({(97, 98): 256, (98, 99): 257, (99, 97): 258})
    enc = PallasFlatEncoder(t, interpret=True)
    rng = np.random.default_rng(0)
    data = rng.choice(np.frombuffer(b"abcabcaabbcc", np.uint8), size=5000).astype(
        np.uint8
    )
    assert run_encoder(enc, data) == bpe_encode_flat(data, t).tolist()


def test_kernel_exact_multi_block_adversarial():
    # all-'a' run: parity chain crosses every 64K block boundary
    t = MergeTable.build({(97, 97): 256})
    enc = PallasFlatEncoder(t, interpret=True)
    data = np.full(BLOCK + 12345, 97, np.uint8)
    got = run_encoder(enc, data)
    exp = bpe_encode_flat(data, t).tolist()
    assert got == exp
    assert got[:3] == [256, 256, 256]


def test_fixed_capacity_chained_batches():
    rng = random.Random(3)
    nprng = np.random.default_rng(3)
    t = MergeTable.build({(97, 97): 256, (97, 98): 257, (98, 99): 258})
    enc = PallasFlatEncoder(t, interpret=True, capacity_bytes=BLOCK)
    for _ in range(3):
        n = rng.randint(10, 2 * BLOCK)
        data = nprng.integers(97, 100, n).astype(np.uint8)
        data[: min(n, 1000)] = 97
        pieces = []
        pos = 0
        while pos < n:
            k = rng.randint(1, min(BLOCK, n - pos))
            pieces.append(data[pos : pos + k])
            pos += k
        got = run_encoder(enc, data, pieces)
        assert got == bpe_encode_flat(data, t).tolist()


def test_ffff_pair_without_rule_not_merged():
    """Bytes FF FF with NO (255,255) rule: an empty cuckoo slot's key half
    is 0xFFFF, so the hit check must also require slot occupancy — the
    key compare alone silently merged FF FF to token 0xFFFF (regression)."""
    for merges in ({(97, 98): 300}, {(97, 98): 300, (255, 255): 301},
                   {(255, 254): 400}):
        t = MergeTable.build(merges)
        enc = PallasFlatEncoder(t, interpret=True)
        data = np.frombuffer(b"ab\xff\xffab\xff", np.uint8)
        got = run_encoder(enc, np.array(data))
        assert got == bpe_encode_flat(np.array(data), t).tolist(), merges


def test_full_byte_range_random_corpus():
    """Random bytes over the FULL 0-255 range (the text-biased corpora
    elsewhere never produce FF FF) against the NumPy engine."""
    rng = np.random.default_rng(0xFF)
    data = rng.integers(0, 256, 50_000, np.uint8)
    pairs = set()
    while len(pairs) < 300:
        pairs.add((int(rng.integers(0, 256)), int(rng.integers(0, 256))))
    t = MergeTable.build({p: 256 + i for i, p in enumerate(sorted(pairs))})
    enc = PallasFlatEncoder(t, interpret=True)
    assert run_encoder(enc, data) == bpe_encode_flat(data, t).tolist()


def test_ffff_rule_special_case():
    # rule (255,255)->65535 packs to the empty-slot sentinel; the kernel
    # special-cases it via the has_ffff flag
    t = MergeTable.build({(255, 255): 0xFFFF, (97, 98): 256})
    enc = PallasFlatEncoder(t, interpret=True)
    data = np.frombuffer(b"ab\xff\xff\xffab", np.uint8)
    got = run_encoder(enc, np.array(data))
    assert got == bpe_encode_flat(np.array(data), t).tolist()
    assert 0xFFFF in got


def test_direct_mode_50k_rules():
    """Large tables (BASELINE config-3 scale) use the packed-dense path."""
    rng = np.random.default_rng(0)
    merges = {}
    vocab = 256
    while len(merges) < 20000:
        key = (int(rng.integers(0, 256)), int(rng.integers(0, 256)))
        if key not in merges:
            merges[key] = vocab
            vocab += 1
    t = MergeTable.build(merges)
    enc = PallasFlatEncoder(t, interpret=True)
    assert enc.direct
    data = rng.integers(0, 256, 40000).astype(np.uint8)
    got = run_encoder(enc, data)
    assert got == bpe_encode_flat(data, t).tolist()


def test_u16_range_validation():
    with pytest.raises(ValueError, match="u16 token range"):
        MergeTable.build({(97, 98): 70000})


def test_chained_dispatch_matches_single():
    """flat_encode_chained(k) must equal k independent carry-threaded calls."""
    import jax.numpy as jnp

    from blt_tpu.ops.bpe_pallas import LANES, flat_encode_chained

    t = MergeTable.build({(97, 97): 256, (97, 98): 257})
    enc = PallasFlatEncoder(t, interpret=True, capacity_bytes=BLOCK)
    rng = np.random.default_rng(7)
    data = rng.choice(np.frombuffer(b"aabab", np.uint8), size=BLOCK).astype(np.uint8)
    # reference: one plain encode of the same buffer
    slots1, nv, c1 = enc.encode(data, False, -1)
    padded_rows = BLOCK // LANES + 8
    buf = np.zeros((padded_rows * LANES,), np.uint8)
    buf[:BLOCK] = data
    params = enc.params(BLOCK)
    zc = jnp.asarray(np.zeros((1, 1), np.int32))
    slots2, c2 = flat_encode_chained(
        params, enc.segs, zc, buf.reshape(padded_rows, LANES), enc.e1, enc.e2,
        k=3, interpret=True, mode=enc.mode,
        rows_per_block=enc.rows_per_block,
    )
    # identical input per iteration and zero boundary carry between full
    # buffers of this data (ends mid-run is fine: chained carry feeds the
    # next iteration's start, which equals re-running the same buffer)
    assert np.array_equal(np.asarray(slots1), np.asarray(slots2))


def test_basic_chained_matches_widen():
    import jax.numpy as jnp

    from blt_tpu.ops.bpe_pallas import LANES, basic_encode_chained

    rng = np.random.default_rng(9)
    rows = BLOCK // LANES
    data2 = rng.integers(0, 256, (rows, LANES)).astype(np.uint8)
    tok = jnp.asarray(np.zeros((1, 1), np.int32))
    out, tok2 = basic_encode_chained(data2, tok, k=3, interpret=True)
    assert np.array_equal(
        np.asarray(out), data2.astype(np.uint16) << 8
    )


def test_token_encoder_hierarchical_exact():
    """Multipass token kernel == NumPy multipass on hierarchical rules
    (the tokenizer.rs:204-212 iterative-merging semantics)."""
    from blt_tpu.ops.bpe_numpy import bpe_encode_multipass
    from blt_tpu.ops.bpe_pallas import PallasTokenEncoder

    t = MergeTable.build({(97, 98): 256, (256, 99): 257, (257, 257): 300})
    assert not t.flat
    assert PallasTokenEncoder.supports(t)
    enc = PallasTokenEncoder(t, interpret=True)
    rng = np.random.default_rng(11)
    data = rng.choice(np.frombuffer(b"abcabcabcx", np.uint8), size=4000).astype(
        np.uint8
    )
    got = enc.encode(data).tolist()
    exp = bpe_encode_multipass(data, t).tolist()
    assert got == exp
    assert 257 in got or 300 in got  # hierarchical merges actually fired


def test_token_encoder_value_collision_and_zero():
    """Merged values may collide with byte values (tokenizer.rs:283-291),
    including value 0, and can re-merge on later passes."""
    from blt_tpu.ops.bpe_numpy import bpe_encode_multipass
    from blt_tpu.ops.bpe_pallas import PallasTokenEncoder

    t = MergeTable.build({(120, 121): 90, (90, 122): 0, (0, 97): 400})
    enc = PallasTokenEncoder(t, interpret=True)
    data = np.frombuffer(b"axyzaxyza", np.uint8)
    got = enc.encode(np.array(data)).tolist()
    exp = bpe_encode_multipass(np.array(data), t).tolist()
    assert got == exp


def test_token_encoder_multiblock_adversarial():
    """Parity carry across grid blocks inside one pass (all-'a' run)."""
    from blt_tpu.ops.bpe_numpy import bpe_encode_multipass
    from blt_tpu.ops.bpe_pallas import PallasTokenEncoder

    t = MergeTable.build({(97, 97): 256, (256, 256): 257})
    enc = PallasTokenEncoder(t, interpret=True)
    data = np.full(BLOCK + 777, 97, np.uint8)
    got = enc.encode(data)
    exp = bpe_encode_multipass(data, t)
    assert got.tolist() == exp.tolist()


def test_token_encoder_randomized_vs_oracle():
    from blt_tpu.ops.bpe_numpy import bpe_encode_multipass
    from blt_tpu.ops.bpe_pallas import PallasTokenEncoder

    rng = np.random.default_rng(13)
    merges = {
        (97, 98): 256,
        (98, 97): 257,
        (256, 257): 258,
        (258, 99): 259,
        (259, 259): 260,
    }
    t = MergeTable.build(merges)
    enc = PallasTokenEncoder(t, interpret=True)
    for n in (0, 1, 2, 5, 1000, 5000):
        data = rng.choice(np.frombuffer(b"abbac", np.uint8), size=n).astype(
            np.uint8
        )
        got = enc.encode(data).tolist()
        exp = bpe_encode_multipass(data, t).tolist()
        assert got == exp, n


def test_upload_encode_device_stale_tail_exact():
    """upload() leaves tail bytes stale in the reused buffer; the kernel
    masks by length, so a shorter second batch after a longer first one
    (same buffer) must still be exact."""
    t = MergeTable.build({(97, 98): 256, (98, 99): 257, (32, 97): 258})
    enc = PallasFlatEncoder(t, interpret=True, capacity_bytes=BLOCK)
    buf = np.empty(enc.padded_bytes, np.uint8)
    rng = np.random.default_rng(11)
    long = rng.choice(np.frombuffer(b"abc ab", np.uint8), size=BLOCK)
    short = rng.choice(np.frombuffer(b"abc ab", np.uint8), size=BLOCK // 3)

    def run(piece, carry, nb, prev):
        dev, n = enc.upload(piece, buf)
        slots, _, c = enc.encode_device(dev, n, carry, nb)
        toks, prev = filter_slots(np.asarray(slots).reshape(-1)[:n], prev)
        return toks, c, prev

    toks1, carry, prev = run(long, False, int(short[0]), 0)
    toks2, _, _ = run(short, carry, -1, prev)
    got = np.frombuffer(toks1.tobytes() + toks2.tobytes(), ">u2").astype(np.int64)
    expected = bpe_encode_flat(np.concatenate([long, short]), t)
    assert got.tolist() == expected.tolist()


def test_pipelined_engine_stream_interpret_exact():
    """Full 3-stage pipelined _bpe_pallas_stream (feed/drain threads,
    buffer reuse) against the NumPy oracle, multi-batch with carries."""
    import jax

    from blt_tpu.pipeline.engines import JaxEngine

    t = MergeTable.build({(97, 98): 256, (98, 99): 257, (99, 97): 258})
    rng = np.random.default_rng(5)
    data = rng.choice(np.frombuffer(b"abcabcaabbcc", np.uint8), size=4 * BLOCK + 77)
    hint = BLOCK
    chunks = [data[i : i + hint] for i in range(0, data.shape[0], hint)]

    enc = PallasFlatEncoder(t, interpret=True, capacity_bytes=hint)
    engine = JaxEngine()
    out = b"".join(engine._bpe_pallas_stream(iter(chunks), enc, hint))
    expected = bpe_encode_flat(data, t)
    got = np.frombuffer(out, ">u2").astype(np.int64)
    assert got.tolist() == expected.tolist()


def test_encode_resident_matches_host_compaction():
    """Device-resident multipass (lax.while_loop + on-device stable-sort
    compaction) must equal the host-compaction encoder and the oracle,
    including value collisions and multi-block parity carries."""
    from blt_tpu.ops.bpe_numpy import bpe_encode_multipass
    from blt_tpu.ops.bpe_pallas import PallasTokenEncoder

    rng = np.random.default_rng(17)
    merges = {
        (97, 98): 256, (256, 99): 257, (257, 257): 258,
        (120, 121): 90, (90, 122): 0, (0, 97): 400,
    }
    t = MergeTable.build(merges)
    enc = PallasTokenEncoder(t, interpret=True)
    for n in (0, 1, 2, 777, 4096, BLOCK + 33):
        data = rng.choice(
            np.frombuffer(b"abcabcxyzaxyz", np.uint8), size=n
        ).astype(np.uint8)
        got = enc.encode_resident(data).tolist()
        exp = bpe_encode_multipass(data, t).tolist()
        assert got == exp, n


def test_encode_resident_fixed_capacity_and_all_merges():
    """Fixed-capacity encoder: short batches pad up; an all-'a' corpus
    collapses through chained rules (pass count > 2)."""
    from blt_tpu.ops.bpe_numpy import bpe_encode_multipass
    from blt_tpu.ops.bpe_pallas import PallasTokenEncoder

    t = MergeTable.build({(97, 97): 256, (256, 256): 257, (257, 257): 258})
    enc = PallasTokenEncoder(t, interpret=True, capacity_tokens=8192)
    data = np.full(5000, 97, np.uint8)
    got = enc.encode_resident(data)
    exp = bpe_encode_multipass(data, t)
    assert got.tolist() == exp.tolist()


def test_jax_engine_multipass_routes_resident(monkeypatch):
    """The single-device engine's Pallas multipass route must go through
    the device-resident dispatch (one transfer each way per chunk)."""
    from blt_tpu.merges import MergeTable as MT
    from blt_tpu.ops.bpe_numpy import bpe_encode_multipass
    from blt_tpu.ops import bpe_pallas
    from blt_tpu.pipeline.engines import JaxEngine

    engine = JaxEngine()

    class FakeJax:
        def __getattr__(self, name):
            import jax

            return getattr(jax, name)

        def default_backend(self):
            return "tpu"

    engine._jax = FakeJax()
    calls = {"n": 0}
    orig = bpe_pallas.PallasTokenEncoder.encode_resident_wire_dispatch

    def counting(self, data):
        calls["n"] += 1
        # interpret mode: the compiled kernel cannot lower on CPU
        self.interpret = True
        return orig(self, data)

    monkeypatch.setattr(
        bpe_pallas.PallasTokenEncoder,
        "encode_resident_wire_dispatch",
        counting,
    )
    t = MT.build({(97, 98): 256, (256, 99): 257})
    chunks = [np.frombuffer(b"abcabcab", np.uint8),
              np.frombuffer(b"abcx", np.uint8)]
    out = b"".join(engine.bpe_stream(iter(chunks), t, 4096))
    exp = b"".join(
        np.asarray(bpe_encode_multipass(c, t), np.uint16).astype(">u2").tobytes()
        for c in chunks
    )
    assert out == exp
    assert calls["n"] == 2


def test_compact_slots_device_matches_host_filter():
    """Device-side drop-after-merge + stable compaction == filter_slots,
    including the cross-batch prev-slot carry and all-zero/merged runs."""
    import jax.numpy as jnp

    from blt_tpu.ops.bpe_pallas import compact_slots_device, filter_slots

    rng = np.random.default_rng(29)
    capacity = 4096
    # byteswapped-u16 slot streams: byte tokens (low byte 0), merged
    # tokens (low byte != 0), and consumed slots (0)
    for trial in range(6):
        batches = []
        for _ in range(3):
            n = int(rng.integers(1, capacity + 1))
            kind = rng.integers(0, 3, n)
            vals = np.where(
                kind == 0,
                rng.integers(0, 256, n) << 8,      # byte tokens
                np.where(kind == 1,
                         rng.integers(256, 65536, n),  # merged-ish values
                         0),                            # consumed slots
            ).astype(np.uint16)
            batches.append(vals)

        # host reference: filter_slots threading prev_tok
        prev_tok = 0
        expected = []
        for b in batches:
            toks, prev_tok = filter_slots(b, prev_tok)
            expected.append(toks.copy())

        # device path threading the prev_slot scalar
        prev_slot = jnp.int32(0)
        got = []
        for b in batches:
            buf = np.zeros(capacity, np.uint16)
            buf[: b.shape[0]] = b
            comp, m, prev_slot = compact_slots_device(
                jnp.asarray(buf.reshape(-1, 128)),
                jnp.int32(b.shape[0]), prev_slot, capacity=capacity,
            )
            got.append(np.asarray(comp)[: int(m)])

        for e, g in zip(expected, got):
            assert e.tolist() == g.tolist(), trial


def _kernel_invariant_batches(rng, capacity, n_batches, merge_p=0.3):
    """Random byteswapped-u16 slot streams obeying the kernel invariant:
    every slot with a nonzero low byte (a merge start) is followed by a 0
    consumed slot — possibly in the NEXT batch (the cross-batch carry
    case pack_slots_device must survive)."""
    batches = []
    pending_consumed = False
    for bi in range(n_batches):
        final = bi == n_batches - 1
        n = int(rng.integers(1, capacity + 1))
        vals = np.zeros(n, np.uint16)
        i = 0
        if pending_consumed:
            i = 1  # vals[0] stays 0: consumed by the previous batch's start
            pending_consumed = False
        while i < n:
            # the stream's FINAL slot is never a start: at EOF the kernel
            # has next_byte=-1, so no merge can begin on the last byte
            if rng.random() < merge_p and not (final and i == n - 1):
                v = int(rng.integers(256, 65536))
                vals[i] = ((v & 0xFF) << 8) | (v >> 8)  # swapped(v), low!=0
                if i + 1 >= n:
                    pending_consumed = True
                i += 2  # the consumed slot stays 0
            else:
                vals[i] = int(rng.integers(0, 256)) << 8  # raw byte
                i += 1
        batches.append(vals)
    return batches


def test_pack_slots_device_matches_host_filter():
    """pack_slots_device + unpack (native AND numpy) == filter_slots on
    kernel-invariant slot streams, incl. merges split across batches."""
    import jax.numpy as jnp

    from blt_tpu import native
    from blt_tpu.ops.bpe_pallas import pack_slots_device, unpack_slots_host

    rng = np.random.default_rng(31)
    capacity = 4096
    for trial in range(6):
        batches = _kernel_invariant_batches(rng, capacity, 3)

        prev_tok = 0
        expected = bytearray()
        for b in batches:
            toks, prev_tok = filter_slots(b, prev_tok)
            expected.extend(toks.tobytes())

        prev_slot = jnp.int32(0)
        got_np = bytearray()
        got_native = bytearray()
        for b in batches:
            buf = np.zeros(capacity, np.uint16)
            buf[: b.shape[0]] = b
            packed, flags, prev_slot = pack_slots_device(
                jnp.asarray(buf.reshape(-1, 128)),
                jnp.int32(b.shape[0]), prev_slot, capacity=capacity,
            )
            packed_h, flags_h = np.asarray(packed), np.asarray(flags)
            n = b.shape[0]
            got_np.extend(unpack_slots_host(packed_h, flags_h, n).tobytes())
            if native.available():
                got_native.extend(
                    bytes(native.unpack_slots(packed_h, flags_h, n, 2))
                )
        assert bytes(got_np) == bytes(expected), trial
        if native.available():
            assert bytes(got_native) == bytes(expected), trial


def test_unpack_slots_native_vs_numpy_fuzz():
    """Native unpack == numpy unpack across sizes that exercise the 8-wide
    fast path, range splits, and the masked final flag byte."""
    from blt_tpu import native
    from blt_tpu.ops.bpe_pallas import unpack_slots_host

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    # sizes above 2<<20 actually engage multiple native threads
    # (clamp_threads floors at 1MB/thread) — the r4 range-split race
    # lived only there
    for n in (1, 7, 8, 9, 255, 4096, 100003, (2 << 20) + 11, (5 << 20) + 3):
        packed = rng.integers(0, 256, n).astype(np.uint8)
        nf = (n + 7) // 8
        for density in (0.0, 0.1, 0.9):
            bits = (rng.random(nf * 8) < density).astype(np.uint8)
            flags = np.packbits(bits, bitorder="little")
            a = unpack_slots_host(packed, flags, n).tobytes()
            for threads in (1, 2, 3):
                b = bytes(native.unpack_slots(packed, flags, n, threads))
                assert a == b, (n, density, threads)


def test_encode_packed_device_matches_separate_pack():
    """The fused kernel+repack dispatch (encode_packed_device) must equal
    encode_device followed by pack_slots_device, including the carry and
    last-slot threading across batches."""
    import jax.numpy as jnp

    from blt_tpu.ops.bpe_pallas import pack_slots_device

    t = MergeTable.build({(97, 98): 256, (98, 99): 257, (32, 97): 258})
    enc = PallasFlatEncoder(t, interpret=True, capacity_bytes=BLOCK)
    cap = enc.capacity
    rng = np.random.default_rng(41)
    pieces = [
        rng.choice(np.frombuffer(b"abc ab x", np.uint8), size=s)
        for s in (BLOCK, BLOCK - 321, 77)
    ]
    buf = np.empty(enc.padded_bytes, np.uint8)

    carry_a = False
    prev_a = jnp.int32(0)
    carry_b = False
    prev_b = jnp.int32(0)
    for j, piece in enumerate(pieces):
        nb = int(pieces[j + 1][0]) if j + 1 < len(pieces) else -1
        dev, n = enc.upload(piece, buf)
        wire, carry_a, prev_a = enc.encode_packed_device(
            dev, n, carry_a, nb, prev_a
        )
        slots, _, carry_b = enc.encode_device(dev, n, carry_b, nb)
        packed, flags, prev_b = pack_slots_device(
            slots, jnp.int32(n), prev_b, capacity=cap
        )
        w = np.asarray(wire)
        assert w[:cap].tolist() == np.asarray(packed).tolist(), j
        assert w[cap:].tolist() == np.asarray(flags).tolist(), j
        assert int(np.asarray(prev_a)) == int(np.asarray(prev_b)), j
        assert np.asarray(carry_a).tolist() == np.asarray(carry_b).tolist(), j


def test_rows_per_block_1024_exact():
    """Encode exactness at the 1024-row block size that large-capacity
    encoders now default to (the selection logic is pinned separately in
    test_adaptive_rows_per_block; this certifies the kernel math at that
    block shape in interpret mode, multi-block with a partial tail)."""
    t = MergeTable.build({(97, 98): 256, (98, 99): 257, (32, 97): 258})
    block = 1024 * 128
    enc = PallasFlatEncoder(
        t, interpret=True, capacity_bytes=2 * block, rows_per_block=1024
    )
    assert enc.rows_per_block == 1024
    rng = np.random.default_rng(23)
    data = rng.choice(
        np.frombuffer(b"abc ab", np.uint8), size=block + block // 2 + 13
    )
    got = run_encoder(enc, data)
    assert got == bpe_encode_flat(data, t).tolist()


@pytest.mark.parametrize("d2h", ["packed", "slots", "compact"])
def test_pipelined_engine_stream_d2h_modes(d2h, monkeypatch):
    """The 3-stage pipelined stream is exact in every BLT_D2H mode."""
    from blt_tpu.pipeline.engines import JaxEngine

    monkeypatch.setenv("BLT_D2H", d2h)
    t = MergeTable.build({(97, 98): 256, (98, 99): 257, (99, 97): 258})
    rng = np.random.default_rng(13)
    data = rng.choice(
        np.frombuffer(b"abcabcaabbcc", np.uint8), size=3 * BLOCK + 41
    )
    hint = BLOCK
    chunks = [data[i : i + hint] for i in range(0, data.shape[0], hint)]

    enc = PallasFlatEncoder(t, interpret=True, capacity_bytes=hint)
    engine = JaxEngine()
    out = b"".join(engine._bpe_pallas_stream(iter(chunks), enc, hint))
    expected = bpe_encode_flat(data, t)
    got = np.frombuffer(out, ">u2").astype(np.int64)
    assert got.tolist() == expected.tolist()


# --- CHD perfect-hash lookup (merges.build_chd + kernel chd/perfect modes) ---


def _random_table(n, seed=0):
    rng = np.random.default_rng(seed)
    keys = rng.permutation(65536)[:n]
    return MergeTable.build(
        {(int(k) // 256, int(k) % 256): 256 + i for i, k in enumerate(keys)}
    )


def test_chd_placement_is_perfect():
    """Every rule key hashes to the slot that stores it (host replay of the
    device arithmetic), at every size class the builder produces."""
    for n in (1, 20, 50, 500, 2000):
        t = _random_table(n, seed=n)
        built = t.build_chd()
        assert built is not None, n
        entries, disp, a1, a2, has_ffff = built
        slots = entries.size
        mask = slots - 1
        shift = 32 - (slots.bit_length() - 1)

        def wrap32(x):
            x &= 0xFFFFFFFF
            return x - (1 << 32) if x >= 1 << 31 else x

        for (a, b), v in t.merges.items():
            p = a * 256 + b
            h = wrap32(p * a2) >> shift
            if disp is not None:
                bshift = 32 - (disp.size.bit_length() - 1)
                g = (wrap32(p * a1) >> bshift) & (disp.size - 1)
                h = h + int(disp[g])
            e = int(entries[h & mask])
            assert ((e >> 16) & 0xFFFF) == p and (e & 0xFFFF) == v, (a, b)


def test_chd_deterministic_and_memoized():
    t = _random_table(500)
    b1 = t.build_chd()
    b2 = t.build_chd()
    assert b1 is b2  # memoized
    t2 = _random_table(500)
    b3 = t2.build_chd()
    assert np.array_equal(b1[0], b3[0])  # same table -> same placement


def test_mode_selection_by_segments():
    """The encoder picks the lookup with the fewest gather segments."""
    assert PallasFlatEncoder(_random_table(4), interpret=True).mode == "perfect"
    assert PallasFlatEncoder(_random_table(500), interpret=True).mode == "chd"
    big = _random_table(20000)
    assert PallasFlatEncoder(big, interpret=True).mode == "direct"


def test_adaptive_rows_per_block():
    """>=1MB capacities pick 1024-row (128KB) blocks (measured ~5% faster,
    benches/results/flat_ablation_r3.json); smaller serving buckets keep
    the 512-row default; an explicit value always wins."""
    t = _random_table(8)
    assert PallasFlatEncoder(t, interpret=True).rows_per_block == 512
    assert (
        PallasFlatEncoder(
            t, interpret=True, capacity_bytes=64 * 1024
        ).rows_per_block
        == 512
    )
    assert (
        PallasFlatEncoder(
            t, interpret=True, capacity_bytes=1 << 20
        ).rows_per_block
        == 1024
    )
    assert (
        PallasFlatEncoder(
            t, interpret=True, capacity_bytes=1 << 20, rows_per_block=8
        ).rows_per_block
        == 8
    )


@pytest.mark.parametrize("n", [1, 20, 50, 500, 2000])
def test_chd_kernel_exact_vs_numpy(n):
    t = _random_table(n, seed=n + 100)
    enc = PallasFlatEncoder(t, interpret=True)
    assert enc.mode in ("perfect", "chd")
    rng = np.random.default_rng(n)
    # bias toward rule bytes so merges actually fire
    rule_bytes = np.array(
        sorted({a for (a, _) in t.merges} | {b for (_, b) in t.merges}),
        np.uint8,
    )
    data = np.where(
        rng.random(30000) < 0.7,
        rng.choice(rule_bytes, 30000),
        rng.integers(0, 256, 30000),
    ).astype(np.uint8)
    assert run_encoder(enc, data) == bpe_encode_flat(data, t).tolist()


def test_chd_ffff_rule_exact():
    """(255,255)->0xFFFF packs to the empty sentinel; the elementwise
    special case must cover it in the CHD modes too."""
    t = MergeTable.build({(255, 255): 0xFFFF, (97, 98): 300})
    enc = PallasFlatEncoder(t, interpret=True)
    assert enc.mode in ("perfect", "chd") and enc.has_ffff
    data = np.frombuffer(b"ab" + b"\xff" * 5 + b"ab\xff", np.uint8)
    assert run_encoder(enc, data) == bpe_encode_flat(data, t).tolist()


def test_chd_chained_pieces_carry():
    """Cross-batch carries through the CHD kernel match one-shot encoding."""
    t = MergeTable.build({(97, 97): 256, (98, 99): 257, (100, 100): 258})
    enc = PallasFlatEncoder(t, interpret=True)
    assert enc.mode == "perfect"
    rng = np.random.default_rng(3)
    data = rng.choice(np.frombuffer(b"aabbccdd", np.uint8), 9000).astype(np.uint8)
    one = run_encoder(enc, data)
    cuts = sorted(rng.integers(1, 9000, 3).tolist())
    pieces = np.split(data, cuts)
    assert run_encoder(enc, data, pieces) == one


def test_force_mode_cuckoo_exact():
    """force_mode pins the fallback placement; output must be identical."""
    t = _random_table(500, seed=9)
    enc_c = PallasFlatEncoder(t, interpret=True, force_mode="cuckoo")
    assert enc_c.mode == "cuckoo"
    enc_d = PallasFlatEncoder(t, interpret=True, force_mode="direct")
    assert enc_d.mode == "direct"
    rng = np.random.default_rng(9)
    data = rng.integers(0, 256, 20000).astype(np.uint8)
    exp = bpe_encode_flat(data, t).tolist()
    assert run_encoder(enc_c, data) == exp
    assert run_encoder(enc_d, data) == exp
    with pytest.raises(ValueError, match="not 'perfect'"):
        PallasFlatEncoder(t, interpret=True, force_mode="perfect")


def test_toolchain_canary_16bit_scan():
    """Toolchain canary for the parked 1.6x flat-scan headroom.

    benches/results/flat_ablation_r4.json records why the 16-bit phase-1
    scan (19.4 -> ~30 GB/s noscan ceiling, reference tokenizer.rs:61-86
    semantics) is blocked: 16-bit ``pltpu.roll`` crashes the Mosaic
    compile helper and strided sublane reads are rejected at trace time.
    This test re-probes both ops (tools/canary_16bit.py, in a subprocess
    so a compiler crash or hang cannot take the suite down) and FAILS
    LOUDLY the day a jax/Mosaic upgrade unblocks them — that failure
    means "go collect the ~1.6x", not "something broke". TPU-only: the
    block is in the Mosaic TPU lowering, which interpret/CPU never
    exercises. See CONFORMANCE.md (toolchain canary).
    """
    import json
    import os
    import subprocess
    import sys

    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("Mosaic lowering canary needs the TPU backend")

    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "tools", "canary_16bit.py")],
        capture_output=True,
        text=True,
        timeout=600,  # a silent compile hang is also a "still blocked"
    )
    verdict = json.loads(proc.stdout.strip().splitlines()[-1])
    assert not verdict["headroom_unblocked"], (
        "16-bit pltpu.roll AND strided sublane reads now lower on this "
        "toolchain: the flat-BPE scan's parked ~1.6x headroom "
        "(flat_ablation_r4.json, 19.4 -> ~30 GB/s) is reachable. "
        f"Revisit tools/exp_scan.py phase-1 16-bit scan. Verdict: {verdict}"
    )


def test_gap_resident_deep_pass_chain_hits_mid_loop_compaction():
    """A 6-round collapse chain (a^64 -> ... -> one token) forces the
    gap-tolerant loop through BOTH mid-loop compactions (every 3rd
    round, bpe_pallas._GAP_COMPACT_EVERY) — gaps would otherwise exceed
    the kernel's lookahead window. Exact vs the oracle."""
    from blt_tpu.ops.bpe_numpy import bpe_encode_multipass
    from blt_tpu.ops.bpe_pallas import PallasTokenEncoder

    merges = {(97, 97): 300}
    for k in range(5):
        merges[(300 + k, 300 + k)] = 301 + k
    t = MergeTable.build(merges)
    enc = PallasTokenEncoder(t, interpret=True)
    for n in (64, 63, 257, 1000):
        data = np.full(n, 97, np.uint8)
        got = enc.encode_resident(data).tolist()
        exp = bpe_encode_multipass(data, t).tolist()
        assert got == exp, n


def test_gap_resident_wire_roundtrip():
    """encode_resident_wire_dispatch + expand_gap_wire_host must produce
    the exact byteswapped-u16 wire of the oracle token stream."""
    from blt_tpu.ops.bpe_numpy import bpe_encode_multipass
    from blt_tpu.ops.bpe_pallas import (
        PallasTokenEncoder,
        expand_gap_wire_host,
    )

    rng = np.random.default_rng(23)
    merges = {
        (97, 98): 256, (256, 99): 257, (257, 257): 258,
        (120, 121): 90, (90, 122): 0, (0, 97): 400,
    }
    t = MergeTable.build(merges)
    enc = PallasTokenEncoder(t, interpret=True)
    for n in (2, 777, 4096):
        data = rng.choice(
            np.frombuffer(b"abcabcxyzaxyz", np.uint8), size=n
        ).astype(np.uint8)
        wire_d, m_d, cap = enc.encode_resident_wire_dispatch(data)
        toks = expand_gap_wire_host(np.asarray(wire_d), cap)
        assert toks.shape[0] == int(m_d)
        exp = bpe_encode_multipass(data, t)
        exp_wire = np.asarray(exp, np.uint16).astype(">u2").tobytes()
        assert toks.tobytes() == exp_wire, n


def test_mp_compact_sort_escape_hatch(monkeypatch):
    """BLT_MP_COMPACT=sort restores the per-pass sort loop with identical
    output (the comparison baseline for the gap redesign)."""
    from blt_tpu.ops.bpe_numpy import bpe_encode_multipass
    from blt_tpu.ops.bpe_pallas import PallasTokenEncoder

    t = MergeTable.build({(97, 98): 256, (256, 99): 257, (32, 97): 259})
    data = np.frombuffer(b"abc abcabc ab abc" * 40, np.uint8)
    exp = bpe_encode_multipass(data, t).tolist()

    monkeypatch.setenv("BLT_MP_COMPACT", "sort")
    enc = PallasTokenEncoder(t, interpret=True)
    assert enc.encode_resident(data).tolist() == exp
    monkeypatch.setenv("BLT_MP_COMPACT", "gap")
    assert enc.encode_resident(data).tolist() == exp
    # unknown values fall back to the default gap mode
    monkeypatch.setenv("BLT_MP_COMPACT", "bogus")
    assert enc.encode_resident(data).tolist() == exp


def test_gap_resident_randomized_fuzz_vs_oracle():
    """Randomized tables (incl. hierarchical chains + collisions) x
    randomized corpora: the gap-tolerant resident loop is bit-exact vs
    the oracle across pass counts and tombstone densities."""
    from blt_tpu.ops.bpe_numpy import bpe_encode_multipass
    from blt_tpu.ops.bpe_pallas import PallasTokenEncoder

    rng = np.random.default_rng(5)
    for trial in range(6):
        n_base = int(rng.integers(2, 40))
        merges = {}
        nxt = 256
        for _ in range(n_base):
            a, b = int(rng.integers(90, 123)), int(rng.integers(90, 123))
            if (a, b) not in merges:
                merges[(a, b)] = nxt
                nxt += 1
        # hierarchical chain over fresh ids
        for _ in range(int(rng.integers(0, 6))):
            a = int(rng.integers(256, nxt)) if nxt > 256 else 97
            b = int(rng.integers(256, nxt)) if nxt > 256 else 97
            if (a, b) not in merges:
                merges[(a, b)] = nxt
                nxt += 1
        t = MergeTable.build(merges)
        enc = PallasTokenEncoder(t, interpret=True)
        n = int(rng.integers(1, 3000))
        data = rng.integers(90, 123, n).astype(np.uint8)
        got = enc.encode_resident(data).tolist()
        exp = bpe_encode_multipass(data, t).tolist()
        assert got == exp, (trial, n, len(merges))
