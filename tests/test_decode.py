"""Detokenizer tests: decode(encode(x)) == x, plus the error surface.

The reference has no decode path at all (verified absent from
reference/src, blt_core/src, blt_python/), so every behavior here is
pinned against this framework's encoder as ground truth: the roundtrip
property closes the conformance loop the reference could never test.
"""

import numpy as np
import pytest

from blt_tpu.api import ByteTokenizer
from blt_tpu.config import ContentType, CoreConfig, Engine
from blt_tpu.ops.bpe_oracle import bpe_encode_oracle, tokens_to_be_bytes
from blt_tpu.ops.decode import (
    DecodeError,
    build_expansion_table,
    decode_tokens,
    decode_wire,
)
from blt_tpu.pipeline.runner import run_tokenizer

MERGES_TEXT = "97 98\n98 99\n99 97\n"
MERGES = {(97, 98): 256, (98, 99): 257, (99, 97): 258}


def roundtrip_files(tmp_path, data: bytes, merges_text=None, content_type=None,
                    decode_chunksize=None) -> bytes:
    ip = tmp_path / "in.bin"
    enc = tmp_path / "enc.bin"
    dec = tmp_path / "dec.bin"
    ip.write_bytes(data)
    mp = None
    if merges_text is not None:
        mp = tmp_path / "merges.txt"
        mp.write_text(merges_text)
    run_tokenizer(CoreConfig.new_from_cli(
        input=ip, output=enc, merges=mp, content_type=content_type,
        engine=Engine.NUMPY,
    ))
    run_tokenizer(CoreConfig.new_from_cli(
        input=enc, output=dec, merges=mp, content_type=content_type,
        decode=True, chunksize=decode_chunksize,
    ))
    return dec.read_bytes()


# --- expansion-table construction -------------------------------------------


def test_expansion_flat_table():
    t = build_expansion_table(MERGES)
    assert decode_tokens(np.array([256, 32, 257, 97], np.uint16), t).tobytes() \
        == b"ab bca"


def test_expansion_hierarchical():
    # (256,99)->257 expands recursively: 257 -> 256,99 -> a,b,c
    t = build_expansion_table({(97, 98): 256, (256, 99): 257})
    assert decode_tokens(np.array([257, 100], np.uint16), t).tobytes() == b"abcd"


def test_expansion_deep_chain():
    # a chain deeper than the default recursion limit must still build
    merges = {(97, 98): 256}
    for i in range(256, 2500):
        merges[(i, 97)] = i + 1
    t = build_expansion_table(merges)
    out = decode_tokens(np.array([2500], np.uint16), t)
    assert out.tobytes() == b"ab" + b"a" * (2500 - 256)


def test_rejects_value_colliding_with_bytes():
    # the (120,121)->90 collision pinned by reference tokenizer.rs:283-291
    # makes token 90 ambiguous (literal 'Z' vs the merged pair)
    with pytest.raises(DecodeError, match="collides with the literal byte"):
        build_expansion_table({(120, 121): 90})


def test_rejects_duplicate_values():
    with pytest.raises(DecodeError, match="produced by both"):
        build_expansion_table({(1, 2): 300, (3, 4): 300})


def test_dead_rules_accepted_but_undecodable():
    """Rules whose members are not producible from bytes (dangling member
    or cycle) never fire in the encoder, so the TABLE stays decodable —
    only the dead rule's value is rejected if it appears in a stream.
    This keeps decode(encode(x)) == x for every table the encoder accepts."""
    # dangling member: 400 is neither a byte nor any rule's value
    t = build_expansion_table({(400, 99): 300, (97, 98): 256})
    assert decode_tokens(np.array([256], np.uint16), t).tobytes() == b"ab"
    with pytest.raises(DecodeError, match="invalid token 300"):
        decode_tokens(np.array([300], np.uint16), t)
    # rule cycle: neither 256 nor 257 is reachable from bytes
    t2 = build_expansion_table({(257, 99): 256, (256, 98): 257, (97, 98): 300})
    assert decode_tokens(np.array([300], np.uint16), t2).tobytes() == b"ab"
    for dead in (256, 257):
        with pytest.raises(DecodeError, match=f"invalid token {dead}"):
            decode_tokens(np.array([dead], np.uint16), t2)


# --- decode_tokens / decode_wire ---------------------------------------------


def test_unknown_token_id_names_position():
    t = build_expansion_table(MERGES)
    with pytest.raises(DecodeError, match="invalid token 300 at position 2"):
        decode_tokens(np.array([97, 256, 300], np.uint16), t)


def test_orphaned_id_rejected():
    # duplicate-pair id accounting (reference config_loader.rs:167-202):
    # lines "1 2 / 3 4 / 1 2" yield {(1,2)->258,(3,4)->257}; id 256 is
    # orphaned — the encoder can never emit it, so decode must reject it.
    from blt_tpu.merges import parse_merges_text

    merges = parse_merges_text("1 2\n3 4\n1 2\n")
    t = build_expansion_table(merges)
    assert decode_tokens(np.array([258, 257], np.uint16), t).tobytes() \
        == bytes([1, 2, 3, 4])
    with pytest.raises(DecodeError, match="invalid token 256"):
        decode_tokens(np.array([256], np.uint16), t)


def test_decode_wire_big_endian():
    t = build_expansion_table({})
    wire = np.frombuffer(bytes([0, 104, 0, 105]), np.uint8)
    assert decode_wire(wire, t).tobytes() == b"hi"


# --- pipeline roundtrips ------------------------------------------------------


def test_roundtrip_basic(tmp_path):
    data = bytes(range(256)) * 100
    assert roundtrip_files(tmp_path, data) == data


def test_roundtrip_bpe_with_header(tmp_path):
    data = b"abcabc abc cabba" * 5000
    out = roundtrip_files(
        tmp_path, data, merges_text=MERGES_TEXT, content_type=ContentType.TEXT
    )
    assert out == data


def test_roundtrip_empty(tmp_path):
    assert roundtrip_files(tmp_path, b"") == b""


def test_decode_chunk_size_invariance(tmp_path):
    data = b"abcabc abc cabba" * 50000
    outs = {
        cs: roundtrip_files(tmp_path, data, merges_text=MERGES_TEXT,
                            decode_chunksize=cs)
        for cs in [None, "256KB", "400001"]
    }
    for cs, out in outs.items():
        assert out == data, f"chunksize={cs}"


def test_decode_stream_ragged_chunks():
    """Sub-token bytes carried across arbitrary chunk splits."""
    from blt_tpu.pipeline.runner import _decode_stream

    tokens = [256, 32, 257, 97, 258, 99] * 37
    wire = tokens_to_be_bytes(tokens)
    expected = decode_tokens(
        np.array(tokens, np.uint16), build_expansion_table(MERGES)
    ).tobytes()
    for splits in [(1,), (3, 1, 2), (7,), (1, 1, 1)]:
        chunks = []
        pos = 0
        i = 0
        while pos < len(wire):
            n = splits[i % len(splits)]
            chunks.append(np.frombuffer(wire[pos:pos + n], np.uint8))
            pos += n
            i += 1
        got = b"".join(
            bytes(part) for part in _decode_stream(
                iter(chunks), build_expansion_table(MERGES), None
            )
        )
        assert got == expected, f"splits={splits}"


def test_decode_header_mismatch(tmp_path):
    ip = tmp_path / "in.bin"
    op = tmp_path / "out.bin"
    ip.write_bytes(bytes([0xFF, 0x02, 0, 97]))  # Audio header
    with pytest.raises(DecodeError, match="expected content-type header 0xFF01"):
        run_tokenizer(CoreConfig.new_from_cli(
            input=ip, output=op, content_type=ContentType.TEXT, decode=True,
        ))
    assert not op.exists()  # partial-output cleanup applies to decode too


def test_decode_odd_trailing_byte(tmp_path):
    ip = tmp_path / "in.bin"
    op = tmp_path / "out.bin"
    ip.write_bytes(bytes([0, 97, 0]))
    with pytest.raises(DecodeError, match="odd trailing byte"):
        run_tokenizer(CoreConfig.new_from_cli(input=ip, output=op, decode=True))


def test_decode_empty_with_expected_header(tmp_path):
    ip = tmp_path / "in.bin"
    op = tmp_path / "out.bin"
    ip.write_bytes(b"")
    with pytest.raises(DecodeError, match="ended before"):
        run_tokenizer(CoreConfig.new_from_cli(
            input=ip, output=op, content_type=ContentType.BIN, decode=True,
        ))


def test_passthrough_wins_over_decode(tmp_path):
    # reference truth table precedence: passthrough beats everything
    ip = tmp_path / "in.bin"
    op = tmp_path / "out.bin"
    ip.write_bytes(b"raw bytes")
    run_tokenizer(CoreConfig.new_from_cli(
        input=ip, output=op, passthrough=True, decode=True,
    ))
    assert op.read_bytes() == b"raw bytes"


# --- API surface --------------------------------------------------------------


def test_api_detokenize_file(tmp_path):
    tok = ByteTokenizer(merges=MERGES, content_type="Text")
    data = b"abc abc cab" * 1000
    ip = tmp_path / "in.bin"
    enc = tmp_path / "enc.bin"
    dec = tmp_path / "dec.bin"
    ip.write_bytes(data)
    tok.tokenize_file(str(ip), str(enc))
    tok.detokenize_file(str(enc), str(dec))
    assert dec.read_bytes() == data


def test_api_detokenize_bytes():
    tok = ByteTokenizer(merges=MERGES)
    wire = tokens_to_be_bytes(bpe_encode_oracle(b"abcabc", MERGES))
    assert tok.detokenize_bytes(wire) == b"abcabc"
    with pytest.raises(ValueError, match="odd trailing byte"):
        tok.detokenize_bytes(b"\x00")


# --- native engine ------------------------------------------------------------


def test_native_decode_matches_numpy():
    """blt_decode_size/_fill (native/feeder.cpp) vs the NumPy gather,
    including the invalid-token position contract."""
    from blt_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    pairs = set()
    while len(pairs) < 300:
        pairs.add((int(rng.integers(0, 256)), int(rng.integers(0, 256))))
    merges = {p: 256 + i for i, p in enumerate(sorted(pairs))}
    table = build_expansion_table(merges)
    tokens = rng.choice(
        np.arange(0, 256 + len(merges)), 200_000
    ).astype(np.uint16)
    wire = np.empty(2 * tokens.shape[0], np.uint8)
    wire[0::2] = (tokens >> 8).astype(np.uint8)
    wire[1::2] = (tokens & 0xFF).astype(np.uint8)
    expected = decode_tokens(tokens, table)
    got = native.decode_expand(wire, table.offsets, table.lengths, table.blob)
    assert not isinstance(got, int)
    assert np.array_equal(got, expected)
    # first invalid token position is reported exactly
    bad = 256 + len(merges) + 7
    wire[2 * 777] = bad >> 8
    wire[2 * 777 + 1] = bad & 0xFF
    assert native.decode_expand(
        wire, table.offsets, table.lengths, table.blob
    ) == 777
    # and the decode_wire entry raises with that position
    from blt_tpu.ops.decode import decode_wire

    with pytest.raises(DecodeError, match=f"invalid token {bad} at position 777"):
        decode_wire(wire, table)


# --- hierarchical + fuzz ------------------------------------------------------


def test_roundtrip_hierarchical_oracle():
    merges = {(97, 98): 256, (256, 99): 257, (257, 257): 258}
    data = b"abcabcabcab" * 300
    tokens = bpe_encode_oracle(data, merges)
    t = build_expansion_table(merges)
    assert decode_tokens(np.array(tokens, np.uint16), t).tobytes() == data


def test_fuzz_roundtrip_random_tables(tmp_path):
    rng = np.random.default_rng(0xDEC0DE)
    for trial in range(8):
        n_rules = int(rng.integers(1, 60))
        pairs = set()
        while len(pairs) < n_rules:
            pairs.add((int(rng.integers(0, 256)), int(rng.integers(0, 256))))
        merges_text = "".join(f"{a} {b}\n" for a, b in pairs)
        alphabet = np.frombuffer(b"abcdefgh ", np.uint8)
        data = rng.choice(alphabet, size=int(rng.integers(1, 50_000))).tobytes()
        out = roundtrip_files(
            tmp_path, data, merges_text=merges_text,
            content_type=ContentType.BIN if trial % 2 else None,
        )
        assert out == data, f"trial={trial} rules={sorted(pairs)[:4]}..."
