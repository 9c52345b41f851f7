"""Python API tests.

Mirrors the reference Python tier (blt_python/tests/test_tokenizer.py:
constructor validation, end-to-end tokenization, utility functions, module
exports) but with exact-byte assertions — stronger than the reference's
non-empty checks — plus the documented dict-values fix (SURVEY.md 2.1.9).
"""

import numpy as np
import pytest

import blt_tpu as blt


def u16be(values):
    return b"".join(int(v).to_bytes(2, "big") for v in values)


class TestByteTokenizer:
    def test_basic_tokenizer_creation(self):
        tok = blt.ByteTokenizer()
        assert tok is not None
        assert "ByteTokenizer" in repr(tok)

    def test_tokenizer_with_merges(self):
        tok = blt.ByteTokenizer(merges={(97, 98): 256, (99, 100): 257})
        assert "merges=2" in repr(tok)

    def test_tokenizer_with_content_type(self):
        assert "Text" in repr(blt.ByteTokenizer(content_type="Text"))
        assert "Bin" in repr(blt.ByteTokenizer(content_type="Bin"))

    def test_invalid_content_type(self):
        with pytest.raises(ValueError):
            blt.ByteTokenizer(content_type="Invalid")

    def test_invalid_memory_cap(self):
        with pytest.raises(ValueError):
            blt.ByteTokenizer(memory_cap=150)

    def test_basic_tokenization(self, tmp_path):
        ip = tmp_path / "in.txt"
        op = tmp_path / "out.bin"
        ip.write_bytes(b"hello world")
        blt.ByteTokenizer().tokenize_file(str(ip), str(op))
        assert op.read_bytes() == u16be(b"hello world")

    def test_empty_input(self, tmp_path):
        ip = tmp_path / "in.txt"
        op = tmp_path / "out.bin"
        ip.write_bytes(b"")
        blt.ByteTokenizer().tokenize_file(str(ip), str(op))
        assert op.read_bytes() == b""

    def test_bpe_tokenization(self, tmp_path):
        ip = tmp_path / "in.txt"
        op = tmp_path / "out.bin"
        ip.write_bytes(b"ab")
        blt.ByteTokenizer(merges={(97, 98): 256}).tokenize_file(str(ip), str(op))
        assert op.read_bytes() == u16be([256])

    def test_merges_dict_values_honored(self, tmp_path):
        # The reference binding discards dict values (blt_python/src/lib.rs:
        # 111-113); we honor them — documented behavior fix.
        ip = tmp_path / "in.txt"
        op = tmp_path / "out.bin"
        ip.write_bytes(b"ab")
        blt.ByteTokenizer(merges={(97, 98): 300}).tokenize_file(str(ip), str(op))
        assert op.read_bytes() == u16be([300])

    def test_content_type_header(self, tmp_path):
        ip = tmp_path / "in.txt"
        op = tmp_path / "out.bin"
        ip.write_bytes(b"hi")
        blt.ByteTokenizer(content_type="Text").tokenize_file(str(ip), str(op))
        assert op.read_bytes() == u16be([0xFF01]) + u16be(b"hi")

    def test_configuration_options(self, tmp_path):
        ip = tmp_path / "in.txt"
        op = tmp_path / "out.bin"
        ip.write_bytes(b"test data for configuration")
        blt.ByteTokenizer(threads=2, chunk_size="1MB", memory_cap=50).tokenize_file(
            str(ip), str(op)
        )
        assert op.read_bytes() == u16be(b"test data for configuration")

    def test_large_data(self, tmp_path):
        ip = tmp_path / "in.bin"
        op = tmp_path / "out.bin"
        data = b"x" * (100 * 1024)
        ip.write_bytes(data)
        blt.ByteTokenizer().tokenize_file(str(ip), str(op))
        out = op.read_bytes()
        assert len(out) == 2 * len(data)
        assert out[:8] == u16be(b"xxxx")

    def test_tokenize_bytes(self):
        tok = blt.ByteTokenizer(merges={(97, 98): 256})
        assert tok.tokenize_bytes(b"abcab").tolist() == [256, 99, 256]
        assert blt.ByteTokenizer().tokenize_bytes(b"abc").tolist() == [97, 98, 99]


class TestUtilityFunctions:
    def test_version_function(self):
        v = blt.version()
        assert isinstance(v, str) and "." in v

    def test_load_bpe_merges_file_not_found(self):
        with pytest.raises(IOError):
            blt.load_bpe_merges("non_existent_file.txt")

    def test_load_bpe_merges_valid_file(self, tmp_path):
        p = tmp_path / "m.txt"
        p.write_text("97 98\n99 100\n")
        merges = blt.load_bpe_merges(str(p))
        assert merges == {(97, 98): 256, (99, 100): 257}


class TestModuleAttributes:
    def test_module_version(self):
        assert blt.__version__ == blt.version()

    def test_module_exports(self):
        for export in ["ByteTokenizer", "load_bpe_merges", "version", "__version__"]:
            assert hasattr(blt, export), f"Missing export: {export}"


class TestPerformance:
    def test_performance_smoke(self, tmp_path):
        # reference bound: <1s for 100KB (blt_python/tests/test_tokenizer.py:293-296)
        import time

        ip = tmp_path / "in.bin"
        op = tmp_path / "out.bin"
        ip.write_bytes(b"x" * (100 * 1024))
        t0 = time.time()
        blt.ByteTokenizer().tokenize_file(str(ip), str(op))
        assert time.time() - t0 < 1.0
        assert op.stat().st_size == 200 * 1024
