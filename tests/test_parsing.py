"""Size-string and thread-count parsing tests.

Mirrors the reference unit tests (blt_core/src/utils.rs:47-71, 99-121).
"""

import os

import pytest

from blt_tpu.utils.parsing import (
    SizeParseError,
    determine_thread_count,
    parse_chunk_size_str,
)


def test_parse_chunk_size_str_valid():
    assert parse_chunk_size_str("1024") == 1024
    assert parse_chunk_size_str("1kb") == 1024
    assert parse_chunk_size_str("1KB") == 1024
    assert parse_chunk_size_str("2mb") == 2 * 1024 * 1024
    assert parse_chunk_size_str("2MB") == 2 * 1024 * 1024
    assert parse_chunk_size_str("10MB ") == 10 * 1024 * 1024  # trailing space


@pytest.mark.parametrize(
    "bad", ["1gb", "mb1", "1024b", "", "abc", "10.5MB", "KB", " MB"]
)
def test_parse_chunk_size_str_invalid(bad):
    with pytest.raises(SizeParseError):
        parse_chunk_size_str(bad)


def test_determine_thread_count_override():
    assert determine_thread_count(4) == 4
    assert determine_thread_count(1) == 1
    assert determine_thread_count(0) == 1  # 0 coerces to 1


def test_determine_thread_count_auto():
    cores = os.cpu_count() or 1
    assert determine_thread_count(None) == max(cores, 1)
