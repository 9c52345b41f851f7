"""Chunk-size policy tests (mirror blt_core/src/chunking.rs:72-149)."""

from blt_tpu.utils.chunking import (
    ABSOLUTE_MAX_CHUNK_SIZE,
    ABSOLUTE_MIN_CHUNK_SIZE,
    DEFAULT_MAX_CHUNK_SIZE_BYTES,
    DEFAULT_MIN_CHUNK_SIZE_BYTES,
    align_up,
    get_effective_chunk_size,
    plan_device_chunk,
)


def test_cli_override():
    assert get_effective_chunk_size(5 * 1024 * 1024, 4, 80) == 5 * 1024 * 1024
    # clamping
    assert get_effective_chunk_size(10 * 1024, 4, 80) == ABSOLUTE_MIN_CHUNK_SIZE
    assert (
        get_effective_chunk_size(200 * 1024 * 1024, 4, 80) == ABSOLUTE_MAX_CHUNK_SIZE
    )


def test_dynamic_bounds():
    for threads, memcap in [(4, 80), (4, 1), (128, 80)]:
        size = get_effective_chunk_size(None, threads, memcap)
        assert ABSOLUTE_MIN_CHUNK_SIZE <= size <= ABSOLUTE_MAX_CHUNK_SIZE
        assert size <= DEFAULT_MAX_CHUNK_SIZE_BYTES
        assert size >= min(DEFAULT_MIN_CHUNK_SIZE_BYTES, ABSOLUTE_MIN_CHUNK_SIZE)


def test_device_alignment():
    assert align_up(1) == 1024
    assert align_up(1024) == 1024
    assert align_up(1025) == 2048
    assert plan_device_chunk(300_000) % 1024 == 0
    assert plan_device_chunk(300_000) >= 300_000
