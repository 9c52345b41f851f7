"""Utility layer: parsing, chunk planning, sysinfo, logging."""

from blt_tpu.utils.parsing import (
    SizeParseError,
    determine_thread_count,
    parse_chunk_size_str,
)
from blt_tpu.utils.chunking import get_effective_chunk_size

__all__ = [
    "SizeParseError",
    "determine_thread_count",
    "parse_chunk_size_str",
    "get_effective_chunk_size",
]
