"""Build the native host library (libbltnative.so) with g++.

Usage: python -m blt_tpu.native.build
The library is optional: every consumer falls back to NumPy when it is
absent. No pybind11 — the ABI is plain C via ctypes.
"""

from __future__ import annotations

import os
import subprocess
import sys

SRC = os.path.join(os.path.dirname(__file__), "feeder.cpp")
OUT = os.path.join(os.path.dirname(__file__), "libbltnative.so")


def build(verbose: bool = True) -> str:
    # Compile to a private temp name, then atomically rename: concurrent
    # builders (e.g. parallel pytest workers hitting ensure_built) never
    # see a half-written .so.
    tmp = f"{OUT}.tmp.{os.getpid()}"
    base = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-pthread",
        "-std=c++17",
        SRC,
        "-o",
        tmp,
    ]
    for cmd in (base[:2] + ["-march=native"] + base[2:], base):
        if verbose:
            print(" ".join(cmd))
        proc = subprocess.run(cmd, capture_output=not verbose)
        if proc.returncode == 0:
            os.replace(tmp, OUT)
            return OUT
    raise RuntimeError(f"g++ failed to build {SRC}")


def ensure_built() -> str | None:
    """Build libbltnative.so if missing or older than its source.

    Returns the .so path, or None when building is impossible/disabled
    (BLT_NATIVE_BUILD=0, no g++, compile error) — callers fall back to
    NumPy. Mirrors the reference's always-compiled Rust core
    (reference: blt_core/src/io_handler.rs, pipeline.rs) without making
    the native engine a hard install-time dependency.
    """
    if os.environ.get("BLT_NATIVE_BUILD", "1") == "0":
        return OUT if os.path.exists(OUT) else None
    try:
        fresh = os.path.exists(OUT) and os.path.getmtime(OUT) >= os.path.getmtime(SRC)
    except OSError:
        fresh = False
    if fresh:
        return OUT
    try:
        return build(verbose=False)
    except (OSError, RuntimeError, subprocess.SubprocessError):
        return OUT if os.path.exists(OUT) else None


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
    sys.exit(0)
