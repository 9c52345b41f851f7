"""Build the native host library (libbltnative.so) with g++.

Usage: python -m blt_tpu.native.build
The library is optional: every consumer falls back to NumPy when it is
absent. No pybind11 — the ABI is plain C via ctypes.
"""

from __future__ import annotations

import logging
import os
import subprocess
import sys
import threading
import uuid

SRC = os.path.join(os.path.dirname(__file__), "feeder.cpp")
OUT = os.path.join(os.path.dirname(__file__), "libbltnative.so")

_build_lock = threading.Lock()


def build(verbose: bool = True) -> str:
    # Compile to a private temp name, then atomically rename: concurrent
    # builders (parallel pytest workers, racing threads in one process)
    # never see a half-written .so. The temp name carries pid + a random
    # suffix so two threads of one process cannot collide either.
    tmp = f"{OUT}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
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
    stderr_tail = ""
    try:
        for cmd in (base[:2] + ["-march=native"] + base[2:], base):
            if verbose:
                print(" ".join(cmd))
            proc = subprocess.run(cmd, capture_output=not verbose)
            if proc.returncode == 0:
                os.replace(tmp, OUT)
                return OUT
            if proc.stderr:
                stderr_tail = proc.stderr.decode("utf-8", "replace")[-2000:]
        raise RuntimeError(
            f"g++ failed to build {SRC}"
            + (f":\n{stderr_tail}" if stderr_tail else "")
        )
    finally:
        try:
            os.unlink(tmp)
        except OSError:
            pass


def ensure_built() -> str | None:
    """Build libbltnative.so if missing or older than its source.

    Returns the .so path, or None when building is impossible/disabled
    (BLT_NATIVE_BUILD=0, no g++, compile error) — callers fall back to
    NumPy. Mirrors the reference's always-compiled Rust core
    (reference: blt_core/src/io_handler.rs, pipeline.rs) without making
    the native engine a hard install-time dependency. Build failures are
    logged (not swallowed) so toolchain breakage is visible.
    """
    if os.environ.get("BLT_NATIVE_BUILD", "1") == "0":
        return OUT if os.path.exists(OUT) else None
    with _build_lock:
        try:
            fresh = os.path.exists(OUT) and os.path.getmtime(
                OUT
            ) >= os.path.getmtime(SRC)
        except OSError:
            fresh = False
        if fresh:
            return OUT
        try:
            return build(verbose=False)
        except (OSError, RuntimeError, subprocess.SubprocessError) as e:
            logging.getLogger("blt.native").warning(
                "native build failed; falling back to NumPy: %s", e
            )
            return OUT if os.path.exists(OUT) else None


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
    sys.exit(0)
