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
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-pthread",
        "-std=c++17",
        SRC,
        "-o",
        OUT,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
    sys.exit(0)
