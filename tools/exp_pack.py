"""Packed sub-32-bit VPU op-rate microbenchmark (i32 vs i16 vs i8).

The flat-BPE kernel is VPU-op-bound (~90 vector ops/element vs a 164 GB/s
widen floor). If Mosaic executes packed i16 (2 elem / 32-bit sublane slot)
or i8 (4 elem) elementwise ops at full vreg rate, an i16-domain kernel
could halve the op time. This measures a representative op mix (mult,
shifts, and/or, compare, select, lane-roll) per dtype at fixed logical
element count, device-chained to amortize dispatch.

Result recorded in memory/PROGRESS notes; see tpu-kernel-perf-landscape.
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blt_tpu.utils.compcache import enable_compilation_cache

LANES = 128
ROWS = 16 * 1024  # 16K rows x 128 lanes = 2M elements per call
K = 64  # chained kernels per jit call
OPS_REPS = 8  # repetitions of the op mix inside the kernel


def log(m):
    print(m, file=sys.stderr, flush=True)


def _mix_kernel(dtype):
    def kernel(x_ref, tok_ref, out_ref, done_ref):
        x = x_ref[:]
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1).astype(dtype)
        acc = x
        two = jnp.asarray(2, dtype)
        for _ in range(OPS_REPS):
            # ~12-op mix mirroring the BPE kernel body per rep
            y = acc * jnp.asarray(31, dtype)          # mult
            y = y >> 3                                 # shift
            y = y & jnp.asarray(0x3F, dtype)           # and
            r = pltpu.roll(acc, 1, axis=1)             # lane roll
            m = y == (acc & jnp.asarray(0x3F, dtype))  # and + compare
            y = jnp.where(m, r, y)                     # select
            z = jnp.maximum(y, acc)                    # max
            m2 = lane_iota >= two                      # compare
            acc = jnp.where(m2, z, y) + jnp.asarray(1, dtype)  # select + add
        out_ref[:] = acc
        done_ref[0, 0] = pl.program_id(0) + tok_ref[0, 0]

    return kernel


@functools.partial(jax.jit, static_argnames=("dtype_name", "k"))
def chain(x, tok, dtype_name="int32", k=K):
    dtype = jnp.dtype(dtype_name)
    rows = x.shape[0]
    rpb = 1024

    def call(t):
        return pl.pallas_call(
            _mix_kernel(dtype),
            grid=(rows // rpb,),
            in_specs=[
                pl.BlockSpec((rpb, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((rpb, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((rows, LANES), dtype),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ),
        )(x, t)

    def body(t, _):
        out, t2 = call(t)
        return t2, ()

    tok, _ = jax.lax.scan(body, tok, None, length=k - 1)
    return call(tok)


def main():
    enable_compilation_cache()
    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    zc = jax.device_put(np.zeros((1, 1), np.int32))
    for name in ("int32", "int16", "int8"):
        x = jax.device_put(
            rng.integers(0, 100, (ROWS, LANES)).astype(np.dtype(name))
        )
        try:
            t0 = time.perf_counter()
            out, done = chain(x, zc, dtype_name=name)
            np.asarray(done)
            log(f"{name}: compile+first {time.perf_counter() - t0:.2f}s")
            t0 = time.perf_counter()
            r = 3
            for _ in range(r):
                out, done = chain(x, zc, dtype_name=name)
            np.asarray(done)
            dt = time.perf_counter() - t0
            elems = ROWS * LANES * K * r
            log(f"{name}: {elems / dt / 1e9:.2f} Gelem/s (op-mix x{OPS_REPS})")
        except Exception as e:
            log(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
