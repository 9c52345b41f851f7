"""Isolate which 16-bit vector op crashes the Mosaic remote compiler.

exp_scan.py (i16 phase-1) and exp_bf16scan.py (bf16 phase-1) both died
with an INTERNAL compile-helper crash. This probes each candidate op in a
minimal single pallas_call: 16-bit lane roll, 16-bit max, bool-select on
16-bit operands, bf16<->i32 converts, and the composed 7-step scan.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
R = 512


def log(m):
    print(m, file=sys.stderr, flush=True)


def run(name, kern, out_dtype=jnp.int32):
    x = np.arange(R * LANES, dtype=np.int32).reshape(R, LANES) % 97
    try:
        t0 = time.perf_counter()
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, LANES), out_dtype),
        )(jnp.asarray(x))
        np.asarray(out)
        log(f"{name}: OK ({time.perf_counter() - t0:.1f}s)")
        return True
    except Exception as exc:  # noqa: BLE001
        log(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:160]}")
        return False


def k_bf16_roll(x_ref, o_ref):
    b = x_ref[:].astype(jnp.bfloat16)
    r = pltpu.roll(b, 1, axis=1)
    o_ref[:] = r.astype(jnp.int32)


def k_bf16_max(x_ref, o_ref):
    b = x_ref[:].astype(jnp.bfloat16)
    m = jnp.maximum(b, b * jnp.bfloat16(0.5))
    o_ref[:] = m.astype(jnp.int32)


def k_bf16_select(x_ref, o_ref):
    x = x_ref[:]
    b = x.astype(jnp.bfloat16)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    s = jnp.where(lane >= 5, b, jnp.bfloat16(-1.0))
    o_ref[:] = s.astype(jnp.int32)


def k_bf16_rowroll(x_ref, o_ref):
    b = x_ref[:].astype(jnp.bfloat16)
    r = pltpu.roll(b, 1, axis=0)
    o_ref[:] = r.astype(jnp.int32)


def k_i16_roll(x_ref, o_ref):
    b = x_ref[:].astype(jnp.int16)
    r = pltpu.roll(b, 1, axis=1)
    o_ref[:] = r.astype(jnp.int32)


def k_bf16_scan(x_ref, o_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    m = (x_ref[:] & 3) == 0
    neg1 = jnp.bfloat16(-1.0)
    s = jnp.where(m, neg1, lane.astype(jnp.bfloat16))
    sh = 1
    while sh < LANES:
        rolled = pltpu.roll(s, sh, axis=1)
        s = jnp.maximum(s, jnp.where(lane >= sh, rolled, neg1))
        sh *= 2
    o_ref[:] = s.astype(jnp.int32)


def main():
    log(f"backend={jax.default_backend()}")
    run("bf16_roll", k_bf16_roll)
    run("bf16_max", k_bf16_max)
    run("bf16_select", k_bf16_select)
    run("bf16_rowroll", k_bf16_rowroll)
    run("i16_roll", k_i16_roll)
    run("bf16_scan7", k_bf16_scan)


if __name__ == "__main__":
    main()
