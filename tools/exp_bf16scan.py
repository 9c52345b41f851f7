"""Probe: does a bf16 phase-1 parity scan lower in Mosaic, and is it faster?

The flat kernel's intra-row max-scan runs 7 Hillis-Steele steps of
roll+select+max on int32 (R,128). Position parity equals lane parity
(blocks are even-sized), so the scan only needs each position's
last-non-match LANE (0..127, or -1 for none) — values exact in bf16,
which packs 2/lane on the VPU. This probes bf16 roll/max/select and
times a bf16-phase-1 variant against the int32 production scan.
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

from blt_tpu.ops.bpe_pallas import LANES, _NEG, _scan_max_linear
from blt_tpu.utils.compcache import enable_compilation_cache

RPB = 1024
N = 64 * 1024 * 1024
K = 64


def log(m):
    print(m, file=sys.stderr, flush=True)


def _scan_i32_kernel(m_ref, out_ref):
    r = m_ref.shape[0]
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0)
    i = pl.program_id(0)
    gidx = i * r * LANES + row_iota * LANES + lane_iota
    m = m_ref[:] != 0
    z = jnp.where(m, _NEG, gidx)
    lnm = _scan_max_linear(z, lane_iota)
    lz = jnp.maximum(lnm, -1)
    out_ref[:] = (m & (((gidx - lz) & 1) == 1)).astype(jnp.uint8)


def _scan_bf16_kernel(m_ref, out_ref):
    r = m_ref.shape[0]
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
    m = m_ref[:] != 0
    # phase 1: last non-match lane within the row prefix, bf16
    lane_bf = lane_iota.astype(jnp.bfloat16)
    neg1 = jnp.bfloat16(-1.0)
    s = jnp.where(m, neg1, lane_bf)
    sh = 1
    while sh < LANES:
        rolled = pltpu.roll(s, sh, axis=1)
        s = jnp.maximum(s, jnp.where(lane_iota >= sh, rolled, neg1))
        sh *= 2
    # phase 2: last row (exclusive) with any non-match, via the free
    # phase-1 byproduct s[:, -1] (last non-match lane of each full row)
    row_iota1 = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    row_any = s[:, LANES - 1 :] >= 0  # (R,1) bool
    row_val = jnp.where(row_any, row_iota1 * 2 + (s[:, LANES - 1 :].astype(jnp.int32) & 1), _NEG)
    excl = jnp.where(row_iota1 == 0, _NEG, pltpu.roll(row_val, 1, axis=0))
    sh = 1
    while sh < r:
        rolled = pltpu.roll(excl, sh, axis=0)
        excl = jnp.maximum(excl, jnp.where(row_iota1 >= sh, rolled, _NEG))
        sh *= 2
    # combine: lz parity = in-row s parity, else prior-row parity, else
    # sentinel parity (carry=0 here -> parity of -1 = 1)
    s_i = s.astype(jnp.int32)
    in_row = s_i >= 0
    prior = jnp.broadcast_to(excl, (r, LANES))
    lz_par = jnp.where(in_row, s_i & 1, prior & 1)
    covered = in_row | (prior != _NEG)
    sent_par = 1
    lz_par = jnp.where(covered, lz_par, sent_par)
    out_ref[:] = (m & (((lane_iota & 1) ^ lz_par) == 1)).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("which", "k"))
def chain(m2, which="i32", k=K):
    kern = _scan_i32_kernel if which == "i32" else _scan_bf16_kernel
    rows = m2.shape[0]
    x = m2
    for _ in range(k):
        x = pl.pallas_call(
            kern,
            grid=(rows // RPB,),
            in_specs=[pl.BlockSpec((RPB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((RPB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.uint8),
        )(x)
    return x


def main():
    enable_compilation_cache()
    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(7)
    rows = N // LANES
    m_host = (rng.random((rows, LANES)) < 0.3).astype(np.uint8)
    m2 = jax.device_put(m_host)

    ref = None
    for which in ("i32", "bf16"):
        try:
            t0 = time.perf_counter()
            out = np.asarray(chain(m2, which=which, k=1))
            log(f"{which}: compile+first {time.perf_counter() - t0:.2f}s")
            if ref is None:
                ref = out
            else:
                # NOTE: chained calls feed starts back in as m, so only
                # compare the k=1 output for exactness
                same = np.array_equal(ref, out)
                log(f"{which}: exact vs i32 = {same}")
                if not same:
                    bad = np.argwhere(ref != out)
                    log(f"  first mismatches {bad[:5].tolist()}")
            np.asarray(chain(m2, which=which))
            t0 = time.perf_counter()
            r = 3
            for _ in range(r):
                res = chain(m2, which=which)
            np.asarray(res)
            dt = time.perf_counter() - t0
            log(f"{which}: {N * K * r / dt / 1e9:.2f} Gelem/s scan-only chained")
        except Exception as exc:  # noqa: BLE001
            log(f"{which}: FAILED {type(exc).__name__}: {str(exc)[:300]}")


if __name__ == "__main__":
    main()
