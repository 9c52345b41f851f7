"""Packed-dense pair-lookup variant shootout (VERDICT r2 item 2).

The 50k-rule packed-dense path runs an occupancy-compressed VPU gather
chain at ~205/S GB/s (S = occupied first-byte segments; 256 for 50k
rules => 0.85 GB/s). This measures every non-chain lookup design that
could beat it, on real hardware, with exactness checks:

  pallas kernels:
    chain      - the current 256-segment select chain (baseline)
    g2d        - native 2D dynamic gather tbl[hi, lo] (one op if Mosaic
                 supports full-vreg gather)
    g2d_flat   - jnp.take on the flattened 32K-word table
    gax0       - take_along_axis along SUBLANES (probe: dst=tbl[hi[i,j],j])
    g8bit      - uint8 full-vreg gather probe (32x128 source)
  XLA (no pallas):
    xla_take   - jnp.take of the 64K u16 table (XLA's own gather lowering)
    mxu_bf16   - one-hot(a) @ dual-bf16-plane matmul + lane select of b
    mxu_int8   - same with int8 planes (offset -128) and int32 accum

Usage: python tools/exp_gather.py [--rows 4096] [--k 16] [--reps 3]
       [--only name,name] [--interpret]
Rates are GB/s of looked-up positions (1 lookup = 1 input byte analog).
"""

from __future__ import annotations

import argparse
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


def log(m):
    print(m, file=sys.stderr, flush=True)


def build_table(n_rules=50_000, seed=0):
    rng = np.random.default_rng(seed)
    pairs = rng.permutation(65536)[:n_rules]
    val16 = np.zeros(65536, np.uint16)
    val16[pairs] = (256 + np.arange(n_rules)) % 65536
    val16[pairs[val16[pairs] == 0]] = 256  # keep 0 = no-rule sentinel
    packed = (
        val16[1::2].astype(np.uint32) << 16 | val16[0::2].astype(np.uint32)
    ).astype(np.int32)  # word k: pairs 2k (lo half), 2k+1 (hi half)
    return val16, packed.reshape(256, LANES)


def ref_lookup(val16: np.ndarray, p: np.ndarray) -> np.ndarray:
    return val16[p].astype(np.int32)


# ---------- pallas kernel variants: p (R,128) int32 -> val (R,128) ----------

def _unpack(w, p):
    return jnp.where((p & 1) == 1, (w >> 16) & 0xFFFF, w & 0xFFFF)


def body_chain(tbl_ref, p):
    """Current production design: full 256-segment select chain."""
    h = p >> 1
    hi = h >> 7
    lo = h & (LANES - 1)
    r = p.shape[0]

    def step(k, acc):
        for u in range(8):
            idx = k * 8 + u
            seg = jnp.broadcast_to(tbl_ref[pl.ds(idx, 1), :], (r, LANES))
            g = jnp.take_along_axis(seg, lo, axis=1)
            acc = jnp.where(hi == idx, g, acc)
        return acc

    w = jax.lax.fori_loop(0, 32, step, jnp.zeros(p.shape, jnp.int32))
    return _unpack(w, p)


def body_g2d(tbl_ref, p):
    """Native 2D gather: per-element (sublane, lane) indices."""
    h = p >> 1
    w = tbl_ref[:][h >> 7, h & (LANES - 1)]
    return _unpack(w, p)


def body_g2d_flat(tbl_ref, p):
    h = p >> 1
    w = jnp.take(tbl_ref[:].reshape(-1), h)
    return _unpack(w, p)


def body_gax0(tbl_ref, p):
    """PROBE of sublane gather: dst[i,j] = tbl[hi[i,j], j] (not the real
    lookup; checked against its own reference)."""
    h = p >> 1
    return jnp.take_along_axis(tbl_ref[:], h >> 7, axis=0)


def body_g8bit(tbl8_ref, p):
    """PROBE: uint8 gather from a (32,128) source = 4096-entry table.
    dst[i,j] = src8[(q>>7)%32, q&127] via 2D index; checked vs numpy."""
    q = p & 4095
    w = tbl8_ref[:][(q >> 7) & 31, q & (LANES - 1)]
    return w.astype(jnp.int32)


def make_pallas(body, tbl, rows, k, interpret=False, rpb=512):
    tbl_d = jax.device_put(tbl)
    rpb = min(rpb, rows)
    assert rows % rpb == 0, (
        f"--rows must be a multiple of {rpb} (grid tail would be dropped)"
    )

    def kernel(tbl_ref, p_ref, out_ref):
        p = p_ref[:]
        v = body(tbl_ref, p)
        out_ref[:] = v

    call = functools.partial(
        pl.pallas_call,
        kernel,
        grid=(rows // rpb,),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        in_specs=[
            pl.BlockSpec(tbl.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rpb, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rpb, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )()

    @jax.jit
    def once(p):
        return call(tbl_d, p)

    @jax.jit
    def chained(p):
        def step(c, _):
            q = (p + (c & 1)) & 65535
            return call(tbl_d, q), ()

        c, _ = jax.lax.scan(step, p, None, length=k)
        return c

    return once, chained


# ---------- fused MXU variants (pallas): positions as (M,1) columns ----------

def make_pmxu(val16, rows, k, dtype="int8", tile=512, interpret=False):
    """Fused in-VMEM one-hot matmul lookup.

    Row-select on the MXU: onehot(a) (T,256) @ planes (256,512) -> the
    full 256-entry value row as lo/hi byte planes; b-select with the
    supported per-sublane lane gather (take_along_axis axis=1). Nothing
    larger than (T,512) is ever materialized.
    """
    lo = (val16 & 0xFF).astype(np.int32)
    hi = (val16 >> 8).astype(np.int32)
    if dtype == "int8":
        planes = np.concatenate(
            [lo.reshape(256, 256) - 128, hi.reshape(256, 256) - 128], axis=1
        ).astype(np.int8)
        cast = jnp.int8
        off = 128
    else:
        planes = np.concatenate(
            [lo.reshape(256, 256), hi.reshape(256, 256)], axis=1
        ).astype(jnp.bfloat16)
        cast = jnp.bfloat16
        off = 0
    planes_d = jax.device_put(planes)
    m_total = rows * LANES

    def kernel(planes_ref, a_ref, b_ref, out_ref):
        a = a_ref[:]  # (T,1) int32
        b = b_ref[:]
        iota = jax.lax.broadcasted_iota(jnp.int32, (tile, 256), 1)
        oh = (a == iota).astype(cast)
        r = jnp.dot(oh, planes_ref[:], preferred_element_type=jnp.float32
                    if dtype != "int8" else jnp.int32)
        if dtype != "int8":
            r = r.astype(jnp.int32)
        idx = jnp.broadcast_to(b & (LANES - 1), (tile, LANES))
        sel = (b >> 7) & 1  # which 128-lane half of the 256-col plane

        def pick(base):
            g0 = jnp.take_along_axis(r[:, base:base + 128], idx, axis=1)
            g1 = jnp.take_along_axis(r[:, base + 128:base + 256], idx, axis=1)
            return jnp.where(sel == 0, g0[:, 0:1], g1[:, 0:1])

        vlo = pick(0) + off
        vhi = pick(256) + off
        out_ref[:] = vhi * 256 + vlo

    call = functools.partial(
        pl.pallas_call,
        kernel,
        grid=(m_total // tile,),
        in_specs=[
            pl.BlockSpec((256, 512), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_total, 1), jnp.int32),
        interpret=interpret,
    )()

    def body(p):
        pf = p.reshape(m_total, 1)
        return call(planes_d, pf >> 8, pf & 255).reshape(p.shape)

    return _wrap_xla(body, k)


# ---------- XLA variants ----------

def make_xla_take(val16, rows, k):
    t_d = jax.device_put(val16.astype(np.int32))

    def body(p):
        return jnp.take(t_d, p)

    return _wrap_xla(body, k)


def make_mxu_bf16(val16, rows, k):
    lo = (val16 & 0xFF).astype(np.float32)
    hi = (val16 >> 8).astype(np.float32)
    # planes[c, 0:256] = lo values for second byte c? layout: plane[a, b]
    plo = lo.reshape(256, 256)
    phi = hi.reshape(256, 256)
    planes = np.concatenate([plo, phi], axis=1).astype(jnp.bfloat16)
    planes_d = jax.device_put(planes)
    iota = jnp.arange(256, dtype=jnp.int32)

    def body(p):
        a = p >> 8
        b = p & 255
        m = a.reshape(-1, 1)
        one = (m == iota.reshape(1, 256)).astype(jnp.bfloat16)
        r = jnp.dot(one, planes_d, preferred_element_type=jnp.float32)
        r = r.reshape(p.shape + (512,))
        bl = b[..., None]
        vlo = jnp.take_along_axis(r, bl, axis=-1)[..., 0]
        vhi = jnp.take_along_axis(r, bl + 256, axis=-1)[..., 0]
        return vhi.astype(jnp.int32) * 256 + vlo.astype(jnp.int32)

    return _wrap_xla(body, k)


def make_mxu_int8(val16, rows, k):
    lo = (val16 & 0xFF).astype(np.int32) - 128
    hi = (val16 >> 8).astype(np.int32) - 128
    planes = np.concatenate(
        [lo.reshape(256, 256), hi.reshape(256, 256)], axis=1
    ).astype(np.int8)
    planes_d = jax.device_put(planes)
    iota = jnp.arange(256, dtype=jnp.int32)

    def body(p):
        a = p >> 8
        b = p & 255
        one = (a.reshape(-1, 1) == iota.reshape(1, 256)).astype(jnp.int8)
        r = jnp.dot(one, planes_d, preferred_element_type=jnp.int32)
        r = r.reshape(p.shape + (512,))
        bl = b[..., None]
        vlo = jnp.take_along_axis(r, bl, axis=-1)[..., 0] + 128
        vhi = jnp.take_along_axis(r, bl + 256, axis=-1)[..., 0] + 128
        return vhi * 256 + vlo

    return _wrap_xla(body, k)


def _wrap_xla(body, k):
    once = jax.jit(body)

    @jax.jit
    def chained(p):
        def step(c, _):
            q = (p + (c & 1)) & 65535
            return body(q), ()

        c, _ = jax.lax.scan(step, p, None, length=k)
        return c

    return once, chained


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4096)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", default="")
    ap.add_argument("--tile", type=int, default=512,
                    help="pmxu positions per grid step")
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    enable_compilation_cache()
    log(f"backend={jax.default_backend()}")
    val16, packed = build_table()
    rng = np.random.default_rng(1)
    rows = args.rows
    p_np = rng.integers(0, 65536, (rows, LANES)).astype(np.int32)
    p_d = jax.device_put(p_np)
    want = ref_lookup(val16, p_np)

    tbl8 = (np.arange(4096, dtype=np.int64) * 2654435761 % 251).astype(
        np.uint8
    ).reshape(32, LANES)

    def check_gax0(got):
        h = p_np >> 1
        lanes = np.arange(LANES)[None, :]
        return np.array_equal(got, packed[(h >> 7) % 256, lanes])

    def check_g8(got):
        q = p_np & 4095
        return np.array_equal(got, tbl8[(q >> 7) & 31, q & 127].astype(np.int32))

    variants = {
        "chain": (lambda: make_pallas(body_chain, packed, rows, args.k,
                                      args.interpret),
                  lambda g: np.array_equal(g, want)),
        "g2d": (lambda: make_pallas(body_g2d, packed, rows, args.k,
                                    args.interpret),
                lambda g: np.array_equal(g, want)),
        "g2d_flat": (lambda: make_pallas(body_g2d_flat, packed, rows, args.k,
                                         args.interpret),
                     lambda g: np.array_equal(g, want)),
        "gax0": (lambda: make_pallas(body_gax0, packed, rows, args.k,
                                     args.interpret), check_gax0),
        "g8bit": (lambda: make_pallas(body_g8bit, tbl8, rows, args.k,
                                      args.interpret), check_g8),
        "pmxu_i8": (lambda: make_pmxu(val16, rows, args.k, "int8",
                                      tile=args.tile,
                                      interpret=args.interpret),
                    lambda g: np.array_equal(g, want)),
        "pmxu_bf16": (lambda: make_pmxu(val16, rows, args.k, "bf16",
                                        tile=args.tile,
                                        interpret=args.interpret),
                      lambda g: np.array_equal(g, want)),
        "xla_take": (lambda: make_xla_take(val16, rows, args.k),
                     lambda g: np.array_equal(g, want)),
        "mxu_bf16": (lambda: make_mxu_bf16(val16, rows, args.k),
                     lambda g: np.array_equal(g, want)),
        "mxu_int8": (lambda: make_mxu_int8(val16, rows, args.k),
                     lambda g: np.array_equal(g, want)),
    }
    only = [s for s in args.only.split(",") if s]
    results = {}
    for name, (make, check) in variants.items():
        if only and name not in only:
            continue
        try:
            once, chained = make()
            t0 = time.perf_counter()
            got = np.asarray(once(p_d))
            log(f"{name}: compile+first {time.perf_counter() - t0:.2f}s")
            ok = check(got)
            log(f"{name}: exact={ok}")
            if not ok:
                results[name] = {"exact": False}
                continue
            np.asarray(chained(p_d))  # compile chained
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = chained(p_d)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            n = rows * LANES * args.k * args.reps
            rate = n / dt
            log(f"{name}: {rate / 1e9:.3f} G lookups/s")
            results[name] = {"exact": True, "rate": rate}
        except Exception as e:
            log(f"{name} FAILED: {type(e).__name__}: {str(e)[:400]}")
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
