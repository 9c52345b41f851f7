"""Stage ablation of the token-pass kernel (general-table multipass).

Timing protocol (the tunnel lesson, bench.py `force`): through the axon
tunnel `block_until_ready` does NOT guarantee device completion — every
timed sample is a K-chained jit (each iteration consumes the previous
output, so nothing hoists) whose return value is a TINY slice that is
read back with np.asarray, bounding the makespan of all K kernels.

Variants attribute the sweep cost:
  full      the real kernel (baseline)
  noscan    parity scan (_scan_max_linear) removed (starts := m)
  nolookup  cuckoo tree lookups removed (m := cheap bit test)
  noshift   neighbor shifts removed (nxt := d)
  copy      out := d (DMA floor)
plus rows_per_block {256, 512, 1024} on the full kernel, and chained
probes of the compaction primitives (sort_key_val, cumsum) under the
same protocol to cross-check exp_compact.py.

Usage: python tools/exp_mp_ablate.py
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from blt_tpu.utils.compcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from bench import make_corpus  # noqa: E402
from blt_tpu.merges import MergeTable  # noqa: E402
from blt_tpu.ops.bpe_pallas import (  # noqa: E402
    LANES,
    _NEG,
    PallasTokenEncoder,
    _scan_max_linear,
    _shift_left_linear,
    _shift_right_linear,
    _tree_lookup,
)

CAP = 8 * 1024 * 1024
REPS = 5
K = 8  # chained kernels per timed call


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_variant_kernel(variant: str):
    def kernel(params_ref, data_ref, halo_ref, k1_ref, v1_ref, k2_ref,
               v2_ref, out_ref, carry_ref):
        i = pl.program_id(0)
        length = params_ref[0]
        a1 = params_ref[1]
        a2 = params_ref[2]
        shift = params_ref[3]
        slots_mask = k1_ref.shape[0] * LANES - 1

        r = data_ref.shape[0]
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0)
        block = r * LANES
        block_start = i * block
        gidx = block_start + row_iota * LANES + lane_iota

        d = data_ref[:]
        if variant == "copy":
            out_ref[:] = d
            carry_ref[0] = 0
            return
        halo_fill = halo_ref[0:1, 0:1]
        if variant == "noshift":
            nxt = d
        else:
            nxt = _shift_left_linear(d, halo_fill, lane_iota)

        if variant == "nolookup":
            m = ((d ^ nxt) & 7) == 3
            val = d + 1
            m = m & (gidx < length - 1)
        else:
            p = d * 65536 + nxt
            h1 = ((p * a1) >> shift) & slots_mask
            h2 = ((p * a2) >> shift) & slots_mask
            e_k1 = _tree_lookup(k1_ref, h1)
            e_v1 = _tree_lookup(v1_ref, h1)
            e_k2 = _tree_lookup(k2_ref, h2)
            e_v2 = _tree_lookup(v2_ref, h2)
            hit1 = (e_k1 == p) & (e_v1 >= 0)
            hit2 = (e_k2 == p) & (e_v2 >= 0)
            val = jnp.where(hit1, e_v1, e_v2)
            m = (hit1 | hit2) & (gidx < length - 1)

        carry_in = jnp.where(i == 0, 0, carry_ref[0])
        if variant == "noscan":
            starts = m
        else:
            z = jnp.where(m, _NEG, gidx)
            lnm = _scan_max_linear(z, lane_iota)
            sentinel = block_start - 1 - carry_in
            lz = jnp.maximum(lnm, sentinel)
            starts = m & (((gidx - lz) & 1) == 1)

        starts_i = starts.astype(jnp.int32)
        consumed = _shift_right_linear(starts_i, carry_in, lane_iota) != 0
        tok = jnp.where(starts, val, d)
        out_ref[:] = jnp.where(consumed, -1, tok)

        last_pos = jnp.minimum(block_start + block - 1, length - 1)
        computed = jnp.sum(jnp.where(gidx == last_pos, starts_i, 0))
        carry_ref[0] = jnp.where(last_pos >= block_start, computed, carry_in)

    return kernel


def _one_call(params, data3, k1, v1, k2, v2, variant, rpb):
    total_rows = data3.shape[0] - 8
    num_blocks = total_rows // rpb
    return pl.pallas_call(
        make_variant_kernel(variant),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_blocks,),
            in_specs=[
                pl.BlockSpec((rpb, LANES), lambda i, params: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, LANES),
                             lambda i, params: ((i + 1) * rpb // 8, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rpb, LANES), lambda i, params: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        ),
        out_shape=jax.ShapeDtypeStruct((total_rows, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(params, data3, data3, k1, v1, k2, v2)


@functools.partial(jax.jit, static_argnames=("variant", "rpb", "k"))
def chained_call(params, data3, k1, v1, k2, v2, variant: str, rpb: int,
                 k: int):
    """K dependent kernel sweeps; returns a (1,1) makespan witness."""

    def body(d3, _):
        out = _one_call(params, d3, k1, v1, k2, v2, variant, rpb)
        # feed the output back (re-attach halo rows) so iterations chain
        d3n = jnp.concatenate([out, d3[-8:]], axis=0)
        return d3n, ()

    d3, _ = jax.lax.scan(body, data3, None, length=k)
    return d3[0:1, 0:1]


def timed(name, fn, results, per_call_elems=CAP, k=K):
    np.asarray(fn())  # compile + warm
    rates = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fn())
        rates.append((time.perf_counter() - t0) / k)
    med = sorted(rates)[len(rates) // 2]
    results[name] = {"ms": med * 1e3,
                     "melem_per_s": per_call_elems / med / 1e6}
    log(f"{name}: {med*1e3:.2f} ms ({per_call_elems/med/1e6:.0f} Melem/s)")


def main():
    results = {"backend": jax.default_backend(), "cap": CAP, "k": K}
    rng = np.random.default_rng(0)
    host = make_corpus(rng, CAP)
    hier = {(97, 98): 256, (256, 99): 257, (257, 257): 258, (32, 97): 259}
    table = MergeTable.build(hier)
    enc = PallasTokenEncoder(table, capacity_tokens=CAP)
    params = jnp.asarray(
        np.array([CAP, enc.a1, enc.a2, enc.shift, 0, 0, 0, 0], np.int32)
    )

    def probe_variant(name, variant, rpb):
        nb = CAP // (rpb * LANES)
        pr = nb * rpb + 8
        buf = np.zeros((pr * LANES,), np.int32)
        buf[: host.shape[0]] = host
        data3 = jnp.asarray(buf.reshape(pr, LANES))
        try:
            timed(
                name,
                lambda: chained_call(params, data3, enc.k1, enc.v1, enc.k2,
                                     enc.v2, variant=variant, rpb=rpb, k=K),
                results,
            )
        except Exception as exc:  # noqa: BLE001
            results[name] = {"error": f"{type(exc).__name__}: {str(exc)[:160]}"}
            log(f"{name}: FAILED {results[name]['error']}")

    probe_variant("full_512", "full", 512)
    probe_variant("noscan_512", "noscan", 512)
    probe_variant("nolookup_512", "nolookup", 512)
    probe_variant("noshift_512", "noshift", 512)
    probe_variant("copy_512", "copy", 512)
    probe_variant("full_256", "full", 256)
    probe_variant("full_1024", "full", 1024)

    # --- compaction primitives under the same chained protocol ---
    vals_d = jnp.asarray(host.astype(np.int32))
    iota = jnp.arange(CAP, dtype=jnp.int32)

    @functools.partial(jax.jit, static_argnames=("k",))
    def sort_chain(vals, k: int):
        def body(v, _):
            alive = (v & 7) != 3
            keys = jnp.where(alive, iota, CAP + iota)
            return jax.lax.sort_key_val(keys, v)[1], ()

        v, _ = jax.lax.scan(body, vals, None, length=k)
        return v[0:1]

    timed("sortkv_chain", lambda: sort_chain(vals_d, k=4), results, k=4)

    @functools.partial(jax.jit, static_argnames=("k",))
    def cumsum_chain(vals, k: int):
        def body(v, _):
            return jnp.cumsum(v & 1), ()

        v, _ = jax.lax.scan(body, vals, None, length=k)
        return v[0:1]

    timed("cumsum_chain", lambda: cumsum_chain(vals_d, k=K), results)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()


# --- appended: chained gap-kernel sweep probe (run as second main) ---
def main_gap():
    import functools as ft

    from blt_tpu.ops.bpe_pallas import _token_pass_gap_call

    results = {"backend": jax.default_backend(), "cap": CAP, "k": K}
    rng = np.random.default_rng(0)
    host = make_corpus(rng, CAP)
    hier = {(97, 98): 256, (256, 99): 257, (257, 257): 258, (32, 97): 259}
    table = MergeTable.build(hier)
    enc = PallasTokenEncoder(table, capacity_tokens=CAP)
    params = jnp.asarray(
        np.array([0, enc.a1, enc.a2, enc.shift, 0, 0, 0, 0], np.int32)
    )

    @ft.partial(jax.jit, static_argnames=("rpb", "k"))
    def gap_chain(data3, k1, v1, k2, v2, rpb: int, k: int):
        neg = jnp.full((8, 128), -1, jnp.int32)

        def body(d3, _):
            out = _token_pass_gap_call(params, d3, k1, v1, k2, v2,
                                       rows_per_block=rpb)
            return jnp.concatenate([out, neg], axis=0), ()

        d3, _ = jax.lax.scan(body, data3, None, length=k)
        return d3[0:1, 0:1]

    for rpb in (512, 1024):
        nb = CAP // (rpb * LANES)
        pr = nb * rpb + 8
        buf = np.full((pr * LANES,), -1, np.int32)
        buf[: host.shape[0]] = host
        data3 = jnp.asarray(buf.reshape(pr, LANES))

        def fn():
            return gap_chain(data3, enc.k1, enc.v1, enc.k2, enc.v2,
                             rpb=rpb, k=K)

        np.asarray(fn())
        rates = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(fn())
            rates.append((time.perf_counter() - t0) / K)
        med = sorted(rates)[len(rates) // 2]
        results[f"gapsweep_{rpb}"] = {"ms": med * 1e3,
                                      "melem_per_s": CAP / med / 1e6}
        log(f"gapsweep_{rpb}: {med*1e3:.2f} ms ({CAP/med/1e6:.0f} Melem/s)")

    # control: plain pass kernel under the identical chain
    for rpb in (512,):
        nb = CAP // (rpb * LANES)
        pr = nb * rpb + 8
        buf = np.full((pr * LANES,), -1, np.int32)
        buf[: host.shape[0]] = host
        data3 = jnp.asarray(buf.reshape(pr, LANES))

        def fn():
            return chained_call(params.at[0].set(CAP), data3, enc.k1,
                                enc.v1, enc.k2, enc.v2, variant="full",
                                rpb=rpb, k=K)

        np.asarray(fn())
        rates = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(fn())
            rates.append((time.perf_counter() - t0) / K)
        med = sorted(rates)[len(rates) // 2]
        results["plain_control_512"] = {"ms": med * 1e3}
        log(f"plain_control_512: {med*1e3:.2f} ms")

    print(json.dumps(results), flush=True)
