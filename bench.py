"""Benchmark: tokenization bytes/sec/chip (basic + flat BPE device kernels).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "bytes/s", "vs_baseline": N, ...}

Baseline: the reference's best published number, ~2.6 GB/s end-to-end on a
CPU dev machine in passthrough mode (reference README.md:274-278; it
publishes no basic/BPE numbers — see BASELINE.md). The headline value here
is the geometric mean of basic-mode and BPE-mode steady-state device
throughput on one chip, i.e. real tokenization work, not passthrough.

BPE runs the Pallas kernel (blt_tpu/ops/bpe_pallas.py): cuckoo-hashed rule
lookup via 128-lane dynamic_gather trees + two-phase parity scan, exact
reference semantics.

Methodology: device-resident input (the feeder pipeline overlaps host I/O;
this measures the compute ceiling per chip). Each timed jit call chains K
kernel invocations back-to-back on-device via lax.scan, with each
iteration consuming the previous one's carry/token — this is the
steady-state dispatch shape for large streams and removes per-dispatch
host overhead from the measurement (through the axon tunnel a single
dispatch costs ~3 ms of host time, which at 64MB/dispatch would understate
device throughput up to 10x; measured floor: a raw u8 HBM copy kernel runs
at ~228 GB/s device-chained vs ~15 GB/s dispatch-bound). Chain lengths are
sized per mode to keep dispatch <5% of each timed call.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REFERENCE_BASELINE_BYTES_PER_SEC = 2.6e9
N = 64 * 1024 * 1024  # 64MB device batches
# kernels chained per jit call, sized so the ~3ms per-dispatch tunnel
# overhead stays <5% of each call's device time for that mode's rate
K_BASIC = 96
K_BPE = 24
REPS = 5  # timed samples (median + IQR)
# chained calls per timed sample: a sample must end with a D2H sync
# (force) for honest timing, and the tunnel's ~4ms dispatch RTT would
# otherwise eat ~10% of a single ~40ms call — grouping keeps the sync
# cost <4% while per-sample medians stay robust
INNER_BASIC = 3
INNER_BPE = 2
E2E_REPS = 3  # steady-state file->file reps (each ~20s on a healthy link)
RULES = 500
BASIC_RPB = 2048
BPE_RPB = 1024


def rate_stats(rates) -> dict:
    """Median + dispersion over per-rep rates (bytes/s). Medians make the
    headline robust to single-rep link/scheduler hiccups; the recorded
    IQR makes run-to-run regression comparisons trustworthy (the
    reference's analog: Criterion sample_size=10,
    reference benches/pipeline_benchmark.rs:26)."""
    r = np.asarray(sorted(rates), dtype=np.float64)
    q1, med, q3 = np.percentile(r, [25, 50, 75])
    return {
        "median": float(med),
        "iqr": float(q3 - q1),
        "min": float(r[0]),
        "max": float(r[-1]),
        "n": int(r.size),
    }


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


_BASE = None
_BASE_CACHE = os.path.expanduser("~/.cache/blt_tpu_bench_corpus.npy")


def make_corpus(rng, n):
    """Zipf-ish text bytes; built once at 4MB, cached on disk, and
    tiled+rotated (host RAM bandwidth on the bench VM makes fresh 64MB
    sampling prohibitively slow; the kernel is content-oblivious so tiling
    does not skew throughput)."""
    global _BASE
    base_n = 4 * 1024 * 1024
    if _BASE is None:
        if os.path.exists(_BASE_CACHE):
            _BASE = np.load(_BASE_CACHE)
        else:
            alphabet = np.frombuffer(
                b"etaoinshrdlucmfwypvbgkjqxz ETAOIN,.;:'\"!?0123456789",
                np.uint8,
            )
            weights = 1.0 / np.arange(1, len(alphabet) + 1)
            _BASE = rng.choice(
                alphabet, size=base_n, p=weights / weights.sum()
            ).astype(np.uint8)
            try:
                os.makedirs(os.path.dirname(_BASE_CACHE), exist_ok=True)
                np.save(_BASE_CACHE, _BASE)
            except OSError:
                pass
    reps = -(-n // base_n)
    shift = int(rng.integers(0, base_n))
    return np.roll(np.tile(_BASE, reps)[:n], shift)


def run_canary_phase() -> dict:
    """Toolchain canary (docs/CONFORMANCE.md): re-probe the two Mosaic
    ops blocking the flat-scan 1.6x, in a SUBPROCESS so a compiler crash
    or hang cannot take the bench down, and sequentially BEFORE this
    process initializes its own TPU client (never two tunnel clients)."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "canary_16bit.py")],
            capture_output=True, text=True, timeout=600,
        )
        return json.loads(proc.stdout.strip().splitlines()[-1])
    except Exception as e:  # noqa: BLE001 - canary must never kill bench
        return {"error": f"{type(e).__name__}: {str(e)[:200]}"}


def run_1gb_phase() -> dict:
    """The reference's largest bench workload (1GB,
    reference benches/pipeline_benchmark.rs:84-110) through the REAL CLI
    in subprocesses, all three modes, with a TIGHT --memcap 2 so the
    recorded peak RSS is a meaningful streaming-contract gate
    (VERDICT r4 item 4). Runs before this process opens its own TPU
    client. BLT_BENCH_1GB=0 skips."""
    import subprocess
    import tempfile

    from blt_tpu.utils import sysinfo

    if os.environ.get("BLT_BENCH_1GB", "1") == "0":
        return {"skipped": "BLT_BENCH_1GB=0"}
    out: dict = {"memcap_percent": 2}
    budget = int(sysinfo.total_memory_bytes() * 0.02)
    out["memcap_budget_bytes"] = budget
    size = 1024 * 1024 * 1024
    rng = np.random.default_rng(0)
    base = make_corpus(rng, 4 * 1024 * 1024)
    deadline = time.monotonic() + 900
    try:
        with tempfile.TemporaryDirectory() as td:
            ip = os.path.join(td, "in1g.bin")
            with open(ip, "wb") as f:
                for _ in range(size // base.nbytes):
                    f.write(base.tobytes())
            mp = os.path.join(td, "m.txt")
            with open(mp, "w") as f:
                for a, b in [(101, 116), (116, 97), (97, 111), (32, 101)]:
                    f.write(f"{a} {b}\n")
            wrapper = (
                "import resource,subprocess,sys,json,time;"
                "t0=time.perf_counter();"
                "p=subprocess.run(sys.argv[1:]);"
                "ru=resource.getrusage(resource.RUSAGE_CHILDREN);"
                "print(json.dumps({'rc':p.returncode,"
                "'seconds':time.perf_counter()-t0,"
                "'maxrss_bytes':ru.ru_maxrss*1024}))"
            )
            # bpe before basic: if link weather burns the phase budget,
            # the more informative leg (packed D2H + merges at scale)
            # records before the plain widen does
            for mode in ("passthrough", "bpe", "basic"):
                if time.monotonic() > deadline:
                    out[mode] = {"skipped": "phase time budget exhausted"}
                    continue
                op = os.path.join(td, f"out_{mode}.bin")
                cmd = [sys.executable, "-c", wrapper, sys.executable,
                       "-m", "blt_tpu.cli", "-i", ip, "-o", op,
                       "--memcap", "2"]
                if mode == "passthrough":
                    cmd.append("--passthrough")
                elif mode == "bpe":
                    cmd += ["--merges", mp]
                try:
                    proc = subprocess.run(
                        cmd, capture_output=True, text=True, timeout=540,
                    )
                    rec = json.loads(proc.stdout.strip().splitlines()[-1])
                except Exception as e:  # noqa: BLE001
                    out[mode] = {
                        "error": f"{type(e).__name__}: {str(e)[:200]}"
                    }
                    continue
                rec["bytes_per_sec"] = size / rec["seconds"]
                rec["rss_within_memcap"] = rec["maxrss_bytes"] <= budget
                # exactness gates (prefix/sample; full-file oracle would
                # dominate the phase budget)
                osize = os.path.getsize(op)
                if mode == "passthrough":
                    with open(op, "rb") as f:
                        head = f.read(1 << 20)
                        f.seek(-(1 << 20), 2)
                        tail = f.read()
                    rec["exact"] = (
                        osize == size
                        and head == base.tobytes()[: 1 << 20]
                        and tail == base.tobytes()[-(1 << 20):]
                    )
                elif mode == "basic":
                    with open(op, "rb") as f:
                        head = np.frombuffer(f.read(2 << 20), ">u2")
                    rec["exact"] = (
                        osize == 2 * size
                        and bool(
                            (head == base[: 1 << 20].astype(np.uint16)).all()
                        )
                    )
                else:
                    from blt_tpu.merges import (
                        MergeTable,
                        load_bpe_merges_from_path,
                    )
                    from blt_tpu.ops.bpe_numpy import bpe_encode_flat

                    table = MergeTable.build(load_bpe_merges_from_path(mp))
                    exp = bpe_encode_flat(base, table)
                    with open(op, "rb") as f:
                        got = np.frombuffer(
                            f.read(2 * exp.size), ">u2"
                        ).astype(np.int64)
                    k = exp.size - 2  # trim the prefix-edge straddle
                    rec["exact"] = bool((got[:k] == exp[:k]).all())
                out[mode] = rec
                log(f"1gb {mode}: {rec['bytes_per_sec']/1e6:.1f} MB/s, "
                    f"maxrss {rec['maxrss_bytes']/2**20:.0f} MiB "
                    f"(within memcap: {rec['rss_within_memcap']}), "
                    f"exact={rec.get('exact')}")
    except Exception as e:  # noqa: BLE001 - never lose the bench
        out["error"] = f"{type(e).__name__}: {str(e)[:200]}"
    return out


def main() -> None:
    canary = run_canary_phase()
    log(f"toolchain canary: {canary}")
    bench_1gb = run_1gb_phase()

    import jax
    import jax.numpy as jnp

    from blt_tpu.merges import MergeTable
    from blt_tpu.ops.bpe_pallas import (
        LANES,
        PallasFlatEncoder,
        basic_encode_chained,
        filter_slots,
        flat_encode_chained,
    )
    from blt_tpu.ops.bpe_numpy import bpe_encode_flat
    from blt_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    backend = jax.default_backend()
    log(f"backend={backend} devices={jax.devices()}")

    rng = np.random.default_rng(0)
    log("generating corpus...")
    host = make_corpus(rng, N)

    # merge table: top frequent byte pairs of the corpus sample
    sample = host[: 4 * 1024 * 1024]
    pairs, counts = np.unique(
        sample[:-1].astype(np.int32) * 256 + sample[1:].astype(np.int32),
        return_counts=True,
    )
    top = pairs[np.argsort(-counts)][:RULES]
    merges = {(int(p) // 256, int(p) % 256): 256 + i for i, p in enumerate(top)}
    table = MergeTable.build(merges)
    assert table.flat

    def force(small):
        # A D2H read of a kernel's tiny SMEM output guarantees device
        # completion through the axon tunnel (block_until_ready alone does
        # not). Chained calls execute in order, so forcing the last call's
        # token bounds the makespan of all of them.
        np.asarray(small)

    # --- basic mode: K widen kernels chained on-device per jit call ---
    rows = N // LANES
    log("uploading basic buffer...")
    buf0 = jax.device_put(host.reshape(rows, LANES))
    tok0 = jax.device_put(np.zeros((1, 1), np.int32))
    t0 = time.perf_counter()
    out, tok = basic_encode_chained(buf0, tok0, k=K_BASIC, rows_per_block=BASIC_RPB)
    force(tok)
    log(f"basic compile+first: {time.perf_counter()-t0:.2f}s")
    out, tok = basic_encode_chained(buf0, tok0, k=K_BASIC, rows_per_block=BASIC_RPB)
    force(tok)
    basic_rates = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(INNER_BASIC):
            out, tok = basic_encode_chained(
                buf0, tok0, k=K_BASIC, rows_per_block=BASIC_RPB
            )
        force(tok)
        basic_rates.append(
            N * K_BASIC * INNER_BASIC / (time.perf_counter() - t0)
        )
    basic_stats = rate_stats(basic_rates)
    basic_bps = basic_stats["median"]
    del out, tok, buf0
    log(f"basic: {basic_bps/1e9:.2f} GB/s "
        f"(IQR {basic_stats['iqr']/1e9:.2f}, n={REPS})")

    # --- flat BPE (Pallas kernel), K carry-chained kernels per jit call ---
    enc = PallasFlatEncoder(table, capacity_bytes=N, rows_per_block=BPE_RPB)
    num_blocks = N // enc.block
    padded_rows = num_blocks * enc.rows_per_block + 8

    def to_d3(h):
        buf = np.zeros((padded_rows * LANES,), np.uint8)
        buf[:N] = h
        return jax.device_put(buf.reshape(padded_rows, LANES))

    params = enc.params(N)
    log("uploading bpe buffer...")
    d3 = to_d3(host)
    zero_carry = jax.device_put(np.zeros((1, 1), np.int32))

    def run_bpe():
        return flat_encode_chained(
            params,
            enc.segs,
            zero_carry,
            d3,
            enc.e1,
            enc.e2,
            k=K_BPE,
            mode=enc.mode,
            rows_per_block=enc.rows_per_block,
        )

    t0 = time.perf_counter()
    slots, carry = run_bpe()
    force(carry)
    log(f"bpe compile+first: {time.perf_counter()-t0:.2f}s")
    slots, carry = run_bpe()
    force(carry)
    bpe_rates = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(INNER_BPE):
            slots, carry = run_bpe()
        force(carry)
        bpe_rates.append(N * K_BPE * INNER_BPE / (time.perf_counter() - t0))
    bpe_stats = rate_stats(bpe_rates)
    bpe_bps = bpe_stats["median"]
    log(f"bpe: {bpe_bps/1e9:.2f} GB/s "
        f"(IQR {bpe_stats['iqr']/1e9:.2f}, n={REPS})")

    # correctness spot check vs the NumPy engine on a 4MB prefix (the last
    # couple of tokens at the cut may straddle the prefix edge)
    m = 4 * 1024 * 1024
    slots_prefix = np.asarray(slots).reshape(-1)[:m]
    toks_be, _ = filter_slots(slots_prefix, 0)
    toks = np.frombuffer(bytes(toks_be), ">u2").astype(np.int64)
    exp_prefix = bpe_encode_flat(host[:m], table)
    k = min(len(toks), len(exp_prefix)) - 2
    exact = toks[:k].tolist() == exp_prefix[:k].tolist()
    log(f"bpe prefix-exactness: {exact}")
    del slots, carry, d3

    # --- Extra recorded sections (fail-soft: the headline metric must
    # print even if an extra section breaks or is killed mid-way on a
    # fresh machine; each section updates `extras` incrementally) ---
    exact_full = {}
    extras = {
        "exact_full_chained_vs_host": exact_full,
        "packed_dense_50k_bytes_per_sec": None,
        "e2e_file_to_file": {},
        "interconnect_roofline": None,
    }

    def run_extras():
        # --- FULL exactness on real hardware: chained batches, whole output,
        # all three kernel paths (cuckoo / packed-dense / multipass) vs the
        # host reference with explicit carries ---
    
        def full_check(name, tbl, batch_mb, force_mode=None, expect_mode=None):
            from blt_tpu.ops.bpe_numpy import bpe_encode_flat_carry

            nb_ = batch_mb * 1024 * 1024
            encN = PallasFlatEncoder(
                tbl,
                capacity_bytes=nb_,
                rows_per_block=BPE_RPB,
                force_mode=force_mode,
            )
            if expect_mode is not None:
                assert encN.mode == expect_mode, (encN.mode, expect_mode)
            b1 = host[:nb_].copy()
            b2 = np.roll(host, 1_000_003)[:nb_]  # distinct second batch
            # sprinkle FF FF runs: text corpora never produce them, and the
            # pair (255,255) is the cuckoo empty-slot key-half collision
            # (bpe_pallas.py kernel hit check) — keep it covered on hardware
            b1[4096:4104] = 255
            s1, _, c1 = encN.encode(b1, False, int(b2[0]))
            s2, _, c2 = encN.encode(b2, c1, -1)
            t1, prev = filter_slots(np.asarray(s1).reshape(-1)[:nb_], 0)
            t2, _ = filter_slots(np.asarray(s2).reshape(-1)[:nb_], prev)
            got = np.frombuffer(bytes(t1) + bytes(t2), ">u2").astype(np.int64)
            e1, ca = bpe_encode_flat_carry(b1, tbl, False, int(b2[0]))
            e2, _ = bpe_encode_flat_carry(b2, tbl, ca, -1)
            expected = np.concatenate([e1, e2])
            ok = got.shape == expected.shape and bool((got == expected).all())
            log(f"exact_full[{name}] ({2*batch_mb}MB chained): {ok}")
            exact_full[name] = ok
            return encN

        # every kernel lookup mode certified on hardware: chd is what the
        # selector picks for the 500-rule table, cuckoo is the forced
        # fallback placement of the same table, perfect is a tiny table's
        # displacement-free hash, packed_dense the 50k direct chain below
        full_check("chd", table, 64, expect_mode="chd")
        full_check("cuckoo", table, 16, force_mode="cuckoo")
        tiny = MergeTable.build(
            {(int(p) // 256, int(p) % 256): 256 + i for i, p in enumerate(top[:12])}
        )
        full_check("perfect", tiny, 16, expect_mode="perfect")

        # packed-dense path: >8K rules forces the direct kernel
        rngd = np.random.default_rng(1)
        dense_pairs = rngd.permutation(65536)[:50_000]
        dense_merges = {
            (int(p) // 256, int(p) % 256): 256 + i
            for i, p in enumerate(dense_pairs)
        }
        dense_table = MergeTable.build(dense_merges)
        enc_dense = full_check("packed_dense", dense_table, 16)
        assert enc_dense.direct

        # packed-dense steady-state rate (chained dispatch, same protocol)
        nd = 16 * 1024 * 1024
        num_blocks = nd // enc_dense.block
        padded_rows = num_blocks * enc_dense.rows_per_block + 8
        bufd = np.zeros((padded_rows * LANES,), np.uint8)
        bufd[:nd] = host[:nd]
        d3d = jax.device_put(bufd.reshape(padded_rows, LANES))
        paramsd = enc_dense.params(nd)
        zcd = jax.device_put(np.zeros((1, 1), np.int32))

        def run_dense():
            return flat_encode_chained(
                paramsd, enc_dense.segs, zcd, d3d, enc_dense.e1, enc_dense.e2,
                k=K_BPE, mode="direct", rows_per_block=enc_dense.rows_per_block,
            )

        _, cd = run_dense()
        force(cd)
        dense_rates = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            _, cd = run_dense()
            force(cd)
            dense_rates.append(nd * K_BPE / (time.perf_counter() - t0))
        dense_stats = rate_stats(dense_rates)
        dense_bps = dense_stats["median"]
        extras["packed_dense_rate_stats"] = dense_stats
        log(f"packed-dense (50k rules): {dense_bps/1e9:.2f} GB/s "
            f"(IQR {dense_stats['iqr']/1e9:.2f})")

        # multipass token kernel (hierarchical table) vs the host oracle
        from blt_tpu.ops.bpe_numpy import bpe_encode_multipass
        from blt_tpu.ops.bpe_pallas import PallasTokenEncoder

        hier = {(97, 98): 256, (256, 99): 257, (257, 257): 258, (32, 97): 259}
        hier_table = MergeTable.build(hier)
        enc_tok = PallasTokenEncoder(hier_table, capacity_tokens=8 * 1024 * 1024)
        chunk = host[: 8 * 1024 * 1024]
        got_mp = enc_tok.encode(chunk)
        exp_mp = bpe_encode_multipass(chunk, hier_table)
        okm = got_mp.shape == exp_mp.shape and bool((got_mp == exp_mp).all())
        log(f"exact_full[multipass] (8MB): {okm}")
        exact_full["multipass"] = okm

        # device-resident multipass rate: the repeat-until-done loop runs
        # entirely on device. Default = the gap-tolerant loop (tombstone
        # runs skipped in place; sort only every 3rd round) with the
        # fused wire emission — the production dispatch. The pre-r5
        # sort-every-pass loop is timed as a control.
        got_res = enc_tok.encode_resident(chunk)
        okr = got_res.shape == exp_mp.shape and bool((got_res == exp_mp).all())
        log(f"exact_full[multipass_resident] (8MB): {okr}")
        exact_full["multipass_resident"] = okr
        from blt_tpu.ops.bpe_pallas import (
            _multipass_gap_wire_call,
            _multipass_resident_call,
            _padded_rows as _pr_mp,
            expand_gap_wire_host,
        )

        cap = enc_tok.capacity
        pr = _pr_mp(cap, enc_tok.block, enc_tok.rows_per_block)
        hp = jnp.asarray(
            [enc_tok.a1, enc_tok.a2, enc_tok.shift], jnp.int32
        )
        args_mp = dict(capacity=cap, interpret=False,
                       rows_per_block=enc_tok.rows_per_block)
        n_d = jnp.int32(chunk.shape[0])

        bufg = np.full((cap,), -1, np.int32)  # gap contract: -1 padding
        bufg[: chunk.shape[0]] = chunk
        bufg_d = jnp.asarray(bufg)

        def gap_call():
            return _multipass_gap_wire_call(
                bufg_d, n_d, hp, enc_tok.k1, enc_tok.v1,
                enc_tok.k2, enc_tok.v2, **args_mp)

        wire_d, mg = gap_call()
        toks_w = expand_gap_wire_host(np.asarray(wire_d), cap)
        okw = (
            toks_w.shape[0] == int(mg)
            and toks_w.tobytes()
            == np.asarray(exp_mp, np.uint16).astype(">u2").tobytes()
        )
        log(f"exact_full[multipass_gap_wire] (8MB): {okw}")
        exact_full["multipass_gap_wire"] = okw
        mp_rates = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            for _ in range(5):  # ~15ms/loop: amortize the sync RTT
                w, m = gap_call()
            int(np.asarray(m))  # forces all queued loops (in-order exec)
            mp_rates.append(5 * chunk.shape[0] / (time.perf_counter() - t0))
        mp_stats = rate_stats(mp_rates)
        mp_bps = mp_stats["median"]
        extras["multipass_resident_bytes_per_sec"] = mp_bps
        extras["multipass_resident_rate_stats"] = mp_stats
        log(f"multipass device-resident gap loop (hierarchical, 8MB): "
            f"{mp_bps/1e6:.1f} MB/s")

        # the shard_map-wrapped gap loop COMPILED on hardware (the
        # dryrun certifies it in interpret mode only): 1-device mesh,
        # same code path as a real multi-chip run
        from blt_tpu.ops.bpe_pallas import ShardedTokenEncoder
        from blt_tpu.parallel.mesh import make_mesh

        mesh1 = make_mesh(jax.devices()[:1])
        enc_sh = ShardedTokenEncoder(
            hier_table, mesh1, capacity_tokens=1 << 20
        )
        chunk_sh = host[: 1 << 20]
        got_sh = enc_sh.encode_batch_resident_wire([chunk_sh])[0]
        exp_sh = bpe_encode_multipass(chunk_sh, hier_table)
        oksh = (
            got_sh.tobytes()
            == np.asarray(exp_sh, np.uint16).astype(">u2").tobytes()
        )
        log(f"exact_full[multipass_sharded_gap] (1MB, shard_map): {oksh}")
        exact_full["multipass_sharded_gap"] = oksh

        # control: the sort-every-pass loop (pre-r5 shape)
        bufm = np.zeros((pr * 128,), np.int32)
        bufm[: chunk.shape[0]] = chunk
        bufm_d = jnp.asarray(bufm)

        def sort_call():
            return _multipass_resident_call(
                bufm_d, n_d, hp, enc_tok.k1, enc_tok.v1,
                enc_tok.k2, enc_tok.v2, **args_mp)

        sort_call()
        sort_rates = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            for _ in range(2):
                o, m = sort_call()
            int(np.asarray(m))
            sort_rates.append(2 * chunk.shape[0] / (time.perf_counter() - t0))
        sort_stats = rate_stats(sort_rates)
        extras["multipass_resident_sortloop_bytes_per_sec"] = (
            sort_stats["median"]
        )
        extras["multipass_resident_sortloop_rate_stats"] = sort_stats
        log(f"multipass sort-loop control (8MB): "
            f"{sort_stats['median']/1e6:.1f} MB/s")

        # the pure-XLA device paths (the Pallas fallbacks and the
        # BLT_MULTIPASS=xla mode) on REAL hardware, vs the host oracle
        from blt_tpu.ops import bpe_jax

        nx = 4 * 1024 * 1024
        hx = host[:nx].copy()
        hx[2048:2052] = 255  # cover the FF-FF pair here too
        dev = jnp.asarray(hx)
        toksx, countx, _, _ = bpe_jax.flat_encode(
            dev, jnp.int32(nx), jnp.asarray(table.dense),
            jnp.asarray(False), jnp.int32(-1),
        )
        gotx = np.asarray(toksx)[: int(countx)].astype(np.int64)
        expx = bpe_encode_flat(hx, table).astype(np.int64)
        okx = gotx.shape == expx.shape and bool((gotx == expx).all())
        log(f"exact_full[xla_flat] (4MB): {okx}")
        exact_full["xla_flat"] = okx

        from blt_tpu.ops.bpe_numpy import bpe_encode_multipass as mp_host

        keysx, valsx = bpe_jax.sparse_table_device(hier_table)
        toksx, countm = bpe_jax.multipass_encode(
            jnp.asarray(hx[: 1 << 20]), jnp.int32(1 << 20), keysx, valsx
        )
        gotm = np.asarray(toksx)[: int(countm)]
        expm = mp_host(hx[: 1 << 20], hier_table)
        okxm = gotm.shape == expm.shape and bool((gotm == expm).all())
        log(f"exact_full[xla_multipass] (1MB): {okxm}")
        exact_full["xla_multipass"] = okxm

        # --- halo-sharded engine adversarial leg ON HARDWARE: corpora
        # biased to >=HALO all-match runs straddling slab/batch boundaries,
        # so the degenerate XLA fallback and the packed<->XLA emission
        # bridges (engines._bpe_flat_halo_stream) run compiled, not just
        # in interpret mode. A 1-device mesh exercises the identical code
        # path (slab sequencing, halo_converges routing, carry bridging).
        from blt_tpu.ops.bpe_pallas import ShardedFlatEncoder
        from blt_tpu.parallel.mesh import make_mesh
        from blt_tpu.pipeline.engines import ShardedJaxEngine

        mesh1 = make_mesh(jax.devices()[:1])
        eng_h = ShardedJaxEngine(mesh=mesh1)
        cap_h = 256 * 1024
        # self-pair rule (97,97): a run of 'a's is an unbroken all-match
        # region of any length — the degenerate case for halo convergence
        table_h = MergeTable.build(
            {(97, 97): 256, (97, 98): 257, (98, 99): 258, (32, 97): 259}
        )
        enc_h = ShardedFlatEncoder(table_h, mesh1, capacity_bytes=cap_h,
                                   rows_per_block=BPE_RPB)
        hint_h = enc_h.payload * enc_h.n_rows
        rngh = np.random.default_rng(7)
        pieces = []
        for i in range(6):
            pieces.append(make_corpus(rngh, hint_h // 2))
            # >=HALO all-match runs with varying parity -> pending carries
            # straddling slab AND batch boundaries
            pieces.append(
                np.full(4 * enc_h.HALO + (i % 3), 97, np.uint8)
            )
        adv = np.concatenate(pieces)
        chunks_h = [adv[i : i + hint_h] for i in range(0, adv.shape[0], hint_h)]
        wire_h = b"".join(
            bytes(x)
            for x in eng_h._bpe_flat_halo_stream(
                iter(chunks_h), table_h, enc_h, hint_h
            )
        )
        exp_h = bpe_encode_flat(adv, table_h)
        got_h = np.frombuffer(wire_h, ">u2").astype(np.int64)
        okh = got_h.tolist() == exp_h.tolist()
        log(f"exact_full[halo_adversarial] ({adv.size} bytes, "
            f"{len(chunks_h)} batches): {okh}")
        exact_full["halo_adversarial"] = okh

        # --- end-to-end file->file through the real pipeline (device engine)
        # + the interconnect roofline that bounds it on this machine ---
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from benches.pipeline_benchmark import make_file, measure_roofline, run_once

        roofline = measure_roofline()
        log(f"roofline: {roofline}")
        e2e = {}
        import tempfile

        from blt_tpu.config import Engine

        with tempfile.TemporaryDirectory() as td:
            ip = os.path.join(td, "in.bin")
            op = os.path.join(td, "out.bin")
            mp = os.path.join(td, "m.txt")
            size = 100 * 1024 * 1024
            make_file(ip, size)
            with open(mp, "w") as f:
                for a, b in [(101, 116), (116, 97), (97, 111), (32, 101)]:
                    f.write(f"{a} {b}\n")
            from blt_tpu.pipeline import feeder as _feeder

            from benches.pipeline_benchmark import probe_link_rates

            for mode in ("basic", "bpe"):
                # first run = compile + warm-up; then E2E_REPS steady-state
                # reps timed individually (the tunnel's bandwidth swings
                # minute to minute — a single warm sample can under-read
                # 2-3x; the median + recorded dispersion make run-to-run
                # comparisons trustworthy). A link-capacity probe is
                # INTERLEAVED around every rep: each rep's bound comes
                # from its adjacent probes, so the efficiency number uses
                # the link weather DURING that rep's window, not a stale
                # pre-run probe (r4's efficiency > 1.0 artifact).
                _feeder.stage_stats(reset=True)
                dt_first = run_once(ip, op, mode, Engine.JAX, mp)
                dts, occs = [], []
                probes = [probe_link_rates()]
                for _ in range(E2E_REPS):
                    _feeder.stage_stats(reset=True)
                    dts.append(run_once(ip, op, mode, Engine.JAX, mp))
                    occs.append(_feeder.stage_stats(reset=True))
                    probes.append(probe_link_rates())
                stats = rate_stats([size / d for d in dts])
                rate = stats["median"]
                dt = size / rate
                # occupancy of the median rep (stall attribution should
                # describe the quoted number, not the best or worst rep)
                occupancy = occs[dts.index(sorted(dts)[len(dts) // 2])]
                e2e[f"{mode}_100mb_bytes_per_sec"] = rate
                e2e[f"{mode}_100mb_rate_stats"] = stats
                e2e[f"{mode}_100mb_first_run_bytes_per_sec"] = size / dt_first
                e2e[f"{mode}_100mb_compile_overhead_s"] = dt_first - dt
                e2e[f"{mode}_stage_occupancy"] = occupancy
                # the end-to-end ceiling on THIS machine: the input crosses
                # the link once and r_d2h x input crosses back. For basic
                # r_d2h = the output ratio (2x, the widen stream); for
                # packed flat BPE (BLT_D2H default) the device repacks to
                # 1 byte/position + 1-bit flags, so r_d2h = 1.125
                # regardless of merge density — the packed format IS the
                # reason bpe e2e now beats basic on the same link. The
                # measured duplex_factor decides how much the two
                # directions share one capacity: half-duplex (~1) gives
                # the serial bound 1/(1/h2d + r/d2h); full duplex (~2)
                # gives min(h2d, d2h/r). Per-rep bounds take the BEST of
                # the rep's two adjacent probes — capacity is what the
                # link could do around that window; a probe can only
                # under-read it.
                from blt_tpu.pipeline.engines import _flat_d2h_mode

                out_ratio = os.path.getsize(op) / size
                d2h_ratio = out_ratio
                if mode == "bpe" and _flat_d2h_mode() == "packed":
                    d2h_ratio = 1.125
                # The GATE bound is the invariant one: each direction
                # cannot exceed its own measured capacity, so
                # min(h2d, d2h/r) is a true upper bound. The serial x
                # duplex_factor composition is recorded as INFORMATION
                # only: the concurrent duplex probe demonstrably
                # under-measures shared capacity (r5 dress run:
                # duplex_factor 0.46 while the pipeline beat the serial
                # "bound" 2.3x — two probe threads in one process do
                # not saturate the tunnel the way the pipelined run
                # does), so it cannot gate.
                df = roofline.get("duplex_factor", 1.0)
                effs, bounds, serials = [], [], []
                for j, d in enumerate(dts):
                    h2d = max(probes[j]["h2d_bytes_per_sec"],
                              probes[j + 1]["h2d_bytes_per_sec"])
                    d2h = max(probes[j]["d2h_bytes_per_sec"],
                              probes[j + 1]["d2h_bytes_per_sec"])
                    serial = 1.0 / (1.0 / h2d + d2h_ratio / d2h)
                    serials.append(serial * df)
                    bound = min(h2d, d2h / d2h_ratio)
                    bounds.append(bound)
                    effs.append((size / d) / bound)
                eff_stats = rate_stats(effs)
                e2e[f"{mode}_link_bound_bytes_per_sec"] = float(
                    np.median(bounds)
                )
                e2e[f"{mode}_serial_duplex_model_bytes_per_sec"] = float(
                    np.median(serials)
                )
                e2e[f"{mode}_d2h_ratio"] = d2h_ratio
                e2e[f"{mode}_link_bound_model"] = (
                    "per-rep min(h2d, d2h/r_d2h), h2d/d2h = best of the "
                    "rep's adjacent interleaved probes (invariant upper "
                    "bound; serial-duplex model recorded separately, "
                    "informational only)"
                )
                e2e[f"{mode}_efficiency_vs_link"] = eff_stats["median"]
                e2e[f"{mode}_efficiency_vs_link_stats"] = eff_stats
                e2e[f"{mode}_link_probes"] = probes
                log(
                    f"e2e {mode} 100MB (jax engine): {rate/1e6:.1f} MB/s "
                    f"= {eff_stats['median']:.0%} of the per-rep link "
                    f"bound min(h2d, d2h/r) (median bound "
                    f"{np.median(bounds)/1e6:.1f} MB/s; informational "
                    f"serial-duplex model {np.median(serials)/1e6:.1f} "
                    f"MB/s, duplex_factor={df:.2f}); "
                    f"first-run {size/dt_first/1e6:.1f} MB/s"
                )

            # small-payload warm-start split: is the 10MB gap compile cost
            # or per-run fixed cost? (VERDICT r2 items 6/7)
            ip10 = os.path.join(td, "in10.bin")
            n10 = 10 * 1024 * 1024
            make_file(ip10, n10)
            dt10_first = run_once(ip10, op, "basic", Engine.JAX, mp)
            st10 = rate_stats([
                n10 / run_once(ip10, op, "basic", Engine.JAX, mp)
                for _ in range(REPS)
            ])
            dt10 = n10 / st10["median"]
            e2e["basic_10mb_first_run_bytes_per_sec"] = n10 / dt10_first
            e2e["basic_10mb_bytes_per_sec"] = st10["median"]
            e2e["basic_10mb_rate_stats"] = st10
            e2e["basic_10mb_compile_overhead_s"] = dt10_first - dt10
            log(
                f"e2e basic 10MB: warm {n10/dt10/1e6:.1f} MB/s, "
                f"first {n10/dt10_first/1e6:.1f} MB/s "
                f"(compile/setup {dt10_first - dt10:.2f}s)"
            )

        extras["packed_dense_50k_bytes_per_sec"] = dense_bps
        extras["e2e_file_to_file"] = e2e
        extras["interconnect_roofline"] = roofline
        # link-weather normalization: probe the roofline again AFTER the
        # e2e runs; the drift ratio says how much of any e2e swing is the
        # tunnel, not the pipeline (r3->r3b saw 3x h2d swings)
        roofline_post = measure_roofline()
        extras["interconnect_roofline_post"] = roofline_post
        extras["link_weather_drift"] = {
            "h2d_post_over_pre": roofline_post["h2d_bytes_per_sec"]
            / roofline["h2d_bytes_per_sec"],
            "d2h_post_over_pre": roofline_post["d2h_bytes_per_sec"]
            / roofline["d2h_bytes_per_sec"],
        }
        log(f"link weather drift: {extras['link_weather_drift']}")

        # --- multi-chip scaling: recorded automatically whenever this
        # bench ever runs on real multi-chip hardware; single-chip runs
        # point at the committed virtual-mesh artifact instead ---
        if len(jax.devices()) > 1:
            from benches.scaling_benchmark import run_mesh_scaling

            extras["scaling"] = run_mesh_scaling(jax, mb_per_dev=8.0, iters=5)
        else:
            extras["scaling"] = {
                "skipped": "single chip",
                "virtual_mesh_artifact": "benches/results/scaling_r4.json",
            }

    if os.environ.get("BLT_BENCH_EXTRAS", "1") != "0":
        try:
            run_extras()
        except Exception as e:  # never lose the headline over an extra
            log(f"extras section failed: {type(e).__name__}: {e}")

    value = float(np.sqrt(basic_bps * bpe_bps))
    print(
        json.dumps(
            {
                "metric": "tokenization_bytes_per_sec_chip_geomean_basic_bpe",
                "value": value,
                "unit": "bytes/s",
                "vs_baseline": value / REFERENCE_BASELINE_BYTES_PER_SEC,
                "basic_bytes_per_sec": basic_bps,
                "basic_rate_stats": basic_stats,
                "bpe_bytes_per_sec": bpe_bps,
                "bpe_rate_stats": bpe_stats,
                "bpe_exact_vs_oracle_prefix": bool(exact),
                "toolchain_canary": canary,
                "bench_1gb": bench_1gb,
                **extras,
                "backend": backend,
                "buffer_bytes": N,
                "chained_kernels_per_dispatch": {"basic": K_BASIC, "bpe": K_BPE},
                "bpe_rules": RULES,
            }
        )
    )


if __name__ == "__main__":
    main()
