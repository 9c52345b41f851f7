"""Serving-path latency benchmark: warm request latency through blt-serve.

Measures what a client of the HTTP service actually sees (reference has no
serving path; the REST API exists only in its roadmap, ARCHITECTURE.md:49):
POST /tokenize round-trip latency per payload size, host engine vs device
engine, after `--warmup`-equivalent pre-compilation. Pins the round-3
serving claims (power-of-two capacity bucketing + warmup => no compiles on
the request path, docs/API.md "Device-engine serving latency").

Run: python benches/serving_benchmark.py [--engines numpy,jax] [--save]
Prints one JSON object; --save writes benches/results/serving_r3.json.
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [4 * 1024, 64 * 1024, 1024 * 1024, 4 * 1024 * 1024]
REPS = 8
WARM_REPS = 2


def log(m):
    print(m, file=sys.stderr, flush=True)


def bench_engine(engine: str, merges_path: str, corpus: np.ndarray) -> dict:
    from blt_tpu.server import make_server

    srv = make_server(
        port=0,
        merges_path=merges_path,
        engine=engine,
        warmup_bytes=max(SIZES) if engine in ("jax", "shard") else 0,
    )
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    results = {}
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        for size in SIZES:
            payload = corpus[:size].tobytes()
            lat = []
            out_len = 0
            for rep in range(WARM_REPS + REPS):
                t0 = time.perf_counter()
                conn.request("POST", "/tokenize", body=payload)
                resp = conn.getresponse()
                body = resp.read()
                dt = time.perf_counter() - t0
                assert resp.status == 200, (resp.status, body[:200])
                out_len = len(body)
                if rep >= WARM_REPS:
                    lat.append(dt)
            lat.sort()
            p50 = lat[len(lat) // 2]
            results[f"{size}"] = {
                "p50_ms": p50 * 1e3,
                "min_ms": lat[0] * 1e3,
                "max_ms": lat[-1] * 1e3,
                "mb_per_s_at_p50": size / p50 / 1e6,
                "out_bytes": out_len,
            }
            log(
                f"{engine} {size//1024}KB: p50 {p50*1e3:.1f} ms "
                f"({size/p50/1e6:.1f} MB/s), min {lat[0]*1e3:.1f} ms"
            )
        conn.close()
    finally:
        srv.shutdown()
        srv.server_close()
    return results


def decompose_device_serving(merges_path: str, corpus: np.ndarray,
                             numpy_results: dict) -> dict:
    """Split the device-engine serving latency into dispatch / H2D /
    kernel / D2H per payload bucket, so the local-attach crossover can
    be PREDICTED instead of guessed (VERDICT r4 item 7: on the tunnel
    every jax-engine p50 is RTT+link-bound, which says nothing about a
    PCIe-attached deployment). Components are measured resident/chained
    (the bench.py force protocol); the local-attach model replaces the
    link terms with PCIe-class numbers."""
    import jax
    import jax.numpy as jnp

    from blt_tpu.merges import MergeTable, load_bpe_merges_from_path
    from blt_tpu.ops.bpe_pallas import PallasFlatEncoder

    table = MergeTable.build(load_bpe_merges_from_path(merges_path))
    out = {}
    f = jax.jit(lambda a: a + 1)
    s = jax.device_put(np.zeros(8, np.int32))
    f(s).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20):
        r = f(s)
    np.asarray(r)
    dispatch_ms = (time.perf_counter() - t0) / 20 * 1e3
    out["dispatch_ms"] = dispatch_ms
    # PCIe-class local-attach parameters (order-of-magnitude: v5e hosts
    # move tens of GB/s over PCIe/DMA; dispatch ~0.2ms)
    LOCAL_BW = 8e9
    LOCAL_DISPATCH_MS = 0.2
    for size in SIZES:
        cap = max(1 << 16, 1 << (size - 1).bit_length())
        enc = PallasFlatEncoder(table, capacity_bytes=cap)
        buf = np.zeros(enc.padded_bytes, np.uint8)
        buf[:size] = corpus[:size]
        # H2D: chained uploads of the padded buffer
        t0 = time.perf_counter()
        devs = [
            jax.device_put(buf.reshape(-1, 128)) for _ in range(3)
        ]
        jax.block_until_ready(devs)
        h2d_ms = (time.perf_counter() - t0) / 3 * 1e3
        dev = devs[0]
        # kernel: chained fused encode+pack dispatches, forced via the
        # last call's carry scalar (in-order execution bounds all)
        wire, carry, last = enc.encode_packed_device(
            dev, size, False, -1, jnp.int32(0)
        )
        np.asarray(carry)
        t0 = time.perf_counter()
        k = 8
        for _ in range(k):
            wire, carry, last = enc.encode_packed_device(
                dev, size, False, -1, jnp.int32(0)
            )
        np.asarray(carry)
        kernel_ms = (time.perf_counter() - t0) / k * 1e3
        # D2H: the combined wire transfer (capacity + flags). Pre-issue
        # three distinct wires (defeats host-copy caching), force them,
        # then time PURE transfers — subtracting a separately measured
        # kernel time from a mixed loop let tunnel jitter clamp the
        # estimate toward 0.
        wires = []
        for _ in range(3):
            w, carry, last = enc.encode_packed_device(
                dev, size, False, -1, jnp.int32(0)
            )
            wires.append(w)
        np.asarray(carry)  # all three queued kernels complete
        t0 = time.perf_counter()
        for w in wires:
            np.asarray(w)
        d2h_ms = (time.perf_counter() - t0) / 3 * 1e3
        wire_bytes = int(np.asarray(wires[0]).nbytes)
        tunnel_pred = dispatch_ms + h2d_ms + kernel_ms + max(d2h_ms, 0)
        local_pred = (
            LOCAL_DISPATCH_MS
            + (buf.nbytes + wire_bytes) / LOCAL_BW * 1e3
            + kernel_ms
        )
        host_ms = numpy_results.get(str(size), {}).get("p50_ms")
        out[str(size)] = {
            "h2d_ms": h2d_ms,
            "kernel_ms": kernel_ms,
            "d2h_ms": max(d2h_ms, 0),
            "wire_bytes": wire_bytes,
            "padded_h2d_bytes": int(buf.nbytes),
            "tunnel_predicted_ms": tunnel_pred,
            "local_attach_predicted_ms": local_pred,
            "numpy_host_p50_ms": host_ms,
            "local_device_beats_host": (
                bool(local_pred < host_ms) if host_ms else None
            ),
        }
        log(f"decompose {size//1024}KB: h2d {h2d_ms:.1f} kernel "
            f"{kernel_ms:.2f} d2h {max(d2h_ms,0):.1f} ms; local pred "
            f"{local_pred:.2f} ms vs host {host_ms and round(host_ms,2)}")
    # crossover: first size where the local-attach device model wins
    cross = None
    for size in SIZES:
        r = out[str(size)]
        if r["local_device_beats_host"]:
            cross = size
            break
    out["local_attach_crossover_bytes"] = cross
    out["model"] = (
        "tunnel = dispatch + h2d(padded) + kernel + d2h(wire); "
        "local-attach = 0.2ms dispatch + (padded+wire)/8GBps + kernel. "
        "Use --device-threshold near the crossover for --engine auto."
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--engines", default="numpy,jax")
    ap.add_argument("--decompose", action="store_true",
                    help="measure the device-path latency components + "
                         "local-attach crossover prediction")
    ap.add_argument("--save", action="store_true",
                    help="write benches/results/serving_r3.json")
    args = ap.parse_args()

    import tempfile

    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"etaoinshrdlu ETAOIN,.!?", np.uint8)
    w = 1.0 / np.arange(1, len(alphabet) + 1)
    corpus = rng.choice(alphabet, size=max(SIZES), p=w / w.sum()).astype(
        np.uint8
    )
    sample = corpus[: 1 << 20]
    pairs, counts = np.unique(
        sample[:-1].astype(np.int32) * 256 + sample[1:].astype(np.int32),
        return_counts=True,
    )
    top = pairs[np.argsort(-counts)][:500]

    out = {
        "artifact": "serving_latency",
        "protocol": (
            f"POST /tokenize, BPE mode (500 rules), {REPS} timed reps "
            f"after {WARM_REPS} warm + full bucket warmup; in-process "
            "ThreadingHTTPServer over loopback"
        ),
        "engines": {},
    }
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        for p in top:
            f.write(f"{int(p)//256} {int(p)%256}\n")
        merges_path = f.name
    try:
        import jax

        out["backend"] = jax.default_backend()
        for engine in args.engines.split(","):
            log(f"--- engine {engine} ---")
            out["engines"][engine] = bench_engine(engine, merges_path, corpus)
        if args.decompose:
            log("--- decomposition ---")
            out["decomposition"] = decompose_device_serving(
                merges_path, corpus, out["engines"].get("numpy", {})
            )
    finally:
        os.unlink(merges_path)

    js = json.dumps(out, indent=1)
    print(js)
    if args.save:
        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "results",
            "serving_r5.json",
        )
        with open(path, "w") as f:
            f.write(js + "\n")
        log(f"saved {path}")


if __name__ == "__main__":
    main()
