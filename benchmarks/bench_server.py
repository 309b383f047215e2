#!/usr/bin/env python
"""HTTP serving overhead: POST /search round-trip vs the direct library
call (inference/server.py over RetrievalService).

Both paths run the SAME one-dispatch device program on the same payload,
so the paired difference isolates what the HTTP layer adds: JSON+base64
parse, request decode, the dispatch lock, and response serialisation.
Wall-clock p50s are reported per path (the dev tunnel's ~45 ms dispatch
RTT sits in both and cancels in the difference).
"""

import argparse
import base64
import io
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from PIL import Image

from centroids_reid_tpu.config import get_default_cfg
from centroids_reid_tpu.inference.server import RetrievalHTTPServer
from centroids_reid_tpu.inference.service import RetrievalService
from centroids_reid_tpu.models import create_model, init_model


def _p50(fn, reps):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def _concurrent_load(url, payload, n_clients, reps_per_client):
    """N threads each issue sequential POSTs; returns (lat_sorted, total_s,
    n_ok, n_shed). Shed (429) responses count separately — under the
    bounded-queue server they are the correct overload behaviour. Any
    OTHER failure (500s, timeouts) is collected and re-raised after the
    join: a server error must fail the bench loudly, not die silently in
    a client thread and skew the throughput over a shortened workload."""
    import threading
    import urllib.error

    lats, shed, failures = [], [0], []
    lock = threading.Lock()

    def client():
        for _ in range(reps_per_client):
            t0 = time.time()
            req = urllib.request.Request(
                url, data=payload,
                headers={"Content-Type": "application/json"},
            )
            try:
                with urllib.request.urlopen(req, timeout=300) as r:
                    r.read()
                with lock:
                    lats.append(time.time() - t0)
            except urllib.error.HTTPError as e:
                body = e.read()
                if e.code != 429:
                    with lock:
                        failures.append(f"HTTP {e.code}: {body[:200]!r}")
                    return
                with lock:
                    shed[0] += 1
            except Exception as e:
                with lock:
                    failures.append(f"{type(e).__name__}: {e}")
                return

    threads = [threading.Thread(target=client) for _ in range(n_clients)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    total = time.time() - t0
    if failures:
        raise RuntimeError(
            f"{len(failures)} client failure(s) during concurrent load "
            f"(first: {failures[0]})"
        )
    lats.sort()
    return lats, total, len(lats), shed[0]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gallery", type=int, default=100_000)
    p.add_argument("--queries", type=int, default=8)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--reps", type=int, default=30)
    p.add_argument("--fp32_exact", action="store_true")
    p.add_argument(
        "--concurrency", type=int, default=8,
        help="clients for the concurrent-load phase (0 skips it)",
    )
    p.add_argument(
        "--batch_window_ms", type=float, default=4.0,
        help="dynamic-batching window for the concurrent phase",
    )
    p.add_argument(
        "--rerank_window", type=int, default=200,
        help="also measure a server whose service re-ranks each query's "
             "top-N window with k-reciprocal encoding (serve.py "
             "--rerank_window); reports the added latency vs the plain "
             "ranking path (0 skips the phase)",
    )
    args = p.parse_args()

    cfg = get_default_cfg()
    cfg.INPUT.SIZE_TEST = [64, 32]
    model = create_model(cfg, num_classes=0)
    params, stats = init_model(model, jax.random.PRNGKey(0), (64, 32))

    rng = np.random.RandomState(1)
    emb = rng.randn(args.gallery, 2048).astype(np.float32)
    paths = np.array([f"g{i}" for i in range(args.gallery)])
    svc = RetrievalService(
        cfg, emb, paths, k=args.k, normalize=True,
        use_bf16_kernel=not args.fp32_exact,
        model_bundle=(model, params, stats),
    )

    blobs = []
    for i in range(args.queries):
        buf = io.BytesIO()
        Image.fromarray(
            rng.randint(0, 256, (64, 32, 3), np.uint8)
        ).save(buf, format="JPEG")
        blobs.append(buf.getvalue())
    payload = json.dumps(
        {"images_b64": [base64.b64encode(b).decode() for b in blobs]}
    ).encode()

    server = RetrievalHTTPServer(svc, port=0).start_background()
    url = f"http://127.0.0.1:{server.port}/search"

    def http_call():
        req = urllib.request.Request(
            url, data=payload, headers={"Content-Type": "application/json"}
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.status == 200
            r.read()

    def direct_call():
        svc.query_bytes(blobs)

    # warm both (compile + first-dispatch)
    direct_call()
    http_call()

    direct = _p50(direct_call, args.reps)
    http = _p50(http_call, args.reps)
    server.shutdown()

    out = {
        "gallery": args.gallery, "queries": args.queries, "k": args.k,
        "kernel": "fp32_exact" if args.fp32_exact else "bf16",
        "direct_p50_ms": round(direct * 1e3, 3),
        "http_p50_ms": round(http * 1e3, 3),
        "http_overhead_ms": round((http - direct) * 1e3, 3),
    }

    if args.rerank_window > 0:
        # re-ranked serving (serve.py --rerank_window): the SAME query
        # program plus the windowed k-reciprocal re-rank of each query's
        # top-r candidates — the paired difference vs the plain server
        # is what accuracy-boosted responses cost per request
        svc_rr = RetrievalService(
            cfg, emb, paths, k=args.k, normalize=True,
            use_bf16_kernel=not args.fp32_exact,
            model_bundle=(model, params, stats),
            rerank_window=args.rerank_window,
        )
        server_rr = RetrievalHTTPServer(svc_rr, port=0).start_background()
        url_rr = f"http://127.0.0.1:{server_rr.port}/search"

        def http_rr():
            req = urllib.request.Request(
                url_rr, data=payload,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                assert r.status == 200
                r.read()

        def direct_rr():
            svc_rr.query_bytes(blobs)

        direct_rr()  # compile + first-dispatch
        http_rr()
        d_rr = _p50(direct_rr, args.reps)
        h_rr = _p50(http_rr, args.reps)
        server_rr.shutdown()
        out.update({
            "rerank_window": args.rerank_window,
            "rerank_direct_p50_ms": round(d_rr * 1e3, 3),
            "rerank_http_p50_ms": round(h_rr * 1e3, 3),
            "rerank_added_ms": round((d_rr - direct) * 1e3, 3),
        })

    if args.concurrency > 0:
        # concurrent clients against a dynamically-batching server: the
        # production configuration (requests coalesce into shared
        # dispatches; overload past the bounds sheds with 429)
        single = json.dumps(
            {"images_b64": [base64.b64encode(blobs[0]).decode()]}
        ).encode()
        server2 = RetrievalHTTPServer(
            svc, port=0, batch_window_ms=args.batch_window_ms,
        ).start_background()
        url2 = f"http://127.0.0.1:{server2.port}/search"
        # deterministic warmup: compile every power-of-two bucket the
        # load phase can produce (the production --warmup_buckets flow)
        server2.warmup_buckets(args.concurrency)
        _concurrent_load(url2, single, 2, 2)  # prime connections/threads
        lats, total, n_ok, n_shed = _concurrent_load(
            url2, single, args.concurrency, args.reps
        )
        server2.shutdown()
        out.update({
            "concurrency": args.concurrency,
            "concurrent_req_per_sec": round(n_ok / total, 1),
            "concurrent_p50_ms": round(lats[len(lats) // 2] * 1e3, 1),
            "concurrent_p99_ms": round(
                lats[min(len(lats) - 1, int(len(lats) * 0.99))] * 1e3, 1
            ),
            "concurrent_shed": n_shed,
        })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
