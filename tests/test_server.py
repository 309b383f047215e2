"""HTTP serving front-end (inference/server.py over RetrievalService).

The reference has no online serving surface (offline CLIs only,
/root/reference/inference/get_similar.py); these tests pin the TPU
build's addition: JSON /search == the library query path, plus the
error-handling contract.
"""

import base64
import json
import os
import urllib.error
import urllib.request

import numpy as np
import pytest
from PIL import Image

from centroids_reid_tpu.config import get_default_cfg
from centroids_reid_tpu.engine import CheckpointManager, create_train_state
from centroids_reid_tpu.inference import build_embeddings
from centroids_reid_tpu.models import create_model


def _cfg(tmp_path):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "resnet18"
    cfg.USE_MIXED_PRECISION = False
    cfg.INPUT.SIZE_TEST = [32, 16]
    cfg.TEST.IMS_PER_BATCH = 8
    cfg.TPU.NUM_GROUPS = 1
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    return cfg


@pytest.fixture(params=[0.0, 300.0], ids=["direct", "batched"])
def served(tmp_path, request):
    """A running RetrievalHTTPServer over a 12-image gallery; yields
    (server, service, query_dir, base_url). Parametrised over dynamic
    batching off/on — every endpoint contract must hold identically when
    requests coalesce into shared dispatches."""
    rng = np.random.RandomState(0)
    gallery = tmp_path / "gallery"
    query = tmp_path / "query"
    gallery.mkdir()
    query.mkdir()
    arrays = {}
    for pid in ("prodA", "prodB", "prodC"):
        for i in range(4):
            arr = rng.randint(0, 255, (32, 16, 3), np.uint8)
            name = f"{pid}_{i:02d}.jpg"
            Image.fromarray(arr).save(gallery / name)
            arrays[name] = arr
    for name in ("prodA_01.jpg", "prodB_02.jpg", "prodC_00.jpg"):
        Image.fromarray(arrays[name]).save(query / f"q_{name}")

    cfg = _cfg(tmp_path)
    model = create_model(cfg, num_classes=4)
    state, _ = create_train_state(cfg, model, 4, seed=0)
    mgr = CheckpointManager(str(tmp_path / "logs"))
    mgr.save_periodic(0, state, cfg)
    cfg.MODEL.PRETRAIN_PATH = mgr.latest_periodic()
    cfg.DATASETS.ROOT_DIR = str(gallery)
    emb, paths = build_embeddings(cfg, images_in_subfolders=False)

    from centroids_reid_tpu.inference import RetrievalService
    from centroids_reid_tpu.inference.server import RetrievalHTTPServer

    # fp32 kernel: the bf16 Pallas selection is TPU-only (backend-gated
    # off the CPU suite, ops/retrieval.py::_use_vmem_topk)
    svc = RetrievalService(
        cfg, emb, paths, k=5, normalize=True, use_bf16_kernel=False
    )
    server = RetrievalHTTPServer(
        svc, port=0, batch_window_ms=request.param
    ).start_background()
    try:
        yield server, svc, str(query), f"http://127.0.0.1:{server.port}"
    finally:
        server.shutdown()


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read())


def _post_err(url, data: bytes):
    req = urllib.request.Request(
        url, data=data, headers={"Content-Type": "application/json"}
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz_and_search_match_library_path(served):
    server, svc, query, base = served

    with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
        health = json.loads(r.read())
    assert {
        k: health[k]
        for k in ("status", "gallery_size", "k", "ingest", "model")
    } == {
        "status": "ok", "gallery_size": 12, "k": 5,
        "ingest": "rgb", "model": "resnet18",
    }
    assert health["requests"] == 0 and health["errors"] == 0

    qfiles = sorted(os.path.join(query, f) for f in os.listdir(query))
    blobs = [open(p, "rb").read() for p in qfiles]
    status, out = _post(base + "/search", {
        "images_b64": [base64.b64encode(b).decode() for b in blobs],
    })
    assert status == 200
    assert len(out["results"]) == 3

    d_lib, idx_lib, paths_lib = svc.query_files(qfiles)
    for i, res in enumerate(out["results"]):
        assert res["indices"] == [int(j) for j in idx_lib[i]]
        assert res["paths"] == [str(p) for p in paths_lib[i]]
        np.testing.assert_allclose(
            res["distances"], d_lib[i], rtol=0, atol=1e-6
        )
        # queries are byte-identical gallery copies: top-1 is that image
        expected = os.path.basename(qfiles[i])[2:]
        assert os.path.basename(res["paths"][0]) == expected

    # k narrows the response without a service rebuild
    status, out2 = _post(base + "/search", {
        "images_b64": [base64.b64encode(blobs[0]).decode()], "k": 2,
    })
    assert status == 200
    assert len(out2["results"][0]["paths"]) == 2
    assert out2["results"][0]["indices"] == out["results"][0]["indices"][:2]

    # observability counters advanced: 2 ok requests, 4 images, 0 errors
    with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
        health = json.loads(r.read())
    assert health["requests"] == 2 and health["images"] == 4
    assert health["errors"] == 0


def test_error_contract(served):
    server, svc, query, base = served

    # unknown paths
    try:
        urllib.request.urlopen(base + "/nope", timeout=60)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404
    code, body = _post_err(base + "/nope", b"{}")
    assert code == 404

    # malformed JSON
    code, body = _post_err(base + "/search", b"{not json")
    assert code == 400 and "invalid JSON" in body["error"]
    # non-object JSON
    code, body = _post_err(base + "/search", b"[1,2]")
    assert code == 400
    # missing / empty images
    code, body = _post_err(base + "/search", b"{}")
    assert code == 400 and "images_b64" in body["error"]
    code, body = _post_err(base + "/search", b'{"images_b64": []}')
    assert code == 400
    # invalid base64
    code, body = _post_err(
        base + "/search", b'{"images_b64": ["!!notb64!!"]}'
    )
    assert code == 400 and "base64" in body["error"]
    # valid base64, undecodable image
    junk = base64.b64encode(b"not an image").decode()
    code, body = _post_err(
        base + "/search",
        json.dumps({"images_b64": [junk]}).encode(),
    )
    assert code == 400 and "undecodable" in body["error"]
    # k out of range (service k=5); JSON true is not a valid k either
    img = open(os.path.join(query, sorted(os.listdir(query))[0]), "rb").read()
    for bad_k in (6, 0, True):
        code, body = _post_err(
            base + "/search",
            json.dumps({
                "images_b64": [base64.b64encode(img).decode()], "k": bad_k,
            }).encode(),
        )
        assert code == 400 and "'k'" in body["error"], bad_k

    # every rejected request above counted as an error
    with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
        health = json.loads(r.read())
    assert health["errors"] >= 8 and health["images"] == 0


def test_keepalive_connection_survives_errors(served):
    """HTTP/1.1 keep-alive: a 404'd POST (body must be drained) followed by
    a valid /search on the SAME connection must still work."""
    import http.client

    server, svc, query, base = served
    img = open(os.path.join(query, sorted(os.listdir(query))[0]), "rb").read()
    good = json.dumps(
        {"images_b64": [base64.b64encode(img).decode()]}
    ).encode()

    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
    try:
        conn.request("POST", "/nope", body=good)
        r = conn.getresponse()
        assert r.status == 404
        r.read()
        conn.request("POST", "/search", body=b"{not json")
        r = conn.getresponse()
        assert r.status == 400
        r.read()
        conn.request("POST", "/search", body=good)
        r = conn.getresponse()
        assert r.status == 200
        out = json.loads(r.read())
        assert len(out["results"][0]["paths"]) == 5
    finally:
        conn.close()


def test_dynamic_batching_coalesces_dispatches(served):
    """With the window open, concurrent requests must share device
    dispatches (fewer query_arrays calls than requests, at least one
    multi-request batch) and still return their own correct results."""
    import threading

    server, svc, query, base = served
    if server._batcher is None:
        pytest.skip("direct variant has no batcher")

    import time

    calls = []
    slow_once = threading.Event()
    orig = svc.query_arrays

    def counting(imgs):
        calls.append(imgs.shape[0])
        if not slow_once.is_set():
            # hold the worker in its FIRST dispatch so the concurrent
            # requests queue up behind it — they then coalesce in the
            # next window regardless of their arrival spread (no timing
            # assumptions on the loaded 1-core CI host)
            slow_once.set()
            time.sleep(2.0)
        return orig(imgs)

    svc.query_arrays = counting
    try:
        qfiles = sorted(os.path.join(query, f) for f in os.listdir(query))
        payloads = [
            {"images_b64": [
                base64.b64encode(open(p, "rb").read()).decode()
            ]}
            for p in qfiles
        ] * 2                                  # 6 concurrent single-image
        _post(base + "/search", payloads[0])   # warm + trip the slow call
        calls.clear()

        blocker = threading.Thread(
            target=_post, args=(base + "/search", payloads[0])
        )
        slow_once.clear()                      # next dispatch is the slow one
        blocker.start()
        deadline = time.time() + 10
        while not slow_once.is_set() and time.time() < deadline:
            time.sleep(0.01)                   # worker is inside the dispatch
        assert slow_once.is_set()

        results = [None] * len(payloads)

        def worker(i):
            results[i] = _post(base + "/search", payloads[i])

        threads = [
            threading.Thread(target=worker, args=(i,))
            for i in range(len(payloads))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(120)
        blocker.join(120)
    finally:
        svc.query_arrays = orig

    # calls[0] is the blocker's solo dispatch; everything that queued
    # behind it coalesced into few multi-row batches
    assert len(calls) < 1 + len(payloads), calls
    assert max(calls) > 1, calls               # a real multi-request batch
    calls = calls[1:]                          # drop the blocker's row
    # coalesced dispatches pad to power-of-two buckets (bounded program
    # set); real rows dispatched exactly once => padded total covers them
    from centroids_reid_tpu.inference.server import _bucket_rows

    assert all(c == _bucket_rows(c) for c in calls), calls
    # every real row dispatched once; a pow2 bucket holds > half real rows
    assert len(payloads) <= sum(calls) < 2 * len(payloads) + len(calls)
    # and each request still got ITS result: top-1 = its own gallery twin
    for (status, out), p in zip(results, payloads * 1):
        assert status == 200
    for i, (status, out) in enumerate(results):
        qpath = (sorted(
            os.path.join(query, f) for f in os.listdir(query)
        ) * 2)[i]
        expected = os.path.basename(qpath)[2:]
        assert os.path.basename(
            out["results"][0]["paths"][0]
        ) == expected


def test_chunked_transfer_encoding_is_rejected(served):
    """A chunked POST has no Content-Length to drain by — the server must
    411 and close the connection rather than desync it. Raw socket: the
    whole request (headers + chunked body) is written before reading, so
    the server's early close cannot race the client's writes."""
    import socket

    server, svc, query, base = served
    payload = b'{"images_b64": []}'
    req = (
        b"POST /search HTTP/1.1\r\nHost: t\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n"
        + hex(len(payload))[2:].encode() + b"\r\n" + payload + b"\r\n"
        + b"0\r\n\r\n"
    )
    with socket.create_connection(
        ("127.0.0.1", server.port), timeout=60
    ) as s:
        s.sendall(req)
        resp = b""
        while True:
            chunk = s.recv(65536)
            if not chunk:
                break  # server closed — the point of the test
            resp += chunk
    status_line = resp.split(b"\r\n", 1)[0]
    assert b"411" in status_line, resp[:200]
    assert b"Content-Length required" in resp


def test_swap_service_zero_downtime(tmp_path):
    """swap_service atomically replaces the resident gallery: requests
    after the swap rank against the new index, counters persist, and the
    server never restarts."""
    rng = np.random.RandomState(3)
    g1 = tmp_path / "g1"
    g2 = tmp_path / "g2"
    g1.mkdir()
    g2.mkdir()
    for i in range(6):
        Image.fromarray(
            rng.randint(0, 255, (32, 16, 3), np.uint8)
        ).save(g1 / f"one_{i}.jpg")
        Image.fromarray(
            rng.randint(0, 255, (32, 16, 3), np.uint8)
        ).save(g2 / f"two_{i}.jpg")

    cfg = _cfg(tmp_path)
    model = create_model(cfg, num_classes=4)
    state, _ = create_train_state(cfg, model, 4, seed=0)
    mgr = CheckpointManager(str(tmp_path / "logs"))
    mgr.save_periodic(0, state, cfg)
    cfg.MODEL.PRETRAIN_PATH = mgr.latest_periodic()

    from centroids_reid_tpu.inference import RetrievalService
    from centroids_reid_tpu.inference.server import RetrievalHTTPServer

    def build(gallery, out):
        c = cfg.clone()
        c.DATASETS.ROOT_DIR = str(gallery)
        c.OUTPUT_DIR = str(tmp_path / out)
        emb, paths = build_embeddings(c, images_in_subfolders=False)
        return RetrievalService(
            c, emb, paths, k=3, normalize=True, use_bf16_kernel=False
        )

    svc1 = build(g1, "o1")
    svc2 = build(g2, "o2")
    server = RetrievalHTTPServer(svc1, port=0).start_background()
    try:
        base = f"http://127.0.0.1:{server.port}"
        img = open(g1 / "one_2.jpg", "rb").read()
        payload = {"images_b64": [base64.b64encode(img).decode()]}
        _, out1 = _post(base + "/search", payload)
        assert os.path.basename(out1["results"][0]["paths"][0]) \
            == "one_2.jpg"

        server.swap_service(svc2)
        _, out2 = _post(base + "/search", payload)
        # same query now ranks against gallery 2 only
        assert all(
            os.path.basename(p).startswith("two_")
            for p in out2["results"][0]["paths"]
        )
        with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
            health = json.loads(r.read())
        assert health["requests"] == 2  # counters persist across the swap
    finally:
        server.shutdown()


def test_cli_build_serves_index_artifacts(tmp_path):
    """build_from_args: the serve.py CLI path loads create_embeddings
    artifacts, honours --topk/--normalize_features/opts, and (with
    TPU.INT8_EVAL) self-calibrates the int8 embed stage on the indexed
    gallery images."""
    rng = np.random.RandomState(1)
    gallery = tmp_path / "gallery"
    gallery.mkdir()
    for pid in ("a", "b"):
        for i in range(4):
            Image.fromarray(
                rng.randint(0, 255, (32, 16, 3), np.uint8)
            ).save(gallery / f"{pid}_{i}.jpg")

    cfg = _cfg(tmp_path)
    model = create_model(cfg, num_classes=4)
    state, _ = create_train_state(cfg, model, 4, seed=0)
    mgr = CheckpointManager(str(tmp_path / "logs"))
    mgr.save_periodic(0, state, cfg)
    ckpt = mgr.latest_periodic()
    cfg.MODEL.PRETRAIN_PATH = ckpt
    cfg.DATASETS.ROOT_DIR = str(gallery)
    build_embeddings(cfg, images_in_subfolders=False)  # writes the index

    from centroids_reid_tpu.inference.server import build_from_args

    cache = str(tmp_path / "int8_artifact")
    cli_args = [
        "--gallery_data", cfg.OUTPUT_DIR,
        "--port", "0", "--topk", "4", "--normalize_features",
        "--fp32_exact",
        "MODEL.NAME", "resnet18", "USE_MIXED_PRECISION", "False",
        "INPUT.SIZE_TEST", "[32,16]", "TEST.IMS_PER_BATCH", "8",
        "TPU.NUM_GROUPS", "1",
        "MODEL.PRETRAIN_PATH", ckpt,
        "TPU.INT8_EVAL", "True", "TPU.INT8_CALIB_BATCHES", "1",
        "TPU.INT8_CACHE_PATH", cache,
    ]
    server = build_from_args(cli_args).start_background()
    try:
        base = f"http://127.0.0.1:{server.port}"
        with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
            health = json.loads(r.read())
        assert health["gallery_size"] == 8 and health["k"] == 4
        assert health["ingest"] == "rgb"   # int8 serving consumes RGB
        img = open(gallery / "a_2.jpg", "rb").read()
        status, out = _post(base + "/search", {
            "images_b64": [base64.b64encode(img).decode()],
        })
        assert status == 200
        # int8 embed of a byte-identical gallery image still ranks it first
        assert os.path.basename(out["results"][0]["paths"][0]) == "a_2.jpg"
    finally:
        server.shutdown()

    # the serve CLI routes through the shared quantize_for_serving flow:
    # the calibrated artifact was persisted, and a rebuild LOADS it
    # (identical file, no rewrite) instead of recalibrating
    npz = cache + ".npz" if not cache.endswith(".npz") else cache
    assert os.path.exists(npz)
    mtime = os.path.getmtime(npz)
    server2 = build_from_args(cli_args)
    try:
        assert os.path.getmtime(npz) == mtime
    finally:
        server2.shutdown()

    # the foreground CLI (serve.py serve_forever): SIGTERM drains and
    # exits 0 — the serving analogue of training's graceful preemption
    import signal
    import socket
    import subprocess
    import sys
    import time

    from conftest import cpu_subprocess_env

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    log = tmp_path / "serve.log"
    with open(log, "wb") as lf:
        proc = subprocess.Popen(
            [sys.executable, os.path.join(root, "inference", "serve.py"),
             "--gallery_data", cfg.OUTPUT_DIR,
             "--port", str(port), "--topk", "3",
             "MODEL.NAME", "resnet18", "USE_MIXED_PRECISION", "False",
             "INPUT.SIZE_TEST", "[32,16]", "TEST.IMS_PER_BATCH", "8",
             "TPU.NUM_GROUPS", "1", "MODEL.PRETRAIN_PATH", ckpt],
            stdout=lf, stderr=subprocess.STDOUT,
            env=cpu_subprocess_env(), cwd=root,
        )
        deadline = time.time() + 300
        while time.time() < deadline:
            if proc.poll() is not None:
                pytest.fail("serve.py died:\n" + log.read_text()[-2000:])
            if "RetrievalHTTPServer on" in log.read_text(errors="replace"):
                break
            time.sleep(0.5)
        else:
            proc.kill()
            pytest.fail("serve.py never came up:\n" + log.read_text()[-2000:])
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=60
        ) as r:
            assert json.loads(r.read())["gallery_size"] == 8
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=120)
    text = log.read_text(errors="replace")
    assert rc == 0, text[-2000:]
    assert "stopped cleanly" in text


def test_concurrent_requests_match_serial(served):
    """ThreadingHTTPServer + the dispatch lock: concurrent POSTs must all
    succeed and return exactly the serial answers."""
    import threading

    server, svc, query, base = served
    qfiles = sorted(os.path.join(query, f) for f in os.listdir(query))
    payloads = [
        {"images_b64": [base64.b64encode(open(p, "rb").read()).decode()]}
        for p in qfiles
    ] * 3                                   # 9 in-flight requests
    serial = [_post(base + "/search", p)[1] for p in payloads]

    results = [None] * len(payloads)

    def worker(i):
        results[i] = _post(base + "/search", payloads[i])

    threads = [
        threading.Thread(target=worker, args=(i,))
        for i in range(len(payloads))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    for (status, out), expect in zip(results, serial):
        assert status == 200
        for got_r, exp_r in zip(out["results"], expect["results"]):
            # under dynamic batching the coalesced dispatch compiles a
            # different batch shape — float noise at ~1e-7 on distances;
            # the ranking itself must be identical
            assert got_r["indices"] == exp_r["indices"]
            assert got_r["paths"] == exp_r["paths"]
            np.testing.assert_allclose(
                got_r["distances"], exp_r["distances"], rtol=0, atol=1e-5
            )


def test_overload_shedding_bounded_429(served):
    """Past max_pending concurrent /search requests, the server sheds with
    HTTP 429 + Retry-After instead of queueing without bound; the shed
    counter surfaces in /healthz and successful traffic resumes after."""
    import threading
    import time

    server, svc, query, base = served
    qfile = sorted(os.path.join(query, f) for f in os.listdir(query))[0]
    payload = {"images_b64": [
        base64.b64encode(open(qfile, "rb").read()).decode()
    ]}
    _post(base + "/search", payload)  # warm (compile outside the jam)

    server.max_pending = 1
    release = threading.Event()
    orig = svc.query_arrays

    def blocking(imgs):
        release.wait(30)
        return orig(imgs)

    svc.query_arrays = blocking
    try:
        holder = threading.Thread(
            target=_post, args=(base + "/search", payload)
        )
        holder.start()
        deadline = time.time() + 10
        while server._pending < 1 and time.time() < deadline:
            time.sleep(0.01)
        assert server._pending == 1

        # the slot is taken: every further request must shed immediately
        for _ in range(3):
            status, out = _post_err(
                base + "/search", json.dumps(payload).encode()
            )
            assert status == 429, (status, out)
            assert "overloaded" in out["error"]
    finally:
        release.set()
        svc.query_arrays = orig
        holder.join(60)
        server.max_pending = 32

    status, _ = _post(base + "/search", payload)   # service recovered
    assert status == 200
    with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
        health = json.loads(r.read())
    assert health["shed"] >= 3
    assert health["pending"] == 0


def test_retry_after_header_on_429(served):
    """Clients need the Retry-After hint to back off correctly."""
    import threading
    import time

    server, svc, query, base = served
    qfile = sorted(os.path.join(query, f) for f in os.listdir(query))[0]
    payload = json.dumps({"images_b64": [
        base64.b64encode(open(qfile, "rb").read()).decode()
    ]}).encode()
    _post_err(base + "/search", payload)  # warm

    server.max_pending = 0  # everything sheds
    try:
        req = urllib.request.Request(
            base + "/search", data=payload,
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=60)
            assert False, "expected 429"
        except urllib.error.HTTPError as e:
            assert e.code == 429
            assert e.headers.get("Retry-After") == "1"
    finally:
        server.max_pending = 32


def test_swap_during_held_batch_window_differing_k_and_size(tmp_path):
    """The round-3 race: a request validated (k clamp, ingest decode)
    against the OLD service must also DISPATCH against it, even when a
    swap_service lands while the request waits in the batcher queue
    behind a held dispatch. The new service here has a different k AND a
    different input size, so the old bug surfaces as short result lists
    (silent) or a shape-mismatched np.concatenate (batch-wide failure).
    """
    import threading
    import time

    rng = np.random.RandomState(7)
    g1 = tmp_path / "g1"
    g2 = tmp_path / "g2"
    g1.mkdir()
    g2.mkdir()
    for i in range(6):
        Image.fromarray(
            rng.randint(0, 255, (32, 16, 3), np.uint8)
        ).save(g1 / f"one_{i}.jpg")
        Image.fromarray(
            rng.randint(0, 255, (48, 24, 3), np.uint8)
        ).save(g2 / f"two_{i}.jpg")

    cfg = _cfg(tmp_path)
    model = create_model(cfg, num_classes=4)
    state, _ = create_train_state(cfg, model, 4, seed=0)
    mgr = CheckpointManager(str(tmp_path / "logs"))
    mgr.save_periodic(0, state, cfg)
    cfg.MODEL.PRETRAIN_PATH = mgr.latest_periodic()

    from centroids_reid_tpu.inference import RetrievalService
    from centroids_reid_tpu.inference.server import RetrievalHTTPServer

    def build(gallery, out, k, size):
        c = cfg.clone()
        c.DATASETS.ROOT_DIR = str(gallery)
        c.OUTPUT_DIR = str(tmp_path / out)
        c.INPUT.SIZE_TEST = size
        emb, paths = build_embeddings(c, images_in_subfolders=False)
        return RetrievalService(
            c, emb, paths, k=k, normalize=True, use_bf16_kernel=False
        )

    svc1 = build(g1, "o1", k=5, size=[32, 16])
    svc2 = build(g2, "o2", k=2, size=[48, 24])

    server = RetrievalHTTPServer(
        svc1, port=0, batch_window_ms=300.0
    ).start_background()
    try:
        base = f"http://127.0.0.1:{server.port}"
        img = open(g1 / "one_2.jpg", "rb").read()
        payload = {"images_b64": [base64.b64encode(img).decode()],
                   "k": 4}  # valid for svc1 (k=5), INVALID for svc2 (k=2)
        _post(base + "/search", payload)  # warm both program shapes

        # hold the batcher worker inside a dispatch so the next requests
        # queue up in the window behind it
        release = threading.Event()
        dispatched = threading.Event()
        orig1 = svc1.query_arrays

        def blocking(imgs):
            dispatched.set()
            release.wait(30)
            return orig1(imgs)

        svc1.query_arrays = blocking
        blocker = threading.Thread(
            target=_post, args=(base + "/search", payload)
        )
        blocker.start()
        assert dispatched.wait(10)

        # these validate + decode against svc1 (32x16 ingest, k<=5) and
        # sit in the batcher queue when the swap lands
        held = [None, None]

        def worker(i):
            held[i] = _post(base + "/search", payload)

        threads = [
            threading.Thread(target=worker, args=(i,)) for i in range(2)
        ]
        for t in threads:
            t.start()
        deadline = time.time() + 10
        while server._batcher._q.qsize() < 2 and time.time() < deadline:
            time.sleep(0.01)
        assert server._batcher._q.qsize() >= 2

        server.swap_service(svc2)
        release.set()

        for t in threads:
            t.join(120)
        blocker.join(120)
        svc1.query_arrays = orig1

        # old-generation requests: full k=4 answers from gallery ONE
        for status, out in held:
            assert status == 200
            r = out["results"][0]
            assert len(r["paths"]) == 4, r
            assert all(
                os.path.basename(p).startswith("one_") for p in r["paths"]
            )

        # post-swap traffic validates against svc2: k=4 now rejected,
        # k=2 ranks the 48x24 gallery
        img2 = open(g2 / "two_3.jpg", "rb").read()
        status, out = _post_err(base + "/search", json.dumps(
            {"images_b64": [base64.b64encode(img2).decode()], "k": 4}
        ).encode())
        assert status == 400
        status, out = _post(base + "/search", {
            "images_b64": [base64.b64encode(img2).decode()], "k": 2
        })
        assert status == 200
        assert all(
            os.path.basename(p).startswith("two_")
            for p in out["results"][0]["paths"]
        )
    finally:
        server.shutdown()


def test_batcher_queue_full_sheds(served):
    """A full batcher queue raises Overloaded -> 429 instead of growing."""
    server, svc, query, base = served
    if server._batcher is None:
        pytest.skip("direct variant has no batcher")
    import queue as queue_mod

    from centroids_reid_tpu.inference.server import Overloaded

    # fill the bounded queue directly (no worker will drain these fake
    # entries since they're behind a fake first entry? no — simpler: swap
    # in a tiny full queue)
    old_q = server._batcher._q
    tiny = queue_mod.Queue(maxsize=1)
    tiny.put_nowait("occupied")
    server._batcher._q = tiny
    try:
        with pytest.raises(Overloaded):
            server._batcher.submit(np.zeros((1, 32, 16, 3), np.uint8), svc)
    finally:
        server._batcher._q = old_q


def test_warmup_buckets_precompiles_dispatch_shapes(served):
    """warmup_buckets compiles every power-of-two dispatch shape up front,
    so no subsequent request (any coalesced size <= the bound) triggers a
    compile in the serving path."""
    server, svc, query, base = served
    server.warmup_buckets(4)               # shapes 1, 2, 4
    cache = svc._run._cache_size()
    assert cache >= 3

    qfiles = sorted(os.path.join(query, f) for f in os.listdir(query))
    blobs = [open(qfiles[0], "rb").read(), open(qfiles[1], "rb").read()]
    _post(base + "/search", {
        "images_b64": [base64.b64encode(b).decode() for b in blobs],
    })
    assert svc._run._cache_size() == cache  # no compile on request


def test_warmup_buckets_on_artifact_server_yuv420(tmp_path):
    """warmup_buckets must work when the server fronts a LoadedRetriever
    (artifact serving) with the yuv420 wire format: the artifact has no
    ``.cfg``, so the bucket shapes come from its ``input_size_hw`` meta
    (regression: the yuv420 branch used to read ``svc.cfg`` and crashed
    with AttributeError on artifact-backed servers)."""
    from centroids_reid_tpu.inference.export import (
        export_retriever,
        load_retriever,
        save_artifact,
    )
    from centroids_reid_tpu.inference.server import RetrievalHTTPServer
    from centroids_reid_tpu.models import init_model

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "resnet18"
    cfg.USE_MIXED_PRECISION = False
    cfg.INPUT.SIZE_TEST = [32, 16]
    cfg.TPU.FAST_DECODE = True           # serving wire format: yuv420
    model = create_model(cfg, num_classes=0)
    import jax

    params, batch_stats = init_model(
        model, jax.random.PRNGKey(0), tuple(cfg.INPUT.SIZE_TEST)
    )
    rng = np.random.RandomState(9)
    emb = rng.randn(16, 512).astype(np.float32)
    paths = np.array([f"g{i}" for i in range(16)])
    blob, meta, aux = export_retriever(
        model, cfg, params, batch_stats, emb, paths, k=3, batch_size=2,
        platforms=("cpu",),
    )
    assert meta["ingest"] == "yuv420"
    path = str(tmp_path / "ret_yuv.crtpu")
    save_artifact(path, blob, meta, aux=aux)
    ret = load_retriever(path)

    server = RetrievalHTTPServer(ret, port=0).start_background()
    try:
        server.warmup_buckets(2)         # shapes 1, 2 — must not raise
        n0 = ret.num_compiles
        import io

        buf = io.BytesIO()
        Image.fromarray(
            rng.randint(0, 255, (32, 16, 3), np.uint8)
        ).save(buf, "JPEG")
        img_bytes = buf.getvalue()
        status, out = _post(
            f"http://127.0.0.1:{server.port}/search",
            {"images_b64": [base64.b64encode(img_bytes).decode()]},
        )
        assert status == 200 and len(out["results"]) == 1
        assert ret.num_compiles == n0    # request paid no compile
    finally:
        server.shutdown()


def test_batcher_never_dispatches_above_max_batch():
    """Coalescing must close a batch BEFORE staging rows that would
    overflow max_batch — an overflowed batch pads to a power-of-two
    bucket ABOVE max_batch, a shape warmup_buckets never compiled (the
    exact serving-path-compile hole bucketing exists to close) — and a
    single request larger than max_batch must dispatch in max_batch-row
    slices. Unit-level: a fake service records every dispatch shape."""
    import threading
    import time

    from centroids_reid_tpu.inference.server import _DynamicBatcher

    class FakeService:
        def __init__(self):
            self.calls = []
            self.hold = threading.Event()  # set => dispatches proceed

        def query_arrays(self, imgs):
            self.calls.append(imgs.shape[0])
            self.hold.wait(10)
            v = imgs[:, 0].astype(np.int64)
            k = 3
            d = np.tile(v[:, None].astype(np.float64), (1, k))
            idx = np.tile(v[:, None], (1, k))
            paths = np.array(
                [[f"p{int(x)}"] * k for x in v], dtype=object
            )
            return d, idx, paths

    svc = FakeService()
    b = _DynamicBatcher(window_ms=200.0, max_batch=4, max_queue=64)
    results = {}

    def submit(tag, rows):
        imgs = np.full((rows, 1), tag, np.uint8)
        results[tag] = b.submit(imgs, svc)

    try:
        # hold the worker inside a first dispatch so the next two
        # requests queue up behind it and hit one coalescing window
        svc.hold.clear()
        t0 = threading.Thread(target=submit, args=(9, 1))
        t0.start()
        deadline = time.time() + 10
        while not svc.calls and time.time() < deadline:
            time.sleep(0.01)
        assert svc.calls, "worker never started the held dispatch"

        # 3 + 3 rows: coalescing both would overflow max_batch=4, so the
        # worker must close the batch at 3 and carry the second entry
        t1 = threading.Thread(target=submit, args=(1, 3))
        t1.start()
        while b._q.qsize() < 1 and time.time() < deadline:
            time.sleep(0.01)
        t2 = threading.Thread(target=submit, args=(2, 3))
        t2.start()
        while b._q.qsize() < 2 and time.time() < deadline:
            time.sleep(0.01)
        svc.hold.set()
        for t in (t0, t1, t2):
            t.join(30)

        assert all(c <= 4 for c in svc.calls), svc.calls
        for tag, rows in ((9, 1), (1, 3), (2, 3)):
            d, idx, paths = results[tag]
            assert d.shape[0] == rows
            assert set(np.unique(idx)) == {tag}

        # a single oversize request: 10 rows over max_batch=4 dispatches
        # as warmed max_batch slices (the 2-row tail pads to bucket 2)
        svc.calls.clear()
        submit(7, 10)
        assert svc.calls == [4, 4, 2], svc.calls
        d, idx, paths = results[7]
        assert d.shape[0] == 10
        assert set(np.unique(idx)) == {7}
        assert paths.shape == (10, 3)
    finally:
        svc.hold.set()
        b.stop()


# ---- round 5: re-ranked serving, liveness bound, direct-path slicing ----


@pytest.fixture(params=[0.0, 300.0], ids=["direct", "batched"])
def served_rerank(tmp_path, request):
    """A running server whose service re-ranks each query's top-8 window
    (RetrievalService(rerank_window=8)), plus everything needed to run
    the get_similar --rerank windowed CLI path on the same inputs."""
    rng = np.random.RandomState(0)
    gallery = tmp_path / "gallery"
    query = tmp_path / "query"
    gallery.mkdir()
    query.mkdir()
    arrays = {}
    for pid in ("prodA", "prodB", "prodC"):
        for i in range(4):
            arr = rng.randint(0, 255, (32, 16, 3), np.uint8)
            name = f"{pid}_{i:02d}.jpg"
            Image.fromarray(arr).save(gallery / name)
            arrays[name] = arr
    # queries are PERTURBED copies, not byte-identical ones: an exact
    # duplicate vector in the candidate window makes the k-reciprocal
    # rank tie-breaks order-dependent, and the CLI/serving paths narrow
    # the window in different candidate orders (legitimate divergence
    # only on exact ties — which production queries never are)
    for name in ("prodA_01.jpg", "prodB_02.jpg", "prodC_00.jpg"):
        noisy = np.clip(
            arrays[name].astype(np.int64)
            + rng.randint(-6, 7, arrays[name].shape), 0, 255
        ).astype(np.uint8)
        Image.fromarray(noisy).save(query / f"q_{name}")

    cfg = _cfg(tmp_path)
    model = create_model(cfg, num_classes=4)
    state, _ = create_train_state(cfg, model, 4, seed=0)
    mgr = CheckpointManager(str(tmp_path / "logs"))
    mgr.save_periodic(0, state, cfg)
    cfg.MODEL.PRETRAIN_PATH = mgr.latest_periodic()
    cfg.DATASETS.ROOT_DIR = str(gallery)
    emb, paths = build_embeddings(cfg, images_in_subfolders=False)

    from centroids_reid_tpu.inference import RetrievalService
    from centroids_reid_tpu.inference.server import RetrievalHTTPServer

    svc = RetrievalService(
        cfg, emb, paths, k=5, normalize=True, use_bf16_kernel=False,
        rerank_window=8, rerank_k1=4, rerank_k2=2, rerank_lambda=0.3,
    )
    server = RetrievalHTTPServer(
        svc, port=0, batch_window_ms=request.param
    ).start_background()
    try:
        yield (server, cfg, str(query),
               f"http://127.0.0.1:{server.port}")
    finally:
        server.shutdown()


def test_rerank_serving_matches_get_similar_cli(served_rerank, tmp_path):
    """VERDICT r4 #3: served re-ranked responses (direct AND batched)
    must equal the get_similar --rerank windowed CLI output
    (inference/api.py windowed branch) on the same inputs, and /healthz
    must report the mode."""
    server, cfg, query, base = served_rerank

    with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
        health = json.loads(r.read())
    assert health["rerank_window"] == 8

    # the CLI path on the same query images / gallery index
    from centroids_reid_tpu.inference import find_similar

    cfg2 = _cfg(tmp_path)
    cfg2.MODEL.PRETRAIN_PATH = cfg.MODEL.PRETRAIN_PATH
    cfg2.DATASETS.ROOT_DIR = query
    cfg2.OUTPUT_DIR = str(tmp_path / "cli_out")
    cfg2.TPU.RERANK = True
    cfg2.TPU.RERANK_WINDOW = 8
    cfg2.TPU.RERANK_K1 = 4
    cfg2.TPU.RERANK_K2 = 2
    cfg2.TPU.RERANK_LAMBDA = 0.3
    cli = find_similar(
        cfg2, gallery_data=cfg.OUTPUT_DIR, images_in_subfolders=False,
        normalize_features=True, topk=5,
    )

    qfiles = sorted(os.path.join(query, f) for f in os.listdir(query))
    blobs = [open(p, "rb").read() for p in qfiles]
    status, out = _post(base + "/search", {
        "images_b64": [base64.b64encode(b).decode() for b in blobs],
    })
    assert status == 200
    for qp, res in zip(qfiles, out["results"]):
        ref = cli[qp]
        assert res["indices"] == [int(j) for j in ref["indices"]]
        assert res["paths"] == [str(p) for p in ref["paths"]]
        np.testing.assert_allclose(
            res["distances"], ref["distances"], rtol=0, atol=1e-5
        )
        # byte-identical gallery copy still retrieves itself first
        assert os.path.basename(res["paths"][0]) == \
            os.path.basename(qp)[2:]


class _WedgeableService:
    """Duck-typed service whose dispatch can be wedged (tunnel-stall
    stand-in) and released; records nothing else."""

    k = 3
    model_name = "fake"
    ingest_format = "rgb"

    def __init__(self):
        import threading as _t

        self.paths = np.array(["a", "b", "c"])
        self.release = _t.Event()
        self.wedge = False
        self.calls = []

    def ingest_bytes(self, blobs):
        out = np.zeros((len(blobs), 4, 4, 3), np.uint8)
        for i, b in enumerate(blobs):
            out[i, 0, 0, 0] = b[0]  # tag rides byte 0 of the payload
        return out

    def query_arrays(self, imgs):
        self.calls.append(imgs.shape[0])
        if self.wedge:
            assert self.release.wait(30), "test never released the wedge"
        n = imgs.shape[0]
        v = imgs[:, 0, 0, 0].astype(np.int64)
        d = np.tile(v[:, None].astype(np.float64), (1, self.k))
        idx = np.tile(v[:, None], (1, self.k))
        paths = np.array([["p"] * self.k] * n, dtype=object)
        return d, idx, paths


@pytest.mark.parametrize("window_ms", [0.0, 300.0],
                         ids=["direct", "batched"])
def test_dispatch_timeout_503_degraded_and_recovery(window_ms):
    """VERDICT r4 #4: a wedged device dispatch must not hang every
    handler forever — requests time out with 503 + Retry-After inside
    the deadline, /healthz reports degraded + the stuck counter, and the
    server recovers once the dispatch unwedges."""
    import threading
    import time as _time

    from centroids_reid_tpu.inference.server import RetrievalHTTPServer

    svc = _WedgeableService()
    server = RetrievalHTTPServer(
        svc, port=0, batch_window_ms=window_ms,
        dispatch_timeout_s=0.6,
    ).start_background()
    base = f"http://127.0.0.1:{server.port}"
    body = {"images_b64": [base64.b64encode(b"\x07hello").decode()]}
    try:
        svc.wedge = True
        results = {}

        def post(tag):
            results[tag] = _post_err(
                base + "/search", json.dumps(body).encode()
            )

        ta = threading.Thread(target=post, args=("a",))
        ta.start()
        deadline = _time.time() + 10
        while not svc.calls and _time.time() < deadline:
            _time.sleep(0.01)
        assert svc.calls, "first request never reached the device"

        # second request: must 503 within the deadline, not block
        t0 = _time.time()
        code_b, err_b = _post_err(
            base + "/search", json.dumps(body).encode()
        )
        elapsed = _time.time() - t0
        assert code_b == 503, (code_b, err_b)
        assert "stalled" in err_b["error"]
        assert elapsed < 5.0, f"503 took {elapsed:.1f}s"

        # the wedged dispatch outlives the timeout -> degraded health
        _time.sleep(0.7)
        with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
            health = json.loads(r.read())
        assert health["status"] == "degraded"
        assert health["in_dispatch_s"] > 0.6
        assert health["stuck"] >= 1

        # unwedge: in-flight work drains, new traffic serves again
        svc.wedge = False
        svc.release.set()
        ta.join(30)
        code_c, out_c = _post_err(
            base + "/search", json.dumps(body).encode()
        )
        assert code_c == 200
        assert out_c["results"][0]["distances"][0] == 7.0
        with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"
        assert health["in_dispatch_s"] == 0.0
    finally:
        svc.release.set()
        server.shutdown()


@pytest.mark.parametrize("window_ms", [0.0, 300.0],
                         ids=["direct", "batched"])
def test_timeout_behind_healthy_dispatches_is_429(window_ms):
    """A dispatch deadline that passes behind HEALTHY dispatches (no
    in-flight dispatch older than the bound — plain backlog) sheds with
    429 like the other overload paths, never a phantom device wedge's
    503. The wedged side of the classification is
    test_dispatch_timeout_503_degraded_and_recovery; here the dispatch
    clock is pinned young so the same timeout deterministically
    classifies as backlog."""
    import threading
    import time as _time

    from centroids_reid_tpu.inference.server import RetrievalHTTPServer

    class _YoungClock:
        """Every in-flight dispatch reads as younger than the bound."""

        def begin(self):
            return 0

        def end(self, tok):
            pass

        def oldest_age_s(self):
            return 0.05

    svc = _WedgeableService()
    server = RetrievalHTTPServer(
        svc, port=0, batch_window_ms=window_ms, dispatch_timeout_s=0.6,
    ).start_background()
    clock = _YoungClock()
    server._clock = clock
    if server._batcher is not None:
        server._batcher._clock = clock
    base = f"http://127.0.0.1:{server.port}"
    body = {"images_b64": [base64.b64encode(b"\x07hello").decode()]}
    ta = None
    try:
        svc.wedge = True
        ta = threading.Thread(target=lambda: _post_err(
            base + "/search", json.dumps(body).encode()
        ))
        ta.start()
        deadline = _time.time() + 10
        while not svc.calls and _time.time() < deadline:
            _time.sleep(0.01)
        assert svc.calls, "first request never reached the device"

        code, err = _post_err(base + "/search", json.dumps(body).encode())
        assert code == 429, (code, err)
        assert "overloaded" in err["error"]

        # backlog shedding is not a device wedge: stuck counter untouched
        with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
            health = json.loads(r.read())
        assert health["stuck"] == 0
    finally:
        svc.release.set()
        if ta is not None:
            ta.join(30)
        server.shutdown()


def test_direct_path_oversize_request_slices_at_max_batch():
    """ADVICE r4: a direct-path (no batcher) request larger than
    max_batch must dispatch in max_batch-row slices padded to warmed
    buckets — never one never-compiled oversize shape — with results
    stitched back in order."""
    from centroids_reid_tpu.inference.server import RetrievalHTTPServer

    svc = _WedgeableService()
    server = RetrievalHTTPServer(
        svc, port=0, batch_window_ms=0.0, max_batch=4,
    ).start_background()
    base = f"http://127.0.0.1:{server.port}"
    try:
        blobs = [bytes([10 + i]) + b"x" for i in range(10)]
        status, out = _post(base + "/search", {
            "images_b64": [base64.b64encode(b).decode() for b in blobs],
        })
        assert status == 200
        # 10 rows over max_batch=4: two full slices + a 2-row bucket
        assert svc.calls == [4, 4, 2], svc.calls
        got = [r["distances"][0] for r in out["results"]]
        assert got == [float(10 + i) for i in range(10)]
    finally:
        server.shutdown()


def test_standalone_batcher_default_clock_classifies_wedge():
    """A _DynamicBatcher built without a server-supplied clock owns one
    (review r5), so a wedged dispatch still classifies as DispatchStuck
    after the timeout instead of every timeout misreporting as backlog."""
    import threading
    import time as _time

    from centroids_reid_tpu.inference.server import (
        DispatchStuck,
        _DynamicBatcher,
    )

    svc = _WedgeableService()
    svc.wedge = True
    b = _DynamicBatcher(window_ms=1.0, max_batch=8)
    img = np.zeros((1, 4, 4, 3), np.uint8)
    t = threading.Thread(target=lambda: b.submit(img, svc, timeout=10))
    t.start()
    try:
        deadline = _time.time() + 10
        while not svc.calls and _time.time() < deadline:
            _time.sleep(0.01)
        assert svc.calls, "first entry never dispatched"
        _time.sleep(0.3)  # let the wedged dispatch age past the bound
        with pytest.raises(DispatchStuck):
            b.submit(img, svc, timeout=0.5)
    finally:
        svc.release.set()
        t.join(30)
        b.stop()
