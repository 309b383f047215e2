"""JSON-over-HTTP serving front-end for RetrievalService.

The reference ships only offline inference CLIs
(/root/reference/inference/create_embeddings.py, get_similar.py:96-135 —
batch jobs over folders); this adds the online-serving surface the TPU
build targets: a dependency-free HTTP endpoint over a device-resident
gallery, answering ranked retrieval queries in one TPU dispatch per
batch (inference/service.py).

Endpoints (all JSON):

  GET  /healthz
      -> {"status": "ok|degraded", "gallery_size": N, "k": K,
          "ingest": "rgb|yuv420", "model": cfg.MODEL.NAME,
          "rerank_window": r (0 = off),
          "in_dispatch_s": age of the oldest in-flight device dispatch,
          "dispatch_timeout_s": T, "stuck": count of 503s served, ...}
      "degraded" = a device dispatch has been in flight longer than the
      timeout (a wedged tunnel/queue) — new work is timing out with 503.
  POST /search   body {"images_b64": ["<base64 jpeg/png>", ...],
                       "k": optional int (<= service k)}
      -> {"results": [{"paths": [...], "indices": [...],
                       "distances": [...]}, ...]}  # one entry per image

Concurrency model: ThreadingHTTPServer accepts requests concurrently;
host-side decode/resize (GIL-releasing native path, data/transforms.py)
runs in each request's thread, while the device dispatch is serialised
by a lock — the chip executes one program at a time, so queueing at the
dispatch boundary (not in the XLA client) keeps latency predictable.
Overload bound: at most ``max_pending`` /search requests hold decoded
batches at once (and the batcher queue holds at most ``max_queue``
entries); past either bound requests are shed with HTTP 429 +
Retry-After, so a burst cannot grow host memory or queueing delay
without limit.
Liveness bound: a request waits at most ``dispatch_timeout_s`` for the
device (the batcher future / the dispatch lock) — a wedged dispatch (a
tunnel stall; this environment demonstrates they happen) answers 503 +
Retry-After instead of blocking every in-flight handler forever, and
/healthz flips to "degraded" with the stall age while it lasts. A
deadline that passes behind HEALTHY dispatches (plain backlog — no
dispatch older than the bound) answers 429 like the other shed paths,
so sustained overload never reads as phantom device wedges. The wedged
thread itself cannot be interrupted (it is inside the runtime), but the
server stays observable and every OTHER request stays bounded.
Gallery mutation is intentionally absent: the gallery is a device-
resident immutable index (rebuild + swap the service to update, the
same lifecycle as the reference's create_embeddings artifacts).

Dynamic batching (``batch_window_ms > 0``): concurrent requests coalesce
into ONE device dispatch. The dispatch path (tunnel or PCIe) carries a
fixed per-program latency (~45 ms through the dev tunnel, dominated by
the RTT, not the batch), so under concurrent load one [ΣB] program is
strictly cheaper than N serial [B] programs — the standard
serving-system trade (a bounded wait buys dispatch amortisation). A
request joins the open window and waits at most ``batch_window_ms``
beyond the in-flight dispatch; single-request traffic with the window
at 0 (default) keeps the direct one-request-one-dispatch path.
"""

from __future__ import annotations

import base64
import binascii
import json
import threading
import time
from concurrent.futures import Future
from concurrent.futures import TimeoutError as FuturesTimeout
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

MAX_BODY_BYTES = 256 << 20  # one POST; ~256 queries of phone-camera JPEGs


class Overloaded(RuntimeError):
    """Load-shed signal: the server is at its in-flight/queue bound —
    mapped to HTTP 429 with a Retry-After, never an unbounded wait."""


class DispatchStuck(RuntimeError):
    """Liveness signal: the device dispatch did not complete (or could
    not start) within ``dispatch_timeout_s`` — mapped to HTTP 503 with a
    Retry-After. The wedged dispatch thread itself cannot be interrupted
    (it is blocked inside the runtime/tunnel), but no OTHER request waits
    on it past the deadline."""


def _bucket_rows(n: int) -> int:
    """Next power of two >= n: the dispatch shape a coalesced batch pads
    to, capping the compiled-program set at log2(max_batch) sizes."""
    b = 1
    while b < n:
        b <<= 1
    return b


class _DispatchClock:
    """Start-time registry for in-flight device dispatches, so /healthz
    can surface a wedged one: ``oldest_age_s()`` is how long the
    longest-running dispatch has been in flight (0.0 when idle). Thread
    safe — the direct path and the batcher worker dispatch concurrently."""

    def __init__(self):
        self._lock = threading.Lock()
        self._active: dict = {}
        self._next = 0

    def begin(self) -> int:
        with self._lock:
            self._next += 1
            tok = self._next
            self._active[tok] = time.monotonic()
        return tok

    def end(self, tok: int) -> None:
        with self._lock:
            self._active.pop(tok, None)

    def oldest_age_s(self) -> float:
        with self._lock:
            if not self._active:
                return 0.0
            return time.monotonic() - min(self._active.values())


def _dispatch_sliced(svc, rows_arr: np.ndarray, max_batch: int,
                     clock: "_DispatchClock" = None):
    """Dispatch ``rows_arr`` in at most ``max_batch``-row slices, each
    zero-padded up to its power-of-two bucket (pad rows trimmed on the
    way out) — every shape this produces is one ``warmup_buckets``
    pre-compiled, on the batcher AND the direct path. Shared by both so
    an oversize request never dispatches a never-warmed shape."""
    out = []
    for s in range(0, rows_arr.shape[0], max_batch):
        part = rows_arr[s:s + max_batch]
        n = part.shape[0]
        pad = _bucket_rows(n) - n
        if pad:
            part = np.concatenate([
                part,
                np.zeros((pad, *part.shape[1:]), part.dtype),
            ])
        tok = clock.begin() if clock is not None else None
        try:
            d, idx, paths = svc.query_arrays(part)
        finally:
            if clock is not None:
                clock.end(tok)
        out.append((d[:n], idx[:n], paths[:n]))
    if len(out) == 1:
        return out[0]
    return tuple(np.concatenate([p[i] for p in out]) for i in range(3))


class _DynamicBatcher:
    """Coalesces concurrent query batches into single device dispatches.

    Requests enqueue (imgs, service, Future); a worker drains the queue —
    it blocks on the first entry, then keeps collecting while the staged
    rows stay within ``max_batch`` and ``window_ms`` hasn't passed since
    the first entry — and runs ONE ``query_arrays`` over the concatenated
    rows, then splits the results back per request. FIFO order; an entry
    that would push the staged rows past ``max_batch`` closes the batch
    and starts the next one, and a single request larger than
    ``max_batch`` dispatches alone in ``max_batch``-row slices — either
    way no dispatch ever exceeds ``max_batch`` rows, so every shape the
    worker produces is one ``warmup_buckets`` pre-compiled.

    Each entry carries the SERVICE it was validated against (the
    handler's snapshot), and a coalesced batch only ever spans entries of
    one service generation: a swap_service between enqueue and dispatch
    must not rank a request against a gallery with a different k, ingest
    format, or input size than the one its payload was validated/decoded
    for. On a generation boundary the staged batch dispatches on its own
    service and the first new-generation entry starts the next batch.

    ``max_queue`` bounds the queue; past it ``submit`` raises
    ``Overloaded`` instead of growing host memory without limit. NB: in
    the HTTP server every queued entry's submitter thread also holds a
    ``max_pending`` slot (acquired before decode, released after the
    result), so queue occupancy never exceeds ``max_pending`` there —
    this bound only shows through when set BELOW ``max_pending``; at the
    defaults (64 vs 32) it is a backstop for non-HTTP embedders of the
    batcher, not the operative limit.

    Coalesced batches are zero-padded up to the next power of two
    (pad rows dropped on the way out): XLA compiles one executable per
    distinct batch shape, so raw coalescing would compile a fresh
    program for every row-count the traffic happens to produce — a
    multi-second compile IN the serving path per new size (measured:
    53 s p99 on first exposure of a new size at a 100k gallery).
    Bucketing caps the shape set at log2(max_batch) programs; rows are
    embed/rank-independent, so padding never changes real rows' results.
    """

    def __init__(self, window_ms: float = 2.0, max_batch: int = 256,
                 max_queue: int = 64, clock: _DispatchClock = None):
        import queue

        self.window_s = float(window_ms) / 1e3
        self.max_batch = int(max_batch)
        # a standalone batcher owns its clock so timeout classification
        # (wedged 503 vs backlog 429) works without a server around it
        self._clock = clock if clock is not None else _DispatchClock()
        self._q: "queue.Queue" = queue.Queue(maxsize=int(max_queue))
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def submit(self, imgs: np.ndarray, service, timeout: float = None):
        """``timeout`` (seconds, None = wait forever): liveness bound on
        the coalesced dispatch. On expiry the entry is cancelled — if it
        is still queued the worker skips it entirely (no wasted device
        work); if its batch is already in flight the eventual result is
        dropped. What propagates distinguishes WHY the deadline passed:
        ``DispatchStuck`` (503) when a device dispatch itself has been in
        flight longer than the timeout (a wedged tunnel/queue — the same
        rule /healthz's "degraded" uses), ``Overloaded`` (429) when the
        wait was plain backlog of healthy dispatches — sustained
        overload must read as shed load, not phantom device wedges."""
        import queue

        fut: Future = Future()
        try:
            self._q.put_nowait((imgs, service, fut))
        except queue.Full:
            raise Overloaded(
                f"batch queue full ({self._q.maxsize} requests waiting)"
            )
        try:
            return fut.result(timeout)
        except FuturesTimeout:
            fut.cancel()
            if self._clock.oldest_age_s() < timeout:
                raise Overloaded(
                    f"queue wait exceeded {timeout:g}s behind healthy "
                    "dispatches"
                ) from None
            raise DispatchStuck(
                f"coalesced dispatch did not complete within {timeout:g}s"
            ) from None

    def stop(self):
        """Unblock and end the worker (server shutdown); queued requests
        ahead of the sentinel still complete."""
        self._q.put(None)  # blocking put: the sentinel must always land
        self._thread.join(10)

    def _dispatch(self, svc, rows_arr: np.ndarray):
        """Warmed-shape dispatch: ``max_batch``-row slices (a single
        request may exceed max_batch; coalescing never does), each padded
        to its power-of-two bucket and trimmed back."""
        return _dispatch_sliced(svc, rows_arr, self.max_batch, self._clock)

    def _worker(self):
        import queue
        import time

        pending = None  # carryover: entry that closed the previous batch
        # (a service-generation boundary, or rows that would overflow
        # max_batch) — it opens the next batch instead
        while True:
            first = pending if pending is not None else self._q.get()
            pending = None
            if first is None:
                return
            imgs, svc, fut = first
            staged = [(imgs, fut)]
            rows = imgs.shape[0]
            deadline = time.monotonic() + self.window_s
            while rows < self.max_batch:
                budget = deadline - time.monotonic()
                if budget <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=budget)
                except queue.Empty:
                    break
                if nxt is None:  # shutdown sentinel: finish this batch
                    self._q.put(None)
                    break
                if (nxt[1] is not svc
                        or rows + nxt[0].shape[0] > self.max_batch):
                    # generation boundary (swap_service after nxt was
                    # validated against the NEW service), or staging nxt
                    # would overflow max_batch into a bucket shape
                    # warmup_buckets never compiled: close this batch,
                    # nxt opens the next one
                    pending = nxt
                    break
                staged.append((nxt[0], nxt[2]))
                rows += nxt[0].shape[0]
            # drop entries whose submitter already timed out and
            # cancelled (set_running_or_notify_cancel marks the rest
            # running so a late cancel can no longer race set_result)
            staged = [
                (s_imgs, s_fut) for s_imgs, s_fut in staged
                if s_fut.set_running_or_notify_cancel()
            ]
            if not staged:
                continue
            try:
                batch = (
                    staged[0][0] if len(staged) == 1
                    else np.concatenate([s[0] for s in staged])
                )
                d, idx, paths = self._dispatch(svc, batch)
                off = 0
                for s_imgs, s_fut in staged:
                    n = s_imgs.shape[0]
                    s_fut.set_result(
                        (d[off:off + n], idx[off:off + n],
                         paths[off:off + n])
                    )
                    off += n
            except Exception as e:  # pragma: no cover — defensive
                for _, s_fut in staged:
                    if not s_fut.done():
                        s_fut.set_exception(e)


class RetrievalHTTPServer:
    """Wraps a RetrievalService in a threaded HTTP server.

    ``port=0`` binds an ephemeral port (tests); ``server.port`` reports
    the bound one. ``start_background()`` serves from a daemon thread and
    returns; ``shutdown()`` stops it.
    """

    def __init__(self, service, host: str = "127.0.0.1", port: int = 8000,
                 batch_window_ms: float = 0.0, max_batch: int = 256,
                 max_pending: int = 32, max_queue: int = 64,
                 dispatch_timeout_s: float = 30.0):
        """``max_pending`` bounds concurrent /search requests holding
        decoded batches (the real host-memory cost: ThreadingHTTPServer
        spawns a thread per connection, and without a bound a burst pins
        one decoded batch per thread while every request waits forever
        on the dispatch lock). Past the bound requests are shed with
        HTTP 429 + Retry-After — bounded memory, bounded queueing delay.
        ``max_queue`` additionally bounds the dynamic batcher's queue;
        since every queued entry also holds a pending slot, it only
        bites when set below ``max_pending``.
        ``dispatch_timeout_s`` bounds how long any request waits on the
        device (the dispatch lock / the batcher future): past it the
        request answers 503 + Retry-After and the ``stuck`` counter
        increments when a dispatch really is wedged (in flight longer
        than the bound — the same rule that flips /healthz to
        "degraded"), or 429 when the wait was backlog of healthy
        dispatches (0 disables the bound)."""
        self.service = service
        self._dispatch_lock = threading.Lock()
        self.max_pending = int(max_pending)
        self.max_batch = int(max_batch)
        self.dispatch_timeout_s = float(dispatch_timeout_s)
        self._pending = 0
        self._pending_lock = threading.Lock()
        self._clock = _DispatchClock()
        self._batcher = (
            _DynamicBatcher(batch_window_ms, max_batch, max_queue,
                            clock=self._clock)
            if batch_window_ms > 0 else None
        )
        self._thread = None
        self._serving = False
        self._stats_lock = threading.Lock()
        self._stats = {"requests": 0, "images": 0, "errors": 0, "shed": 0,
                       "stuck": 0}
        handler = _make_handler(self)
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.httpd.daemon_threads = True
        self.host, self.port = self.httpd.server_address[:2]

    def _acquire_slot(self):
        with self._pending_lock:
            if self._pending >= self.max_pending:
                raise Overloaded(
                    f"{self._pending} requests in flight "
                    f"(max_pending={self.max_pending})"
                )
            self._pending += 1

    def _release_slot(self):
        with self._pending_lock:
            self._pending -= 1

    # -- request work (called from handler threads) -----------------------
    def count(self, images: int = 0, error: bool = False,
              shed: bool = False, stuck: bool = False):
        with self._stats_lock:
            self._stats["requests"] += 1
            self._stats["images"] += images
            self._stats["errors"] += int(error)
            self._stats["shed"] += int(shed)
            self._stats["stuck"] += int(stuck)

    def health(self) -> dict:
        svc = self.service
        with self._stats_lock:
            stats = dict(self._stats)
        with self._pending_lock:
            pending = self._pending
        # a dispatch in flight longer than the timeout = the device path
        # is wedged; report it rather than a hollow "ok"
        age = self._clock.oldest_age_s()
        degraded = 0 < self.dispatch_timeout_s < age
        return {
            "status": "degraded" if degraded else "ok",
            "gallery_size": int(len(svc.paths)),
            "k": int(svc.k),
            "ingest": svc.ingest_format,
            "model": svc.model_name,
            "rerank_window": int(getattr(svc, "rerank_window", 0)),
            "batching": self._batcher is not None,
            "pending": pending,
            "max_pending": self.max_pending,
            "in_dispatch_s": round(age, 3),
            "dispatch_timeout_s": self.dispatch_timeout_s,
            **stats,
        }

    def search(self, payload: dict) -> dict:
        # snapshot: one request must not straddle a swap_service — k and
        # ingest are validated against THIS service, the decode uses its
        # ingest format/size, and the dispatch (direct, or via the
        # batcher entry that carries the snapshot) runs on the same
        # generation; the old service's gallery stays device-resident
        # until its last in-flight request completes
        svc = self.service
        imgs_b64 = payload.get("images_b64")
        if not isinstance(imgs_b64, list) or not imgs_b64:
            raise BadRequest("'images_b64' must be a non-empty list")
        k = payload.get("k", svc.k)
        # NB: bool is an int subclass — "k": true must not mean k=1
        if (not isinstance(k, int) or isinstance(k, bool)
                or not 1 <= k <= svc.k):
            raise BadRequest(
                f"'k' must be an int in [1, {svc.k}] (the service"
                " was built with k={}; rebuild it for deeper results)".format(
                    svc.k
                )
            )
        try:
            blobs = [base64.b64decode(s, validate=True) for s in imgs_b64]
        except (binascii.Error, TypeError) as e:
            raise BadRequest(f"invalid base64 image payload: {e}")
        # the in-flight slot is held across decode AND dispatch: decoded
        # batches are what actually cost host memory under a burst
        self._acquire_slot()
        try:
            try:
                # decode outside the lock (parallel across request
                # threads), dispatch under it
                imgs = svc.ingest_bytes(blobs)
            except Exception as e:
                raise BadRequest(f"undecodable image: {e}")
            timeout = self.dispatch_timeout_s or None
            if self._batcher is not None:
                # dynamic batching: this request's rows join the open
                # window and come back from a coalesced dispatch on the
                # snapshot service (bounded by the dispatch timeout)
                d, idx, paths = self._batcher.submit(imgs, svc,
                                                     timeout=timeout)
            else:
                # direct path buckets too (and slices oversize requests
                # at max_batch): without it every distinct request size
                # would compile its own program, and a request past the
                # warmed range would dispatch a never-compiled shape
                if not self._dispatch_lock.acquire(
                        timeout=-1 if timeout is None else timeout):
                    # same distinction as the batcher: a dispatch older
                    # than the bound = wedged device (503); a healthy
                    # dispatch churn holding the lock = overload (429)
                    if self._clock.oldest_age_s() < timeout:
                        raise Overloaded(
                            f"dispatch-lock wait exceeded {timeout:g}s "
                            "behind healthy dispatches"
                        )
                    raise DispatchStuck(
                        f"device dispatch held > {timeout:g}s by an "
                        "earlier request"
                    )
                try:
                    d, idx, paths = _dispatch_sliced(
                        svc, imgs, self.max_batch, self._clock
                    )
                finally:
                    self._dispatch_lock.release()
        finally:
            self._release_slot()
        return {
            "results": [
                {
                    "paths": [str(p) for p in paths[i, :k]],
                    "indices": [int(j) for j in idx[i, :k]],
                    "distances": [float(x) for x in d[i, :k]],
                }
                for i in range(len(blobs))
            ]
        }

    # -- lifecycle --------------------------------------------------------
    def serve_forever(self):
        """Foreground serving (the CLI). SIGTERM/SIGINT stop the accept
        loop and drain in-flight handlers before returning — the serving
        analogue of the training loop's graceful preemption
        (utils/preemption.py)."""
        import signal

        def _stop(signum, frame):
            # httpd.shutdown() blocks until serve_forever exits, so it
            # must not run on this (the serving) thread
            threading.Thread(target=self.httpd.shutdown).start()

        previous = {
            s: signal.signal(s, _stop)
            for s in (signal.SIGTERM, signal.SIGINT)
        }
        print(
            f"RetrievalHTTPServer on http://{self.host}:{self.port} "
            f"(gallery={len(self.service.paths)}, k={self.service.k})",
            flush=True,
        )
        self._serving = True
        try:
            self.httpd.serve_forever()
        finally:
            self._serving = False
            for s, old in previous.items():
                signal.signal(s, old)
            self.httpd.server_close()
            with self._stats_lock:
                stats = dict(self._stats)
            print(f"RetrievalHTTPServer stopped cleanly ({stats})",
                  flush=True)

    def start_background(self):
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._serving = True
        self._thread.start()
        return self

    def warmup_buckets(self, max_rows: int = 0) -> None:
        """Pre-compile every dispatch shape traffic can produce: the
        power-of-two buckets up to ``max_rows`` (default: the batcher's
        ``max_batch``, or 1 without batching). Run at startup so no
        request ever pays an XLA/Mosaic compile (the serving analogue of
        LoadedEmbedder.warmup). Both serving paths bucket-pad to powers
        of two and the batcher never dispatches above ``max_batch``, so
        warming up to the largest expected request size covers every
        shape (oversize single requests dispatch in ``max_batch`` slices;
        shapes past the service's query-chunk clamp reuse the chunk-size
        program this warmup also compiles)."""
        from ..data.transforms import ingest_item_shape

        svc = self.service
        if not max_rows:
            max_rows = self._batcher.max_batch if self._batcher else 1
        if hasattr(svc, "input_size_hw"):   # LoadedRetriever
            size_hw = svc.input_size_hw
        else:
            size_hw = tuple(svc.cfg.INPUT.SIZE_TEST)
        shape_tail = ingest_item_shape(svc.ingest_format, size_hw)
        b = 1
        while True:
            svc.query_arrays(np.zeros((b, *shape_tail), np.uint8))
            if b >= max_rows:
                break
            b <<= 1

    def swap_service(self, new_service) -> None:
        """Zero-downtime index refresh: atomically replace the resident
        gallery/service (the documented update lifecycle is rebuild +
        swap, matching the reference's create_embeddings artifact cycle).
        Requests that already snapshotted the old service — including
        ones waiting in the batcher queue — dispatch and slice against
        it (the batcher never mixes generations in one batch); requests
        arriving after the swap rank against the new gallery. Counters
        persist across swaps."""
        with self._dispatch_lock:
            self.service = new_service

    def shutdown(self):
        # BaseServer.shutdown() waits on an event that only serve_forever
        # sets — calling it on a server whose loop never started would
        # block forever, so a constructed-but-never-served instance just
        # closes its socket
        if self._serving:
            self.httpd.shutdown()
            self._serving = False
        self.httpd.server_close()
        if self._batcher is not None:
            self._batcher.stop()
        if self._thread is not None:
            self._thread.join(10)


class BadRequest(ValueError):
    pass


def _make_handler(server: RetrievalHTTPServer):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"
        # a client that stalls mid-request must not pin a handler thread
        # (and its body buffer) forever — reads time out and the
        # connection closes
        timeout = 120

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _reply(self, code: int, obj: dict, retry_after: int = 0):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            if retry_after:
                self.send_header("Retry-After", str(retry_after))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                return self._reply(200, server.health())
            return self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            # bodies we cannot (chunked Transfer-Encoding) or will not
            # (invalid Content-Length) drain would desync a kept-alive
            # connection — 411 and close it
            chunked = "chunked" in (
                self.headers.get("Transfer-Encoding") or ""
            ).lower()
            try:
                n = int(self.headers.get("Content-Length", 0))
            except (ValueError, TypeError):
                n = -1
            if chunked or n < 0:
                self.close_connection = True
                return self._reply(
                    411, {"error": "Content-Length required"}
                )
            if n > MAX_BODY_BYTES:
                # oversized: close instead of draining gigabytes
                self.close_connection = True
                return self._reply(
                    413, {"error": f"body exceeds {MAX_BODY_BYTES} bytes"}
                )
            # always drain the body before replying — an unread body would
            # desync the next request on a kept-alive connection
            body = self.rfile.read(n) if n > 0 else b""
            if self.path != "/search":
                return self._reply(404, {"error": f"unknown path {self.path}"})
            if n == 0:
                return self._reply(400, {"error": "missing request body"})
            try:
                payload = json.loads(body)
                if not isinstance(payload, dict):
                    raise BadRequest("body must be a JSON object")
                out = server.search(payload)
                server.count(images=len(out["results"]))
                return self._reply(200, out)
            except Overloaded as e:
                # load shed: bounded memory + an honest signal beats an
                # unbounded queue where every client times out
                server.count(error=True, shed=True)
                return self._reply(
                    429, {"error": f"overloaded: {e}"}, retry_after=1
                )
            except DispatchStuck as e:
                # liveness bound: the device path is wedged — 503 now
                # beats a client-side timeout later; /healthz reports
                # "degraded" while the stall persists
                server.count(error=True, stuck=True)
                return self._reply(
                    503, {"error": f"dispatch stalled: {e}"}, retry_after=5
                )
            except BadRequest as e:
                server.count(error=True)
                return self._reply(400, {"error": str(e)})
            except json.JSONDecodeError as e:
                server.count(error=True)
                return self._reply(400, {"error": f"invalid JSON: {e}"})
            except Exception as e:  # pragma: no cover — defensive
                server.count(error=True)
                return self._reply(
                    500, {"error": f"{type(e).__name__}: {e}"}
                )

    return Handler


def build_from_args(argv=None) -> RetrievalHTTPServer:
    """CLI construction: load a previously built gallery (create_embeddings
    artifacts: <gallery_data>/embeddings.npy + paths.npy) into a bound,
    not-yet-serving RetrievalHTTPServer."""
    import argparse

    from ..config import get_default_cfg
    from ..utils import enable_compile_cache
    from .service import RetrievalService

    # serving restarts (deploys, preemption) must not re-pay the XLA/
    # Mosaic compiles of the query program + warmup buckets: a warm disk
    # cache turns a minutes-long cold start into seconds
    enable_compile_cache()

    parser = argparse.ArgumentParser(
        description="HTTP retrieval serving over a device-resident gallery"
    )
    parser.add_argument("--config_file", default="", type=str)
    parser.add_argument(
        "--gallery_data", type=str, default="",
        help="dir with embeddings.npy/paths.npy from create_embeddings",
    )
    parser.add_argument(
        "--artifact", type=str, default="",
        help="serve a retriever artifact (inference/export_model.py "
        "--retriever): the one file carries program + weights + gallery, "
        "so no checkpoint, model config, or gallery_data is needed",
    )
    parser.add_argument("--host", default="127.0.0.1", type=str)
    parser.add_argument("--port", default=8000, type=int)
    parser.add_argument(
        "--topk", type=int, default=100,
        help="max results per query (the gallery depth the service ranks)",
    )
    parser.add_argument("--normalize_features", action="store_true")
    parser.add_argument(
        "--fp32_exact", action="store_true",
        help="fp32 selection kernel (default: bf16 select + exact re-score)",
    )
    parser.add_argument(
        "--batch_window_ms", type=float, default=0.0,
        help="dynamic batching: coalesce concurrent requests arriving "
             "within this window into one device dispatch (0 = off)",
    )
    parser.add_argument(
        "--max_batch", type=int, default=256,
        help="dynamic batching: max coalesced rows per dispatch",
    )
    parser.add_argument(
        "--max_pending", type=int, default=32,
        help="max concurrent /search requests holding decoded batches; "
             "beyond it requests are shed with HTTP 429",
    )
    parser.add_argument(
        "--max_queue", type=int, default=64,
        help="dynamic batching: max queued requests before shedding "
             "(queued requests also hold --max_pending slots, so this "
             "only binds when set below --max_pending)",
    )
    parser.add_argument(
        "--warmup_buckets", type=int, default=0,
        help="pre-compile the power-of-two dispatch shapes up to N rows "
             "before serving (no request pays an XLA compile); 0 = off",
    )
    parser.add_argument(
        "--dispatch_timeout", type=float, default=30.0,
        help="liveness bound (seconds) on any request's wait for the "
             "device; past it the request answers 503 and /healthz "
             "reports degraded (0 = unbounded)",
    )
    parser.add_argument(
        "--rerank_window", type=int, default=0,
        help="re-rank each query's top-N candidate window with "
             "k-reciprocal encoding inside the query program "
             "(ops/rerank.py); responses then equal the get_similar "
             "--rerank windowed CLI output. 0 = off (or TPU.RERANK + "
             "TPU.RERANK_WINDOW via config overrides on the "
             "--gallery_data path)",
    )
    parser.add_argument(
        "--int8_gallery", action="store_true",
        help="serve from a per-row int8 scalar-quantized gallery index "
             "(ops/retrieval_int8.py): 1-byte/elem selection state, "
             "distances stay exact fp32 (margin-select + re-score); "
             "end-to-end latency ~par with bf16 — the index's value is "
             "resident-memory capacity",
    )
    parser.add_argument(
        "--rerank_k1", type=int, default=None,
        help="k-reciprocal neighbourhood size (default: TPU.RERANK_K1)",
    )
    parser.add_argument(
        "--rerank_k2", type=int, default=None,
        help="local query-expansion size (default: TPU.RERANK_K2)",
    )
    parser.add_argument(
        "--rerank_lambda", type=float, default=None,
        help="original-distance weight (default: TPU.RERANK_LAMBDA)",
    )
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)

    if args.artifact and args.int8_gallery:
        raise SystemExit(
            "--int8_gallery applies to --gallery_data serving (the "
            "service quantizes at build); artifacts carry their gallery "
            "in the file — re-export instead"
        )
    if args.artifact:
        # artifact serving: everything (program, weights, gallery, paths,
        # ingest config) rides in the file — LoadedRetriever duck-types
        # the service surface the server needs. Re-ranking is a
        # load-time choice (no config on this path: the TPU.RERANK_*
        # config defaults apply unless the flags say otherwise — ONE
        # source of truth for the canonical k1/k2/lambda)
        from .export import load_retriever

        dtpu = get_default_cfg().TPU
        retriever = load_retriever(
            args.artifact,
            use_bf16_kernel=False if args.fp32_exact else None,
            rerank_window=args.rerank_window,
            rerank_k1=(dtpu.RERANK_K1 if args.rerank_k1 is None
                       else args.rerank_k1),
            rerank_k2=(dtpu.RERANK_K2 if args.rerank_k2 is None
                       else args.rerank_k2),
            rerank_lambda=(dtpu.RERANK_LAMBDA if args.rerank_lambda is None
                           else args.rerank_lambda),
        )
        retriever.warmup()  # first request must not pay the compile
        return RetrievalHTTPServer(
            retriever, args.host, args.port,
            batch_window_ms=args.batch_window_ms, max_batch=args.max_batch,
            max_pending=args.max_pending, max_queue=args.max_queue,
            dispatch_timeout_s=args.dispatch_timeout,
        )
    if not args.gallery_data:
        raise SystemExit("one of --gallery_data or --artifact is required")

    cfg = get_default_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)

    from pathlib import Path

    load_path = Path(args.gallery_data)
    emb = np.load(load_path / "embeddings.npy", allow_pickle=True)
    paths = np.load(load_path / "paths.npy", allow_pickle=True)

    mesh = None
    if cfg.TPU.SHARDED_RETRIEVAL:
        import jax

        from ..parallel.mesh import make_retrieval_mesh

        if jax.device_count() >= 2:
            mesh = make_retrieval_mesh()

    from .api import load_inference_model

    bundle = load_inference_model(cfg)
    qfn = None
    if cfg.TPU.INT8_EVAL:
        # int8 PTQ embed stage through the SAME cfg-driven flow as the
        # other int8 surfaces (models/quantized.quantize_for_serving):
        # INT8_CACHE_PATH artifact load/validate, else self-calibration on
        # the leading TPU.INT8_CALIB_BATCHES of the gallery's own images
        # (the query domain) — which requires the indexed files to be
        # readable on this host
        from ..data.datasets import Record
        from ..models.quantized import quantize_for_serving

        records = [Record(str(p), 0, 0, i) for i, p in enumerate(paths)]
        try:
            qfn = quantize_for_serving(cfg, *bundle, records)
        except OSError as e:
            raise SystemExit(
                f"TPU.INT8_EVAL needs the gallery images on this host to "
                f"calibrate (failed on {e}); serve without the flag, set "
                f"TPU.INT8_CACHE_PATH to a saved artifact, or run from a "
                f"machine that sees the indexed files"
            )

    # --rerank_window wins; otherwise the config drives it the same way
    # the get_similar CLI's windowed path is enabled (inference/api.py)
    rr = args.rerank_window
    if not rr and cfg.TPU.RERANK and cfg.TPU.RERANK_WINDOW > 0:
        rr = int(cfg.TPU.RERANK_WINDOW)
    service = RetrievalService(
        cfg, emb, paths, k=args.topk,
        normalize=args.normalize_features,
        use_bf16_kernel=not args.fp32_exact,
        model_bundle=bundle,
        mesh=mesh,
        int8_qfn=qfn,
        rerank_window=rr,
        rerank_k1=(cfg.TPU.RERANK_K1 if args.rerank_k1 is None
                   else args.rerank_k1),
        rerank_k2=(cfg.TPU.RERANK_K2 if args.rerank_k2 is None
                   else args.rerank_k2),
        rerank_lambda=(cfg.TPU.RERANK_LAMBDA if args.rerank_lambda is None
                       else args.rerank_lambda),
        use_int8_gallery=args.int8_gallery,
    )
    server = RetrievalHTTPServer(
        service, args.host, args.port,
        batch_window_ms=args.batch_window_ms, max_batch=args.max_batch,
        max_pending=args.max_pending, max_queue=args.max_queue,
        dispatch_timeout_s=args.dispatch_timeout,
    )
    if args.warmup_buckets:
        server.warmup_buckets(args.warmup_buckets)
    return server


def main(argv=None):
    build_from_args(argv).serve_forever()
