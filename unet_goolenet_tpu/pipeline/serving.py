"""Production serving host: micro-batching HTTP server over a deployment
artifact (pipeline/export.py).

The reference has no serving host at all — its "deployment" is re-running the
training repo per request (分类/test.py:139-152, eager Python, batch fixed by
the script). This module is the missing piece between an exported artifact and
production traffic:

    server = GradingServer(load_serving("artifact/"), max_batch=64)
    server.serve(port=8000)        # blocking; or .start() for a thread

    POST /v1/grade   body = .npy bytes, (H, W) or (N, H, W) float/uint8
                     -> {"grades": [g0, ...]}
    GET  /healthz    -> {"ok": true, "meta": {...}, "device_calls": N}

TPU-shaped decisions:
  * Micro-batching: concurrent requests are coalesced by a single dispatcher
    thread into ONE device call (queue drained up to max_batch, or whatever
    arrived within max_wait_ms of the first item). The chip sees large batches
    (MXU utilisation scales with batch — benchmarks/RESULTS.md batch sweep),
    requests see bounded latency.
  * Bounded compiles: every device call is padded UP to the next power of two
    (<= max_batch), so an artifact with a symbolic batch dimension compiles at
    most log2(max_batch)+1 programs, no matter what request sizes arrive.
    Padding rows replicate a real image; their grades are dropped.
  * One TPU process / one dispatcher: all device calls happen on the single
    dispatcher thread, serialising access to the chip (HTTP threads only
    enqueue + wait), so serving obeys the same one-process discipline as the
    rest of the framework.
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from collections import Counter, deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer as _ThreadingHTTPServer
from typing import Callable, Sequence

import numpy as np

__all__ = ["MicroBatcher", "GradingServer"]


def _pow2_bucket(n: int, cap: int, mult: int = 1) -> int:
    """Next power of two >= n (capped), rounded up to a multiple of `mult`
    (dp-sharded grade_fns need the batch divisible by the mesh size)."""
    b = 1
    while b < n and b < cap:
        b *= 2
    b = -(-b // mult) * mult
    return min(b, cap)


class _Pending:
    """One enqueued image awaiting its grade."""

    __slots__ = ("image", "event", "grade", "error")

    def __init__(self, image: np.ndarray):
        self.image = image
        self.event = threading.Event()
        self.grade = None
        self.error: Exception | None = None


class MicroBatcher:
    """Coalesce single-image requests into padded device batches.

    grade_fn: (N, H, W) float32 -> (N,) int grades, for any N <= max_batch
    (the exported artifact's batch-polymorphic call, or a live pipeline's
    infer_grades). Runs on ONE dispatcher thread.
    """

    def __init__(self, grade_fn: Callable[[np.ndarray], Sequence[int]], *,
                 max_batch: int = 64, max_wait_ms: float = 5.0,
                 pad_multiple: int = 1, grade_timeout_s: float = 600.0,
                 overlap: bool = True):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        if max_batch % pad_multiple:
            raise ValueError(f"max_batch ({max_batch}) must be a multiple of "
                             f"pad_multiple ({pad_multiple})")
        self._grade_fn = grade_fn
        self.max_batch = max_batch
        self.pad_multiple = pad_multiple
        self.max_wait_s = max_wait_ms / 1e3
        # double-buffered dispatch: jax dispatch is async, so the fetch of
        # batch k's grades (np.asarray = device execute + host transfer) can
        # ride under batch k+1's drain+dispatch — without it the chip idles
        # for the fetch RTT + host glue between every pair of batches
        # (~22% of per-dispatch serving capacity at b128, RESULTS.md q13/q19)
        self.overlap = overlap
        # default wait for a grade; generous because the FIRST call per pow2
        # bucket pays an XLA compile (minutes on the dev tunnel)
        self.grade_timeout_s = grade_timeout_s
        self._queue: queue.Queue[_Pending | None] = queue.Queue()
        self._closed = False
        # makes the closed-check atomic with the enqueue (grade_many) and with
        # setting _closed + the sentinel (close), so a request racing shutdown
        # either lands BEFORE the sentinel (graded in-flight) or gets the fast
        # RuntimeError — never a stranded _Pending waiting out grade_timeout_s
        self._close_lock = threading.Lock()
        # bounded metrics: a long-lived server must not grow per device call.
        # _stats_lock orders dispatcher updates against stats() reads (a
        # healthz snapshot iterating call_ms/batch_hist while the dispatcher
        # mutates them would raise "mutated during iteration")
        self._stats_lock = threading.Lock()
        self.device_calls = 0             # batches dispatched
        self.images_total = 0             # real (unpadded) images graded
        self.batch_hist: Counter = Counter()      # DEVICE batch size -> count
        # (padded size: the compile-bound contract is <= log2(max_batch)+1
        # distinct device shapes — measured under load in RESULTS.md q15)
        self.call_ms: deque = deque(maxlen=4096)  # recent device-call times
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="microbatcher")
        self._thread.start()

    def grade(self, image: np.ndarray, timeout: float | None = None) -> int:
        """Block until `image` is graded; returns the int grade."""
        return self.grade_many([image], timeout=timeout)[0]

    def grade_many(self, images: Sequence[np.ndarray],
                   timeout: float | None = None) -> list[int]:
        """Enqueue ALL images, then wait — one request's images coalesce into
        the same device batch instead of serialising through `grade`.
        timeout=None uses grade_timeout_s (compile-tolerant default)."""
        if timeout is None:
            timeout = self.grade_timeout_s
        pending = [_Pending(np.asarray(im, np.float32)) for im in images]
        with self._close_lock:
            if self._closed:
                raise RuntimeError("batcher is closed")
            for p in pending:
                self._queue.put(p)
        out = []
        for p in pending:
            if not p.event.wait(timeout):
                raise TimeoutError("grade request timed out")
            if p.error is not None:
                raise p.error
            out.append(p.grade)
        return out

    def close(self) -> None:
        """Grade in-flight items, stop the dispatcher, fail stragglers fast
        (instead of letting a request racing the shutdown wait out its full
        grade timeout)."""
        with self._close_lock:
            if self._closed:       # idempotent; only the first close signals
                self._thread.join(timeout=10)
                return
            self._closed = True
            self._queue.put(None)
        self._thread.join(timeout=10)
        # Fail any stragglers the dispatcher never reached. The lock above
        # guarantees no _Pending sits BEHIND the sentinel, so everything here
        # is either a pre-sentinel item a still-stuck dispatcher hasn't graded
        # yet, or the sentinel itself. If the dispatcher is still alive (e.g.
        # mid device call that outlasted the join), re-arm its sentinel rather
        # than swallowing it — otherwise it would block on get() forever.
        while True:
            try:
                p = self._queue.get_nowait()
            except queue.Empty:
                break
            if p is None:
                if self._thread.is_alive():
                    self._queue.put(None)
                    break
                continue
            p.error = RuntimeError("batcher is closed")
            p.event.set()

    def stats(self) -> dict:
        """Serving metrics snapshot. Latency percentiles cover the last
        len(call_ms)<=4096 device calls (incl. compile-heavy first calls);
        counters cover the whole lifetime at O(1) memory."""
        with self._stats_lock:
            ms = sorted(self.call_ms)
            calls = self.device_calls
            images = self.images_total
            hist = dict(self.batch_hist)

        def pct(p):
            return round(ms[min(len(ms) - 1, int(p * len(ms)))], 2) if ms else None

        return {
            "device_calls": calls,
            "images": images,
            "call_ms_p50": pct(0.50),
            "call_ms_p99": pct(0.99),
            "call_ms_max": round(ms[-1], 2) if ms else None,
            "batch_size_histogram": {
                str(s): c for s, c in sorted(hist.items())},
        }

    # -- dispatcher ---------------------------------------------------------

    def _drain(self, first: _Pending) -> tuple[list[_Pending], bool]:
        """Gather up to max_batch items arriving within max_wait_s of `first`.
        Returns (items, closing)."""
        batch = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                item = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if item is None:       # close() sentinel: grade in-flight, then stop
                return batch, True
            batch.append(item)
        return batch, False

    def _dispatch(self, items: list) -> tuple | None:
        """Stack+pad `items` and issue the device call WITHOUT fetching.
        Returns an in-flight record for _finish, or None if the dispatch
        itself failed (items already failed). jax dispatch is async: the
        returned value is a future-like device array whose np.asarray blocks
        until execution + transfer complete."""
        try:
            real = np.stack([p.image for p in items])
            n = real.shape[0]
            padded_n = _pow2_bucket(n, self.max_batch, self.pad_multiple)
            if padded_n > n:   # replicate a real image; grades dropped
                pad = np.broadcast_to(real[:1],
                                      (padded_n - n, *real.shape[1:]))
                real = np.concatenate([real, pad])
            t0 = time.monotonic()
            return items, n, padded_n, self._grade_fn(real), t0
        except Exception as e:                        # pragma: no cover - rare
            for p in items:
                p.error = e
                p.event.set()
            return None

    def _finish(self, inflight: tuple) -> None:
        """Fetch an in-flight batch's grades and release its waiters."""
        items, n, padded_n, result, t0 = inflight
        try:
            grades = np.asarray(result)
            with self._stats_lock:
                # dispatch -> grades-on-host; under overlap this includes
                # the next batch's drain riding on top of the device time
                self.call_ms.append((time.monotonic() - t0) * 1e3)
                self.device_calls += 1
                self.images_total += n
                self.batch_hist[padded_n] += 1
            for p, g in zip(items, grades[:n]):
                p.grade = int(g)
                p.event.set()
        except Exception as e:                        # pragma: no cover - rare
            for p in items:
                p.error = e
                p.event.set()

    def _loop(self) -> None:
        # Double-buffered: at most ONE batch in flight while the next batch
        # drains + dispatches; the fetch happens after the next dispatch is
        # issued, so device execution and host glue overlap. When the queue
        # is idle the in-flight batch is fetched immediately — a lone batch
        # never waits on future traffic. Latency cost per batch: at most the
        # next batch's drain window (<= max_wait_ms) + its dispatch glue.
        inflight = None
        while True:
            if inflight is None:
                first = self._queue.get()
            else:
                try:
                    first = self._queue.get_nowait()
                except queue.Empty:
                    self._finish(inflight)
                    inflight = None
                    continue
            if first is None:
                if inflight is not None:
                    self._finish(inflight)
                return
            items, closing = self._drain(first)
            nxt = self._dispatch(items)
            if inflight is not None:
                self._finish(inflight)
            inflight = nxt
            if not self.overlap and inflight is not None:
                self._finish(inflight)
                inflight = None
            if closing:
                if inflight is not None:
                    self._finish(inflight)
                return


class ThreadingHTTPServer(_ThreadingHTTPServer):
    """stdlib ThreadingHTTPServer with a production listen backlog: the
    default request_queue_size of 5 resets connections under concurrent
    load (measured: 137 ECONNRESET at 64 closed-loop clients, RESULTS.md
    queue 15) long before the batcher or the chip saturates."""

    request_queue_size = 128
    daemon_threads = True


class GradingServer:
    """HTTP front over a MicroBatcher. Accepts a loaded ServingArtifact
    (pipeline/export.load_serving) or any (N, H, W) -> (N,) grade callable."""

    def __init__(self, artifact, *, max_batch: int = 64,
                 max_wait_ms: float = 5.0, pad_multiple: int = 1,
                 grade_timeout_s: float = 600.0, meta: dict | None = None,
                 overlap: bool = True):
        self.meta = dict(meta if meta is not None
                         else getattr(artifact, "meta", {}))
        raw_hw = self.meta.get("raw_hw")
        # per-image shape the grade_fn expects: (H, W) gray, or (S, S, 3) for
        # an rgb-source artifact (export_serving --source rgb)
        shape = tuple(raw_hw) if raw_hw else None
        if shape is not None and self.meta.get("source") == "rgb":
            shape = (*shape, 3)
        self._expect_shape = shape
        self.batcher = MicroBatcher(artifact, max_batch=max_batch,
                                    max_wait_ms=max_wait_ms,
                                    pad_multiple=pad_multiple,
                                    grade_timeout_s=grade_timeout_s,
                                    overlap=overlap)
        self._httpd: ThreadingHTTPServer | None = None

    # -- request handling ---------------------------------------------------

    def _grade_npy(self, body: bytes) -> list[int]:
        try:
            arr = np.load(io.BytesIO(body), allow_pickle=False)
        except Exception as e:   # malformed body is the CLIENT's fault: 400
            raise ValueError(f"body is not a valid .npy array: {e}") from e
        if not isinstance(arr, np.ndarray):   # e.g. .npz bytes -> NpzFile
            raise ValueError("body must be a single .npy array, not "
                             f"{type(arr).__name__} (.npz archives are not "
                             "accepted)")
        nd = len(self._expect_shape) if self._expect_shape else 2
        if arr.ndim == nd:
            arr = arr[None]
        if arr.ndim != nd + 1:
            want = self._expect_shape or "(H, W)"
            raise ValueError(f"expected per-image shape {want} (optionally "
                             f"batched), got {arr.shape}")
        if self._expect_shape and tuple(arr.shape[1:]) != self._expect_shape:
            raise ValueError(
                f"graph was built for raw_hw={self.meta.get('raw_hw')} "
                f"(source={self.meta.get('source', 'gray')}, per-image shape "
                f"{self._expect_shape}), got {tuple(arr.shape[1:])}")
        return self.batcher.grade_many(list(arr.astype(np.float32)))

    def _handler(server_self):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):   # quiet; the caller owns logging
                pass

            def _send(self, code: int, obj: dict) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, {"ok": True, "meta": server_self.meta,
                                     **server_self.batcher.stats()})
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/v1/grade":
                    self._send(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    grades = server_self._grade_npy(self.rfile.read(n))
                    self._send(200, {"grades": grades})
                except ValueError as e:
                    self._send(400, {"error": str(e)})
                except Exception as e:    # pragma: no cover - device failure
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})
        return Handler

    # -- lifecycle ----------------------------------------------------------

    def warmup(self) -> list[int]:
        """Pre-compile every pow2/pad_multiple batch bucket with zero batches
        so no live request pays a first-call XLA compile. Returns the bucket
        sizes warmed. Requires meta raw_hw (else there is no input shape to
        build). Call BEFORE serving traffic: this runs grade_fn on the caller
        thread, which is only safe while the dispatcher is idle."""
        if self._expect_shape is None:
            raise ValueError("warmup needs meta['raw_hw'] to build inputs")
        mb = self.batcher
        buckets, b = [], 1
        while True:
            padded = _pow2_bucket(b, mb.max_batch, mb.pad_multiple)
            if padded not in buckets:
                buckets.append(padded)
            if padded >= mb.max_batch:
                break
            b = padded + 1
        for size in buckets:
            batch = np.zeros((size, *self._expect_shape), np.float32)
            np.asarray(mb._grade_fn(batch))   # compile + execute, result dropped
        return buckets

    def start(self, port: int = 0, host: str = "127.0.0.1") -> int:
        """Serve on a background thread; returns the bound port."""
        self._httpd = ThreadingHTTPServer((host, port), self._handler())
        threading.Thread(target=self._httpd.serve_forever, daemon=True,
                         name="grading-http").start()
        return self._httpd.server_address[1]

    def serve(self, port: int = 8000, host: str = "0.0.0.0") -> None:
        """Blocking serve (the CLI entry)."""
        self._httpd = ThreadingHTTPServer((host, port), self._handler())
        self._httpd.serve_forever()

    def close(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
        self.batcher.close()
