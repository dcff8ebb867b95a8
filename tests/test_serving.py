"""Serving host (pipeline/serving.py): micro-batching semantics and the HTTP
front, driven against a real exported artifact."""

import io
import json
import threading
import time
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_goolenet_tpu.models import GoogLeNetClassifier, UNetTaskAligWeight
from unet_goolenet_tpu.pipeline import TwoStagePipeline
from unet_goolenet_tpu.pipeline.export import export_serving, load_serving
from unet_goolenet_tpu.pipeline.serving import GradingServer, MicroBatcher

S = 32
RAW = (40, 48)
RNG = np.random.default_rng(7)


# ---------------------------------------------------------------- batcher --

def test_batcher_coalesces_and_routes():
    calls = []

    def grade_fn(batch):
        calls.append(batch.shape[0])
        return batch[:, 0, 0].astype(np.int64)   # identity-ish: grade = pixel

    mb = MicroBatcher(grade_fn, max_batch=8, max_wait_ms=200.0)
    try:
        imgs = [np.full((4, 4), i, np.float32) for i in range(5)]
        out = mb.grade_many(imgs)
        assert out == [0, 1, 2, 3, 4]            # each grade routed correctly
        assert mb.device_calls <= 2              # coalesced, not 5 calls
        assert all(c in (1, 2, 4, 8) for c in calls)   # pow2-padded batches
    finally:
        mb.close()


def test_batcher_pads_to_pow2_and_caps():
    sizes = []

    def grade_fn(batch):
        sizes.append(batch.shape[0])
        return np.zeros(batch.shape[0], np.int64)

    mb = MicroBatcher(grade_fn, max_batch=4, max_wait_ms=100.0)
    try:
        mb.grade_many([np.zeros((2, 2), np.float32)] * 7)
        assert mb.images_total == 7
        assert all(s in (1, 2, 4) for s in sizes)      # never above max_batch
        assert max(sizes) == 4                         # cap reached
    finally:
        mb.close()


def test_batcher_concurrent_threads_one_batch():
    calls = []
    barrier = threading.Barrier(4)

    def grade_fn(batch):
        calls.append(batch.shape[0])
        return np.arange(batch.shape[0])

    mb = MicroBatcher(grade_fn, max_batch=8, max_wait_ms=300.0)
    results = []

    def worker(i):
        barrier.wait()
        results.append(mb.grade(np.full((2, 2), i, np.float32)))

    try:
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 4
        assert mb.device_calls <= 2   # 4 threads coalesced (usually 1 call)
    finally:
        mb.close()


@pytest.mark.parametrize("overlap", [True, False])
def test_batcher_overlap_stream_parity(overlap):
    """The double-buffered dispatcher (dispatch k+1 before fetching k's
    grades) routes every grade to its request across a stream of batches —
    and so does the overlap=False fallback. grade_fn returns a LAZY object
    (resolved only at np.asarray) to model jax async dispatch."""

    class Lazy:
        def __init__(self, arr):
            self._arr = arr

        def __array__(self, dtype=None, copy=None):
            time.sleep(0.01)     # "device executing" until the fetch
            return self._arr

    calls = []

    def grade_fn(batch):
        calls.append(batch.shape[0])
        return Lazy(batch[:, 0, 0].astype(np.int64))

    mb = MicroBatcher(grade_fn, max_batch=4, max_wait_ms=20.0,
                      overlap=overlap)
    try:
        # several sequential waves so the in-flight buffer carries across
        for wave in range(3):
            imgs = [np.full((2, 2), 10 * wave + i, np.float32)
                    for i in range(6)]
            assert mb.grade_many(imgs) == [10 * wave + i for i in range(6)]
        assert mb.images_total == 18
        assert all(c in (1, 2, 4) for c in calls)
    finally:
        mb.close()


def test_batcher_overlap_close_flushes_inflight():
    """close() must deliver a batch whose fetch is still pending."""
    done = threading.Event()

    class Lazy:
        def __init__(self, arr):
            self._arr = arr

        def __array__(self, dtype=None, copy=None):
            done.wait(5.0)
            return self._arr

    def grade_fn(batch):
        return Lazy(np.zeros(batch.shape[0], np.int64))

    mb = MicroBatcher(grade_fn, max_batch=4, max_wait_ms=5.0, overlap=True)
    got = []
    t = threading.Thread(target=lambda: got.append(
        mb.grade(np.zeros((2, 2), np.float32))))
    t.start()
    time.sleep(0.2)        # let the dispatcher issue the dispatch
    done.set()
    t.join(timeout=10)
    mb.close()
    assert got == [0]


# ------------------------------------------------------------------- http --

@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory):
    key = jax.random.PRNGKey(0)
    unet = UNetTaskAligWeight(n_classes=1)
    gnet = GoogLeNetClassifier(num_classes=6)
    uv = unet.init({"params": key}, jnp.zeros((1, S, S, 3)), train=False)
    gv = gnet.init({"params": key, "dropout": key},
                   jnp.zeros((1, S, S, 3)), train=False)
    pipe = TwoStagePipeline(unet, uv, gnet, gv, img_size=S)
    out = tmp_path_factory.mktemp("artifact")
    export_serving(pipe, str(out), raw_hw=RAW)
    return pipe, str(out)


@pytest.fixture(scope="module")
def server(artifact_dir):
    _, out = artifact_dir
    srv = GradingServer(load_serving(out), max_batch=8, max_wait_ms=5.0)
    port = srv.start()
    yield srv, port
    srv.close()


def _post_npy(port, arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/grade", data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_http_grade_parity(server, artifact_dir):
    pipe, _ = artifact_dir
    _, port = server
    gray = RNG.uniform(0, 255, (3, *RAW)).astype(np.float32)
    want = np.asarray(pipe.infer_grades(jnp.asarray(gray)))
    got = _post_npy(port, gray)["grades"]
    assert got == want.tolist()
    # single (H, W) image works too
    got1 = _post_npy(port, gray[0])["grades"]
    assert got1 == [int(want[0])]


def test_http_healthz_and_errors(server):
    srv, port = server
    # warm the stats surface ourselves: run in isolation, no device call has
    # happened yet and call_ms_p50 is None (ADVICE r4 — the test previously
    # leaned on test_http_grade_parity having run first on the shared server)
    _post_npy(port, RNG.uniform(0, 255, (1, *RAW)).astype(np.float32))
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz",
                                timeout=30) as r:
        h = json.loads(r.read())
    assert h["ok"] and h["meta"]["raw_hw"] == list(RAW)
    assert h["device_calls"] == srv.batcher.device_calls
    assert h["images"] == srv.batcher.images_total
    assert h["call_ms_p50"] is not None and h["call_ms_p50"] > 0
    assert sum(h["batch_size_histogram"].values()) == h["device_calls"]
    # the histogram records PADDED device batches (the compile-bound audit
    # surface, RESULTS.md queue 15): every key is a pow2 bucket
    for k in h["batch_size_histogram"]:
        assert int(k) & (int(k) - 1) == 0, k

    bad = RNG.uniform(0, 255, (2, 10, 10)).astype(np.float32)  # wrong raw_hw
    with pytest.raises(urllib.error.HTTPError) as e:
        _post_npy(port, bad)
    assert e.value.code == 400
    assert "raw_hw" in json.loads(e.value.read())["error"]


def test_http_rgb_artifact(artifact_dir, tmp_path):
    """An --source rgb artifact is servable: per-image (S, S, 3) bodies."""
    pipe, _ = artifact_dir
    export_serving(pipe, str(tmp_path), source="rgb")
    srv = GradingServer(load_serving(str(tmp_path)), max_batch=8,
                        max_wait_ms=5.0)
    port = srv.start()
    try:
        imgs = RNG.uniform(0, 1, (2, S, S, 3)).astype(np.float32)
        want = np.asarray(pipe.infer_from_rgb(jnp.asarray(imgs))["grades"])
        assert _post_npy(port, imgs)["grades"] == want.tolist()
        assert _post_npy(port, imgs[0])["grades"] == [int(want[0])]
        gray = RNG.uniform(0, 255, (2, S, S)).astype(np.float32)
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_npy(port, gray)   # gray body against an rgb graph: clean 400
        assert e.value.code == 400
    finally:
        srv.close()


# -------------------------------------------------------- dp-live serving --

def test_live_dp_serving_parity(artifact_dir):
    """apps/serve.py --live --data-parallel path: the dp-sharded grade_fn
    behind the batcher (pad_multiple = mesh size) matches single-device."""
    from unet_goolenet_tpu.parallel import make_mesh, make_sharded_pipeline

    pipe, _ = artifact_dir
    mesh = make_mesh()
    n_dev = mesh.devices.size
    assert n_dev == 8   # conftest's virtual mesh
    grade_fn = make_sharded_pipeline(pipe, mesh, source="grades")

    srv = GradingServer(grade_fn, max_batch=16, max_wait_ms=5.0,
                        pad_multiple=n_dev,
                        meta={"mode": "live", "raw_hw": list(RAW)})
    port = srv.start()
    try:
        gray = RNG.uniform(0, 255, (3, *RAW)).astype(np.float32)
        want = np.asarray(pipe.infer_grades(jnp.asarray(gray)))
        got = _post_npy(port, gray)["grades"]
        assert got == want.tolist()
        # every device batch was padded to a multiple of the mesh size
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz",
                                    timeout=30) as r:
            h = json.loads(r.read())
        assert h["meta"]["mode"] == "live"
    finally:
        srv.close()


def test_close_semantics_and_stress():
    """close() rejects new work fast; heavy concurrent traffic all routes
    correctly through coalesced batches."""
    def grade_fn(batch):
        return batch[:, 0, 0].astype(np.int64)

    mb = MicroBatcher(grade_fn, max_batch=8, max_wait_ms=2.0)
    results = {}

    def worker(i):
        results[i] = mb.grade(np.full((2, 2), i % 50, np.float32))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(32)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == {i: i % 50 for i in range(32)}   # every grade routed
    assert mb.device_calls < 32                        # some coalescing
    assert mb.images_total == 32

    mb.close()
    with pytest.raises(RuntimeError, match="closed"):
        mb.grade(np.zeros((2, 2), np.float32))
    mb.close()   # idempotent


def test_close_rearms_sentinel_for_stuck_dispatcher():
    """close() racing a device call that outlasts its join window must NOT
    swallow the shutdown sentinel — the dispatcher has to find it once the
    call returns, grade the in-flight item, and exit (serving.py close())."""
    release = threading.Event()
    entered = threading.Event()

    def grade_fn(batch):
        entered.set()
        assert release.wait(30)   # simulate a long first-call XLA compile
        return batch[:, 0, 0].astype(np.int64)

    mb = MicroBatcher(grade_fn, max_batch=4, max_wait_ms=1.0)
    got = {}
    w = threading.Thread(target=lambda: got.update(g=mb.grade(
        np.full((2, 2), 7, np.float32), timeout=60)))
    w.start()
    assert entered.wait(10)       # dispatcher is now stuck inside grade_fn
    closer = threading.Thread(target=mb.close)   # join(10) will expire
    closer.start()
    closer.join(timeout=20)
    assert not closer.is_alive()  # close returned, leaving the sentinel armed
    release.set()                 # device call completes
    w.join(timeout=10)
    assert got.get("g") == 7      # in-flight item still graded
    mb._thread.join(timeout=10)
    assert not mb._thread.is_alive()   # dispatcher consumed the re-armed sentinel


def test_warmup_covers_all_buckets():
    calls = []

    def grade_fn(batch):
        calls.append(batch.shape[0])
        return np.zeros(batch.shape[0], np.int64)

    srv = GradingServer(grade_fn, max_batch=16, max_wait_ms=1.0,
                        pad_multiple=8, meta={"raw_hw": [4, 4]})
    try:
        assert srv.warmup() == [8, 16] == calls   # every bucket pre-compiled
        assert srv.batcher.device_calls == 0      # warmup isn't traffic
        # live request reuses a warmed bucket shape
        assert srv.batcher.grade(np.zeros((4, 4), np.float32)) == 0
        assert calls[-1] == 8
    finally:
        srv.close()

    srv2 = GradingServer(grade_fn, meta={})
    try:
        with pytest.raises(ValueError, match="raw_hw"):
            srv2.warmup()
    finally:
        srv2.close()


def test_pad_multiple_validation_and_bucketing():
    from unet_goolenet_tpu.pipeline.serving import _pow2_bucket

    with pytest.raises(ValueError, match="pad_multiple"):
        MicroBatcher(lambda b: [0] * len(b), max_batch=10, pad_multiple=4)
    assert _pow2_bucket(3, 16, 8) == 8      # rounded up to the mesh size
    assert _pow2_bucket(9, 16, 8) == 16
    assert _pow2_bucket(1, 16, 1) == 1
    assert _pow2_bucket(5, 8, 1) == 8
