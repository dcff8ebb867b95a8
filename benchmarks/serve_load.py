"""Drive apps/serve.py on the real chip under concurrent client load (VERDICT
r3 ask #6).

The serving claims so far rest on bench.py's scan-amortised number; a
per-request HTTP dispatch path pays tunnel RTT + micro-batching waits and will
not reach it. This bench measures what a CLIENT actually sees:

  * starts the server as a subprocess (the ONE TPU process) in --live or
    --artifact mode with --warmup (no request pays a first-call compile),
  * N client threads each POST a single (400, 500) f32 .npy to /v1/grade in a
    closed loop for --seconds,
  * reports per-request p50/p95 latency + steady-state img/s per N, and the
    server's /healthz batch histogram (verifies the pow2 coalescing bound:
    <= log2(max_batch)+1 distinct device batch shapes).

Checkpoints: random-init states saved once to --workdir in a CPU-only
subprocess (weights don't affect throughput; same policy as bench.py).

Usage (nohup via benchmarks/run_onchip_queue15.sh):
    python benchmarks/serve_load.py --mode live --clients 1 8 32 --seconds 30
"""

from __future__ import annotations

import argparse
import http.client
import io
import json
import os
import statistics
import subprocess
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RAW_HW = (400, 500)


def ensure_checkpoints(workdir: str) -> tuple[str, str]:
    """Save random-init seg/cls checkpoints in a CPU-only subprocess (the TPU
    stays free for the server — single-tenant tunnel)."""
    seg = os.path.join(workdir, "seg")
    cls_ = os.path.join(workdir, "cls")
    if os.path.isdir(seg) and os.path.isdir(cls_):
        return seg, cls_
    code = f"""
import jax, sys
sys.path.insert(0, {REPO!r})
jax.config.update('jax_platforms', 'cpu')
from unet_goolenet_tpu.models import GoogLeNetClassifier, UNetTaskAligWeight
from unet_goolenet_tpu.train import optim
from unet_goolenet_tpu.train.checkpoint import CheckpointManager
from unet_goolenet_tpu.train.cls import init_cls_state
from unet_goolenet_tpu.train.seg import init_seg_state
key = jax.random.PRNGKey(0)
shape = (1, 224, 224, 3)
seg_state = init_seg_state(UNetTaskAligWeight(n_classes=1), optim.make_adamw(),
                           key, input_shape=shape)
cls_state = init_cls_state(GoogLeNetClassifier(num_classes=6),
                           optim.make_adamw(), key, input_shape=shape)
import os
m = CheckpointManager({workdir!r})
m._save(os.path.join({workdir!r}, 'seg'), seg_state, 0)
m._save(os.path.join({workdir!r}, 'cls'), cls_state, 0)
print('checkpoints saved')
"""
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable, "-c", code], env=env, check=True)
    # CheckpointManager lays out workdir/<name>/<step>; the serve CLI restores
    # a directory path
    for name in ("seg", "cls"):
        d = os.path.join(workdir, name)
        assert os.path.isdir(d), d
    return seg, cls_


def npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def post_grade(port: int, body: bytes, timeout: float = 300.0):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    try:
        conn.request("POST", "/v1/grade", body=body,
                     headers={"Content-Type": "application/octet-stream"})
        resp = conn.getresponse()
        data = json.loads(resp.read())
        return resp.status, data
    finally:
        conn.close()


def get_healthz(port: int):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    try:
        conn.request("GET", "/healthz")
        return json.loads(conn.getresponse().read())
    finally:
        conn.close()


def run_load(port: int, n_clients: int, seconds: float,
             req_batch: int = 1) -> dict:
    rng = np.random.default_rng(0)
    shape = RAW_HW if req_batch == 1 else (req_batch, *RAW_HW)
    bodies = [npy_bytes(rng.uniform(0, 255, shape).astype(np.float32))
              for _ in range(4 if req_batch > 1 else 8)]
    latencies: list[float] = []
    errors: list[str] = []
    count = [0]
    lock = threading.Lock()
    stop = threading.Event()

    def client(i: int):
        j = 0
        while not stop.is_set():
            t0 = time.perf_counter()
            try:
                status, data = post_grade(port, bodies[(i + j) % len(bodies)])
                dt = time.perf_counter() - t0
                if status != 200:
                    raise RuntimeError(f"status {status}: {data}")
                gs = data["grades"] if "grades" in data else [data["grade"]]
                assert all(0 <= int(g) < 6 for g in gs), gs
                with lock:
                    latencies.append(dt)
                    count[0] += len(gs)
            except Exception as e:  # noqa: BLE001 - report and keep looping
                with lock:
                    errors.append(f"{type(e).__name__}: {e}")
                time.sleep(0.5)
            j += 1

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(n_clients)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(seconds)
    stop.set()
    for t in threads:
        t.join(timeout=120)
    wall = time.perf_counter() - t_start
    lat = sorted(latencies)

    def pct(p):
        return lat[min(len(lat) - 1, int(p * len(lat)))] * 1e3 if lat else None

    return {
        "clients": n_clients,
        "requests": count[0],
        "img_per_s": round(count[0] / wall, 1),
        "p50_ms": round(pct(0.50), 1) if lat else None,
        "p95_ms": round(pct(0.95), 1) if lat else None,
        "mean_ms": round(statistics.mean(lat) * 1e3, 1) if lat else None,
        "errors": len(errors),
        "first_errors": errors[:3],
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=["live", "live-dp", "artifact"],
                    default="live")
    ap.add_argument("--clients", type=int, nargs="+", default=[1, 8, 32])
    ap.add_argument("--req-batch", type=int, default=1,
                    help="images per POST (batched .npy). On a 1-core host "
                         "64 single-image closed-loop clients saturate the "
                         "CLIENT CPU (np.save + HTTP per 0.8 MB image) long "
                         "before the server; batched posts measure the "
                         "server's HTTP-path capacity instead")
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--port", type=int, default=8077)
    ap.add_argument("--workdir", default="/tmp/ugt_serve_load")
    ap.add_argument("--static-batch", type=int, default=0,
                    help="(artifact) export with this static batch too")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    seg, cls_ = ensure_checkpoints(args.workdir)

    if args.mode == "artifact":
        art = os.path.join(args.workdir, "artifact")
        if not os.path.isdir(art):
            cmd = [sys.executable, "-m",
                   "unet_goolenet_tpu.apps.export_serving",
                   "--unet-checkpoint", seg, "--gnet-checkpoint", cls_,
                   "--out-dir", art, "--raw-hw", str(RAW_HW[0]),
                   str(RAW_HW[1]), "--bf16"]
            if args.static_batch:
                cmd += ["--static-batch", str(args.static_batch),
                        "--keep-fused"]
            print("exporting artifact (TPU):", " ".join(cmd), flush=True)
            subprocess.run(cmd, cwd=REPO, check=True)
        serve_args = ["--artifact", art]
    else:
        serve_args = ["--live", "--unet-checkpoint", seg,
                      "--gnet-checkpoint", cls_, "--raw-hw", str(RAW_HW[0]),
                      str(RAW_HW[1]), "--bf16"]
        if args.mode == "live-dp":
            serve_args.append("--data-parallel")

    cmd = [sys.executable, "-m", "unet_goolenet_tpu.apps.serve", *serve_args,
           "--port", str(args.port), "--max-batch", str(args.max_batch),
           "--max-wait-ms", str(args.max_wait_ms), "--warmup"]
    print("starting server:", " ".join(cmd), flush=True)
    proc = subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    try:
        # wait for warmup + bind (warmup compiles every pow2 bucket: minutes)
        deadline = time.monotonic() + 3600
        up = False
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                out = proc.stdout.read() if proc.stdout else ""
                raise SystemExit(f"server died rc={proc.returncode}:\n{out}")
            try:
                if get_healthz(args.port).get("ok"):
                    up = True
                    break
            except OSError:
                time.sleep(5)
        if not up:
            raise SystemExit("server never came up")

        print(f"\n## serve.py under load — mode={args.mode}, "
              f"max_batch={args.max_batch}, req_batch={args.req_batch}, "
              f"max_wait={args.max_wait_ms}ms, {args.seconds:.0f}s/point\n",
              flush=True)
        print("| clients | img/s | p50 ms | p95 ms | mean ms | errors |")
        print("|---|---|---|---|---|---|")
        for n in args.clients:
            r = run_load(args.port, n, args.seconds, args.req_batch)
            print(f"| {r['clients']} | {r['img_per_s']} | {r['p50_ms']} | "
                  f"{r['p95_ms']} | {r['mean_ms']} | {r['errors']} |",
                  flush=True)
            if r["errors"]:
                print("errors:", r["first_errors"], flush=True)
        hz = get_healthz(args.port)
        stats = hz.get("stats", hz)
        print("\nserver stats:", json.dumps(stats), flush=True)
        hist = stats.get("batch_size_histogram", {})
        import math
        bound = int(math.log2(args.max_batch)) + 1
        print(f"distinct device batch shapes: {len(hist)} "
              f"(pow2 bound <= {bound}: "
              f"{'OK' if len(hist) <= bound else 'VIOLATED'})", flush=True)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=60)
        except subprocess.TimeoutExpired:
            proc.kill()
        if proc.stdout:
            tail = proc.stdout.read()
            if tail:
                print("server log tail:\n", tail[-2000:], flush=True)


if __name__ == "__main__":
    main()
