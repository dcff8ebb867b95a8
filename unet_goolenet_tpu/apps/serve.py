"""Serve a deployment artifact over HTTP with TPU micro-batching.

The reference's serving story is 分类/test.py — a script re-run per dataset,
models reloaded each time, no server. This CLI turns an export_serving
artifact (apps/export_serving.py) into a production grading endpoint:

    python -m unet_goolenet_tpu.apps.serve --artifact artifact/ --port 8000

    curl -X POST --data-binary @img.npy localhost:8000/v1/grade
    curl localhost:8000/healthz

Concurrent requests are coalesced into single padded device batches
(pipeline/serving.py): the chip sees power-of-two batches <= --max-batch
(bounded compile count), requests wait at most --max-wait-ms for peers.
"""

from __future__ import annotations

import argparse

from unet_goolenet_tpu.pipeline.export import load_serving
from unet_goolenet_tpu.pipeline.serving import GradingServer


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact", required=True,
                   help="export_serving output directory")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--max-batch", type=int, default=64,
                   help="device batch cap; compiles <= log2(max_batch)+1 "
                        "programs")
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="micro-batching window after the first request")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    artifact = load_serving(args.artifact)
    server = GradingServer(artifact, max_batch=args.max_batch,
                           max_wait_ms=args.max_wait_ms)
    print(f"serving {args.artifact} (raw_hw={artifact.meta.get('raw_hw')}, "
          f"platforms={artifact.meta.get('platforms')}) "
          f"on {args.host}:{args.port}", flush=True)
    server.serve(port=args.port, host=args.host)


if __name__ == "__main__":
    main()
