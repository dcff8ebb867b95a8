"""On-chip drive of the static-batch serving artifact (pipeline/export.py).

Exports the PRODUCTION-DEFAULT pipeline (hybrid dense trunk + Pallas
fused-up1 tail on TPU) at static_batch=128, loads it back, and serves a
130-image batch — exercising export -> load -> chunk(128) + zero-pad(126)
-> slice on the real chip. Grades are compared against the live pipeline at
the same N; the live N=130 trace is a DIFFERENT XLA program (different
batch tiling) so bitwise logit equality is not guaranteed — a small grade
mismatch count on random-weight nets is numerics, not a bug (same class as
probe_up2_parity's calibrated tolerance). PASS <= 2% mismatches.
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 128
N = 130
IMG_HW = (400, 500)
SIZE = 224


def main() -> int:
    import jax
    import jax.numpy as jnp

    from unet_goolenet_tpu.models import (GoogLeNetClassifier,
                                          UNetTaskAligWeight)
    from unet_goolenet_tpu.pipeline import TwoStagePipeline
    from unet_goolenet_tpu.pipeline.export import export_serving, load_serving

    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    unet = UNetTaskAligWeight(n_classes=1, dtype=dtype)
    gnet = GoogLeNetClassifier(num_classes=6, dtype=dtype)
    uv = unet.init({"params": key}, jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    gv = gnet.init({"params": key, "dropout": key},
                   jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    pipe = TwoStagePipeline(unet, uv, gnet, gv, img_size=SIZE, dtype=dtype)

    gray = jax.device_put(jax.random.uniform(
        key, (N, *IMG_HW), jnp.float32, 0.0, 255.0))

    with tempfile.TemporaryDirectory() as d:
        meta = export_serving(pipe, d, raw_hw=IMG_HW, static_batch=BATCH,
                              keep_fused=True)
        print(f"exported: fused_levels={meta['fused_levels']} "
              f"static_batch={meta['static_batch']} "
              f"platforms={meta['platforms']}", flush=True)
        runner = load_serving(d)
        got = np.asarray(runner(gray))          # 128-chunk + pad-2 + slice
    want = np.asarray(pipe.infer_grades(gray))  # live, traced at N=130
    assert got.shape == (N,), got.shape
    mismatch = int((got != want).sum())
    status = "ok" if mismatch <= 0.02 * N else "FAIL"
    print(f"static-artifact drive: N={N} chunked at {BATCH}, "
          f"grade mismatches vs live {mismatch}/{N} -> {status}", flush=True)
    return 0 if status == "ok" else 1


if __name__ == "__main__":
    raise SystemExit(main())
