"""BASELINE.json config sweep — one JSON line per config.

  1. UNet forward, 1x256x256 grayscale, batch 1
  2. GoogLeNet inference, 224x224 ROI crops, batch 8
  3. End-to-end two-stage: UNet mask -> on-device bbox crop -> GoogLeNet grade
  4. UNet training step (BCE+Dice, backward convs)
  5. Batched streaming inference: fused preprocess + bf16 two-stage
     (data-parallel over all visible devices; on the 1-chip dev env this is the
     single-chip bf16 streaming number)

Run on the default (TPU) backend: `python benchmarks/configs.py`.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _probe(fn, *args, iters=10):
    _ = np.asarray(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from unet_goolenet_tpu.models import UNetTaskAligWeight, GoogLeNetClassifier
    from unet_goolenet_tpu.pipeline import TwoStagePipeline
    from unet_goolenet_tpu.train import optim
    from unet_goolenet_tpu.train.seg import init_seg_state, make_seg_train_step

    key = jax.random.PRNGKey(0)
    results = []

    # ---- config 1: UNet forward, 1x256x256 "grayscale" (3-channel pseudo-RGB
    # like the reference feeds it), batch 1
    unet = UNetTaskAligWeight(n_classes=1)
    uv256 = unet.init({"params": key}, jnp.zeros((1, 256, 256, 3)), train=False)
    x256 = jax.random.uniform(key, (1, 256, 256, 3))
    f1 = jax.jit(lambda v, x: jnp.sum(unet.apply(v, x, train=False)))
    dt = _probe(f1, uv256, x256)
    results.append({"config": 1, "metric": "unet_fwd_256_b1",
                    "ms": round(dt * 1000, 2), "images_per_sec": round(1 / dt, 2)})

    # ---- config 2: GoogLeNet inference, 224 crops, batch 8
    gnet = GoogLeNetClassifier(num_classes=6)
    gv = gnet.init({"params": key, "dropout": key},
                   jnp.zeros((1, 224, 224, 3)), train=False)
    x8 = jax.random.uniform(key, (8, 224, 224, 3))
    f2 = jax.jit(lambda v, x: jnp.sum(gnet.apply(v, x, train=False)))
    dt = _probe(f2, gv, x8)
    results.append({"config": 2, "metric": "googlenet_fwd_224_b8",
                    "ms": round(dt * 1000, 2), "images_per_sec": round(8 / dt, 2)})

    # ---- config 3: e2e two-stage f32, batch 16
    uv224 = unet.init({"params": key}, jnp.zeros((1, 224, 224, 3)), train=False)
    pipe = TwoStagePipeline(unet, uv224, gnet, gv, img_size=224)
    gray = jax.random.uniform(key, (16, 400, 500), jnp.float32, 0, 255)
    f3 = lambda g: pipe.infer_grades(g)
    dt = _probe(f3, gray)
    results.append({"config": 3, "metric": "e2e_two_stage_f32_b16",
                    "ms": round(dt * 1000, 2), "images_per_sec": round(16 / dt, 2)})

    # ---- config 4: UNet training step (2-pass refinement, AdamW)
    tx = optim.make_adamw(1e-4)
    state = init_seg_state(unet, tx, key, input_shape=(1, 224, 224, 3))
    step = jax.jit(make_seg_train_step(unet, tx))
    imgs = jax.random.uniform(key, (4, 224, 224, 3))
    labels = (jax.random.uniform(key, (4, 224, 224, 1)) > 0.7).astype(jnp.float32)

    def f4(state):
        s2, m = step(state, imgs, labels)
        return m["loss"]

    dt = _probe(f4, state)
    results.append({"config": 4, "metric": "unet_train_step_b4",
                    "ms": round(dt * 1000, 2), "images_per_sec": round(4 / dt, 2)})

    # ---- config 5: bf16 streaming two-stage, data-parallel over all devices
    n_dev = len(jax.devices())
    unet16 = UNetTaskAligWeight(n_classes=1, dtype=jnp.bfloat16)
    gnet16 = GoogLeNetClassifier(num_classes=6, dtype=jnp.bfloat16)
    uv16 = unet16.init({"params": key}, jnp.zeros((1, 224, 224, 3)), train=False)
    gv16 = gnet16.init({"params": key, "dropout": key},
                       jnp.zeros((1, 224, 224, 3)), train=False)
    pipe16 = TwoStagePipeline(unet16, uv16, gnet16, gv16, img_size=224,
                              dtype=jnp.bfloat16)
    if n_dev > 1:
        from unet_goolenet_tpu.parallel import make_mesh, make_sharded_pipeline, \
            shard_batch, replicate
        mesh = make_mesh()
        pipe16.unet_vars = replicate(mesh, uv16)
        pipe16.gnet_vars = replicate(mesh, gv16)
        run = make_sharded_pipeline(pipe16, mesh)
        gray5 = shard_batch(mesh, jax.random.uniform(
            key, (16 * n_dev, 400, 500), jnp.float32, 0, 255))
        f5 = lambda g: run(g)["grades"]
        batch = 16 * n_dev
    else:
        gray5 = jax.random.uniform(key, (16, 400, 500), jnp.float32, 0, 255)
        f5 = lambda g: pipe16.infer_grades(g)
        batch = 16
    dt = _probe(f5, gray5)
    results.append({"config": 5, "metric": f"e2e_streaming_bf16_dp{n_dev}",
                    "ms": round(dt * 1000, 2),
                    "images_per_sec": round(batch / dt, 2)})

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
