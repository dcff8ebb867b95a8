"""Compiled-memory evidence for the b>16 train scaling regression (VERDICT r3
ask #7: back the 'two live activation sets push the backward into worse HBM
behavior' hypothesis with more than a hunch).

For each batch size, lower+compile the packed bf16 train step (no execution)
and print the executable's memory_analysis(): argument/output/temp/peak
bytes. If the temp (activation) footprint at b64 approaches the v5e's 16 GB
HBM or grows super-linearly, the HBM-pressure story holds; if it stays small,
the regression is bandwidth scheduling, not capacity, and remat cannot help.

Usage: python benchmarks/train_mem.py [--batch 8 16 32 64] [--bf16]
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unet_goolenet_tpu.models import UNetTaskAligWeight
from unet_goolenet_tpu.train import optim
from unet_goolenet_tpu.train.seg import init_seg_state, make_seg_train_step

SIZE = 224


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[8, 16, 32, 64])
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--remat", default="",
                    help="comma tokens forwarded to make_seg_train_step")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    model = UNetTaskAligWeight(n_classes=1, dtype=dtype)
    tx = optim.make_adamw(1e-4)
    state = init_seg_state(model, tx, jax.random.PRNGKey(0),
                           input_shape=(1, SIZE, SIZE, 3))
    remat = tuple(args.remat.split(",")) if args.remat else ()
    step = jax.jit(make_seg_train_step(model, tx, forward="engine-packed",
                                       remat=remat),
                   donate_argnums=0)

    print(f"\n## compiled train-step memory (packed "
          f"{'f32' if args.f32 else 'bf16'}, remat={remat or 'none'})\n")
    print("| batch | args MB | outputs MB | temps MB | peak MB |")
    print("|---|---|---|---|---|")
    for b in args.batch:
        imgs = jax.ShapeDtypeStruct((b, SIZE, SIZE, 3), jnp.float32)
        labels = jax.ShapeDtypeStruct((b, SIZE, SIZE, 1), jnp.float32)
        compiled = step.lower(state, imgs, labels).compile()
        try:
            m = compiled.memory_analysis()
            mb = lambda x: f"{x / 2**20:.0f}"
            print(f"| {b} | {mb(m.argument_size_in_bytes)} | "
                  f"{mb(m.output_size_in_bytes)} | "
                  f"{mb(m.temp_size_in_bytes)} | "
                  f"{mb(m.peak_memory_in_bytes)} |", flush=True)
        except Exception as e:  # pragma: no cover - backend support varies
            print(f"| {b} | memory_analysis unavailable: "
                  f"{type(e).__name__}: {e} |", flush=True)


if __name__ == "__main__":
    main()
