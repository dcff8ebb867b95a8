"""On-chip Mosaic lowering/compile probe for the dense fused decoder kernels
(VERDICT r4 ask #1).

fused_up_dense passes the CPU cross-lowering gate (test_mosaic_lowering) but
the REAL backend rejected it at the up3/up4 geometries in round 3 with a
`dma_start` error (pipeline/two_stage.py fused_up34 note). This probe
compiles (and optionally executes + parity-checks) each geometry separately
so the exact reject surfaces with its full message. Compile-time Mosaic
errors are SAFE (Python exception, no worker wedge — ONCHIP_RUNBOOK.md);
execution is opt-in per geometry via --run once the compile is green.

Usage:
  python benchmarks/up_dense_probe.py --geom up3           # compile only
  python benchmarks/up_dense_probe.py --geom up3 --run     # + execute/parity
  python benchmarks/up_dense_probe.py --geom all
Geometries: up2d (c=128,cq=64 dense-out — fused_up2 minus the pack epilogue),
up3 (c=256,cq=128,h=56), up4 (c=512,cq=256,h=28).
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unet_goolenet_tpu.ops.pallas import up2 as U2

DT = jnp.bfloat16

GEOMS = {
    # name: (c, cq, h_out, tile)
    "up2d": (128, 64, 112, 28),
    "up3": (256, 128, 56, 28),
    "up4": (512, 256, 28, 14),
}


def build(c, cq, h, tile, batch):
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 12)
    f = jnp.float32
    r = lambda i, *s: (jax.random.normal(ks[i], s, f) * 0.1)
    ws = dict(w_up=r(0, 2, 2, c, c), b_up=r(1, c),
              w_e1=r(2, 3, 3, c, c), b_e1=r(3, c),
              w_d2=r(4, 3, 3, c, c), b_d2=r(5, c),
              w_pair=r(6, 3, 3, 2 * c, cq), b_pair=r(7, cq),
              w_blk1=r(8, 3, 3, cq, cq), b_blk1=r(9, cq))
    x = (jax.random.normal(ks[10], (batch, h // 2, h // 2, c), f) * 0.1
         ).astype(DT)
    skip = (jax.random.normal(ks[11], (batch, h, h, c), f) * 0.1).astype(DT)

    def chain(x, skip):
        e1, avg, mx = U2.fused_cbn_stats_dense(skip, ws["w_e1"], ws["b_e1"])
        gate = jax.nn.sigmoid(avg + mx).astype(DT)
        return U2.fused_up_dense(x, e1, 1.0 + gate[:, 0, 0, :],
                                 ws["w_up"], ws["b_up"], ws["w_d2"],
                                 ws["b_d2"], ws["w_pair"], ws["b_pair"],
                                 ws["w_blk1"], ws["b_blk1"], tile_rows=tile)

    def oracle(x, skip):
        # XLA reference: the same level via the dense engine ops
        from unet_goolenet_tpu.pipeline import engine as E
        from unet_goolenet_tpu import ops
        w_e1f, b_e1f = ws["w_e1"], ws["b_e1"]
        up = ops.conv_transpose2x2(x, ws["w_up"].astype(DT),
                                   ws["b_up"].astype(DT))
        e1 = jax.nn.relu(ops.conv2d(skip, w_e1f.astype(DT),
                                    b_e1f.astype(DT), padding=1))
        avg = jnp.mean(e1, axis=(1, 2), keepdims=True)
        mx = jnp.max(e1, axis=(1, 2), keepdims=True)
        gate = jax.nn.sigmoid(avg + mx).astype(DT)
        d2 = jax.nn.relu(ops.conv2d(up, ws["w_d2"].astype(DT),
                                    ws["b_d2"].astype(DT), padding=1))
        gated = e1 + (1.0 + gate) * d2
        cat = jnp.concatenate([up, gated], axis=-1)
        hh = jax.nn.relu(ops.conv2d(cat, ws["w_pair"].astype(DT),
                                    ws["b_pair"].astype(DT), padding=1))
        return jax.nn.relu(ops.conv2d(hh, ws["w_blk1"].astype(DT),
                                      ws["b_blk1"].astype(DT), padding=1))

    return chain, oracle, x, skip


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--geom", default="all",
                    choices=[*GEOMS.keys(), "all"])
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--run", action="store_true",
                    help="execute + parity-check after a green compile "
                         "(runtime crashes CAN wedge the worker — only with "
                         "everything committed)")
    ap.add_argument("--tile", type=int, default=0,
                    help="override the geometry's default tile")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)

    names = list(GEOMS) if args.geom == "all" else [args.geom]
    for name in names:
        c, cq, h, tile = GEOMS[name]
        if args.tile:
            tile = args.tile
        chain, oracle, x, skip = build(c, cq, h, tile, args.batch)
        print(f"\n=== {name}: c={c} cq={cq} h={h} tile={tile} "
              f"batch={args.batch} ===", flush=True)
        try:
            compiled = jax.jit(chain).lower(x, skip).compile()
            print(f"{name}: COMPILE OK", flush=True)
        except Exception:
            print(f"{name}: COMPILE FAILED\n{traceback.format_exc()}",
                  flush=True)
            continue
        if args.run:
            got = np.asarray(compiled(x, skip))
            want = np.asarray(jax.jit(oracle)(x, skip))
            err = float(np.max(np.abs(got.astype(np.float32)
                                      - want.astype(np.float32))))
            print(f"{name}: RUN OK, max|delta| vs XLA oracle = {err:.3e}",
                  flush=True)


if __name__ == "__main__":
    main()
