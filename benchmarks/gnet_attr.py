"""Per-module GoogLeNet attribution at the official batch (VERDICT r4 ask #5).

The s2d-stem engine forward measured 4.94 ms at b128 (attr_b128 queue 16) vs
~1.9 ms MXU-ideal — ~38% of SOL, proportionally as bad as the dense up2. This
script locates the gap: every stage of engine.gnet_forward (stem, conv2/3,
the 9 inception modules, pools, head) scan-timed in isolation on its real
input activation, vs its MXU-ideal ms computed from the actual conv kernel
shapes (2*kh*kw*cin*cout*H*W at 205 TFLOP/s). `--branches` additionally
splits each inception module into its four branches. The A/B lever the table
motivates is `merge_1x1` (engine._inception): the three same-input 1x1 convs
as one conv with concatenated output channels (exact math) — timed whole-graph
alongside.

Reference level: torchvision googlenet per 分类/ROI_main.py:86-95.
Methodology per memory/axon-tpu-tunnel-rules: ONE jitted scan, inputs
perturbed per step, one scalar fetch; harness-inflation caveat (RESULTS.md
queue 17) applies to isolated rows — the one-jit full-forward row is ground
truth, isolated rows locate proportions.

Usage: python benchmarks/gnet_attr.py [--batch 128] [--scan-len 30] [--branches]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unet_goolenet_tpu.models import GoogLeNetClassifier
from unet_goolenet_tpu.pipeline import engine
from unet_goolenet_tpu import ops

SIZE = 224
PEAK_TFLOPS = 205.0


def scan_time(fn, base, k, iters=3):
    @jax.jit
    def run(base, steps):
        def body(_, i):
            x = jax.tree_util.tree_map(
                lambda b: b * (1 + 1e-6 * i.astype(b.dtype)), base)
            out = fn(x)
            return _, jax.tree_util.tree_reduce(
                lambda a, o: a + jnp.sum(o.astype(jnp.float32)), out, 0.0)

        _, outs = jax.lax.scan(body, 0, steps)
        return outs

    steps = jnp.arange(k)
    _ = np.asarray(run(base, steps))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(run(base, steps))
        best = min(best, time.perf_counter() - t0)
    return best / k * 1e3


def conv_gflop(kernel_shape, out_hw, batch):
    kh, kw, cin, cout = kernel_shape
    return 2 * kh * kw * cin * cout * out_hw[0] * out_hw[1] * batch / 1e9


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--scan-len", type=int, default=30)
    ap.add_argument("--branches", action="store_true",
                    help="also split each inception module into its branches")
    ap.add_argument("--skip-modules", action="store_true",
                    help="only the whole-forward + merge_1x1 A/B rows")
    args = ap.parse_args()
    b = args.batch
    K = args.scan_len
    print(f"devices: {jax.devices()}")

    key = jax.random.PRNGKey(0)
    gnet = GoogLeNetClassifier(num_classes=6, dtype=jnp.bfloat16)
    gv = gnet.init({"params": key, "dropout": key},
                   jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    p = gv["params"]["googlenet"]
    s = gv["batch_stats"]["googlenet"]
    crops = jax.random.uniform(jax.random.PRNGKey(1), (b, SIZE, SIZE, 3),
                               dtype=jnp.bfloat16)

    # ---- whole-forward rows (ground truth) --------------------------------
    t_full = scan_time(
        lambda x: engine.gnet_forward(gv, x, s2d_stem=True), crops, K)
    t_merge = scan_time(
        lambda x: engine.gnet_forward(gv, x, s2d_stem=True, merge_1x1=True),
        crops, K)
    # parity of the merge (exact math; bf16 concat order only)
    y0 = jax.jit(lambda x: engine.gnet_forward(gv, x, s2d_stem=True))(crops)
    y1 = jax.jit(lambda x: engine.gnet_forward(
        gv, x, s2d_stem=True, merge_1x1=True))(crops)
    merr = float(jnp.max(jnp.abs(y0.astype(jnp.float32)
                                 - y1.astype(jnp.float32))))
    print(f"\nfull gnet fwd (s2d stem) b{b}: {t_full:.2f} ms")
    print(f"full gnet fwd + merge_1x1:    {t_merge:.2f} ms "
          f"(max |d logits| {merr:.2e})")
    if args.skip_modules:
        print(json.dumps({"batch": b, "full_ms": round(t_full, 2),
                          "merge_ms": round(t_merge, 2), "merge_err": merr}))
        return

    # ---- per-stage decomposition on real activations ----------------------
    def stem(x):
        x = engine._transform_input(x)
        x = engine._stem_conv_s2d(x, p["conv1"], s["conv1"])
        return ops.max_pool2d(x, 3, 2, ceil_mode=True)

    def conv23(x):
        x = engine._basic_conv(x, p["conv2"], s["conv2"])
        x = engine._basic_conv(x, p["conv3"], s["conv3"], padding=1)
        return ops.max_pool2d(x, 3, 2, ceil_mode=True)

    inc_names = ["inception3a", "inception3b", "inception4a", "inception4b",
                 "inception4c", "inception4d", "inception4e", "inception5a",
                 "inception5b"]

    stages = [("stem(s2d)+pool", stem,
               lambda x: conv_gflop((7, 7, 3, 64), (112, 112), b)),
              ("conv2+conv3+pool", conv23,
               lambda x: conv_gflop((1, 1, 64, 64), (56, 56), b)
               + conv_gflop((3, 3, 64, 192), (56, 56), b))]
    for name in inc_names:
        def mk(name=name):
            def fn(x):
                return engine._inception(x, p[name], s[name])
            def gf(x):
                hw = x.shape[1:3]
                total = 0.0
                for br, pad_hw in (("branch1", hw), ("branch2_0", hw),
                                   ("branch2_1", hw), ("branch3_0", hw),
                                   ("branch3_1", hw), ("branch4_1", hw)):
                    kk = p[name][br]["conv"]["conv"]["kernel"].shape
                    total += conv_gflop(kk, pad_hw, b)
                return total
            return fn, gf
        stages.append((name, *mk()))
    stages.append(("head(avg+fc)",
                   lambda x: jnp.dot(jnp.mean(x, axis=(1, 2)),
                                     p["fc"]["kernel"].astype(x.dtype))
                   + p["fc"]["bias"].astype(x.dtype),
                   lambda x: 0.0))

    # real activation at each stage boundary (pools included in stages)
    acts = [crops]
    x = crops
    x = jax.jit(stem)(x)
    acts.append(x)
    x = jax.jit(conv23)(x)
    acts.append(x)
    for i, name in enumerate(inc_names):
        x = jax.jit(lambda t, name=name: engine._inception(
            t, p[name], s[name]))(x)
        if name in ("inception3b", "inception4e"):
            x = jax.jit(lambda t, k=(3 if name == "inception3b" else 2):
                        ops.max_pool2d(t, k, 2, ceil_mode=True))(x)
        acts.append(x)

    print(f"\n| stage | in shape | ms | MXU-ideal ms | % ideal |")
    print("|---|---|---|---|---|")
    rows = {}
    tot = tot_i = 0.0
    for (name, fn, gf), act in zip(stages, acts):
        t = scan_time(fn, act, K)
        g = gf(act)
        ideal = g / PEAK_TFLOPS
        rows[name] = {"ms": round(t, 3), "ideal_ms": round(ideal, 3),
                      "gflop": round(g, 2)}
        tot += t
        tot_i += ideal
        pct = f"{100 * ideal / t:.0f}%" if t > 0 else "—"
        print(f"| {name} | {tuple(act.shape)} | {t:.3f} | {ideal:.3f} "
              f"| {pct} |", flush=True)
    print(f"| **sum isolated** | | {tot:.2f} | {tot_i:.2f} | "
          f"{100 * tot_i / tot:.0f}% |")
    print(f"| **full one-jit** | | {t_full:.2f} | {tot_i:.2f} | "
          f"{100 * tot_i / t_full:.0f}% |")

    if args.branches:
        # branch split of the worst module by (ms - ideal)
        worst = max(inc_names, key=lambda n: rows[n]["ms"]
                    - rows[n]["ideal_ms"])
        act = acts[2 + inc_names.index(worst)]
        pm, sm = p[worst], s[worst]
        k3 = pm["branch3_1"]["conv"]["conv"]["kernel"].shape[0]
        branches = [
            ("b1 1x1", lambda x: engine._basic_conv(x, pm["branch1"],
                                                    sm["branch1"])),
            ("b2 1x1+3x3", lambda x: engine._basic_conv(
                engine._basic_conv(x, pm["branch2_0"], sm["branch2_0"]),
                pm["branch2_1"], sm["branch2_1"], padding=1)),
            ("b3 1x1+kxk", lambda x: engine._basic_conv(
                engine._basic_conv(x, pm["branch3_0"], sm["branch3_0"]),
                pm["branch3_1"], sm["branch3_1"], padding=k3 // 2)),
            ("b4 pool+1x1", lambda x: engine._basic_conv(
                ops.max_pool2d(x, 3, 1, padding=1, ceil_mode=True),
                pm["branch4_1"], sm["branch4_1"])),
            ("merged 1x1s", lambda x: engine._inception(
                x, pm, sm, merge_1x1=True)),
        ]
        print(f"\nbranch split of {worst} (worst gap), input "
              f"{tuple(act.shape)}:")
        for bn, bf in branches:
            print(f"  {bn}: {scan_time(bf, act, K):.3f} ms", flush=True)

    print()
    print(json.dumps({"batch": b, "full_ms": round(t_full, 2),
                      "merge_ms": round(t_merge, 2), "stages": rows}))


if __name__ == "__main__":
    main()
