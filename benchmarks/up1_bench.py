"""On-chip parity + timing for the fused up1 Pallas kernels vs the XLA packed
chain (benchmarks/RESULTS.md r2b: up1 = 21.48 ms of the 50.57 ms packed UNet
forward at batch 64 bf16 — the target of VERDICT r2 #1).

Tunnel rule (memory/axon-tpu-tunnel-rules.md): run ONE short measurement per
invocation with NO enclosing timeout — a timeout kill mid-execution wedges the
worker for ~1h. Hence the argparse surface:

    python benchmarks/up1_bench.py --mode parity          # small-shape parity
    python benchmarks/up1_bench.py --mode xla             # XLA packed baseline
    python benchmarks/up1_bench.py --mode fused --tile 56
    python benchmarks/up1_bench.py --mode fused --tile 56 --ablate nobuild
    python benchmarks/up1_bench.py --mode gate --tile 56  # gate pass alone
"""
import argparse, sys, time, functools, numpy as np, jax, jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from unet_goolenet_tpu.ops import packed as P
from unet_goolenet_tpu import ops as O
from unet_goolenet_tpu.ops import pallas as pk
from unet_goolenet_tpu.ops.pallas import up1 as U
from unet_goolenet_tpu.ops.pallas.up1 import fused_cbn_stats

rng = np.random.default_rng(1)


def make_ws(c, scale=0.1):
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32)) * scale
    return dict(w_up=r(2,2,c,c), b_up=r(c), w_e1=r(3,3,c,c), b_e1=r(c),
                w_d2=r(3,3,c,c), b_d2=r(c), w_pair=r(3,3,2*c,c), b_pair=r(c),
                w_blk1=r(3,3,c,c), b_blk1=r(c), w_outc=r(c,1), b_outc=r(1))


def xla_chain(x_p, x1_p, ws, c):
    e1 = P.conv3x3_pp(x1_p, P.expand_weights_pp(ws["w_e1"]), ws["b_e1"], relu=True)
    avg, mx = P.mean_max_hw_p(e1)
    gate = jax.nn.sigmoid(avg + mx)  # stand-in for the tiny fc gate (same shape)
    up = P.conv_transpose2x2_p(x_p, ws["w_up"], ws["b_up"])
    d2 = P.conv3x3_pp(up, P.expand_weights_pp(ws["w_d2"]), ws["b_d2"], relu=True)
    gated = e1 + P.scale_p(d2, gate) + d2
    hh = P.conv3x3_pp2(up, P.expand_weights_pp(ws["w_pair"][:,:,:c]), gated,
                       P.expand_weights_pp(ws["w_pair"][:,:,c:]), ws["b_pair"], relu=True)
    y = P.conv3x3_pp(hh, P.expand_weights_pp(ws["w_blk1"]), ws["b_blk1"], relu=True)
    return P.conv1x1_p(y, ws["w_outc"], ws["b_outc"])


def fused_chain(x_p, x1_p, ws, c, tile_rows=None):
    e1, avg, mx = fused_cbn_stats(x1_p, ws["w_e1"], ws["b_e1"])
    gate = jax.nn.sigmoid(avg + mx).astype(x_p.dtype)
    gate_p1 = jnp.tile(1.0 + gate[:, 0, 0, :], (1, 2))
    return pk.fused_up1_outc(x_p, e1, gate_p1,
        ws["w_up"], ws["b_up"], ws["w_d2"], ws["b_d2"], ws["w_pair"], ws["b_pair"],
        ws["w_blk1"], ws["b_blk1"], ws["w_outc"], ws["b_outc"],
        tile_rows=tile_rows)


def gate_chain(x_p, x1_p, ws, c, tile_rows=None):
    e1, avg, mx = fused_cbn_stats(x1_p, ws["w_e1"], ws["b_e1"],
                                  tile_rows=tile_rows)
    return e1


def main_kernel_chain(x_p, x1_p, ws, c, tile_rows=None):
    """The big kernel alone, gate pass replaced by cheap stand-ins (e1 := x1,
    gate := 1.5) — isolates the main kernel's time."""
    gate_p1 = jnp.full((x_p.shape[0], 2 * c), 1.5, x_p.dtype)
    return pk.fused_up1_outc(x_p, x1_p, gate_p1,
        ws["w_up"], ws["b_up"], ws["w_d2"], ws["b_d2"], ws["w_pair"], ws["b_pair"],
        ws["w_blk1"], ws["b_blk1"], ws["w_outc"], ws["b_outc"],
        tile_rows=tile_rows)


def make_ws2(c, cq, scale=0.1):
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32)) * scale
    return dict(w_up=r(2,2,c,c), b_up=r(c), w_e1=r(3,3,c,c), b_e1=r(c),
                w_d2=r(3,3,c,c), b_d2=r(c), w_pair=r(3,3,2*c,cq), b_pair=r(cq),
                w_blk1=r(3,3,cq,cq), b_blk1=r(cq))


def xla_chain2(x, skip, ws, c):
    """The engine's XLA up2 section (dense cca + packed tail)."""
    import jax.nn
    e1 = jax.nn.relu(O.conv2d(skip, ws["w_e1"].astype(skip.dtype),
                              ws["b_e1"].astype(skip.dtype), padding=1))
    avg = jnp.mean(e1, axis=(1, 2), keepdims=True)
    mx = jnp.max(e1, axis=(1, 2), keepdims=True)
    gate = jax.nn.sigmoid(avg + mx)  # stand-in for the tiny fc gate
    up = O.conv_transpose2x2(x, ws["w_up"].astype(x.dtype),
                             ws["b_up"].astype(x.dtype))
    d2 = jax.nn.relu(O.conv2d(up, ws["w_d2"].astype(x.dtype),
                              ws["b_d2"].astype(x.dtype), padding=1))
    gated = e1 + gate.astype(x.dtype) * d2 + d2
    y_p = P.conv3x3_up2(up, P.expand_weights_up(ws["w_pair"][:, :, :c]).astype(x.dtype),
                        gated, P.expand_weights_up(ws["w_pair"][:, :, c:]).astype(x.dtype),
                        ws["b_pair"].astype(x.dtype), relu=True)
    return P.conv3x3_pp(y_p, P.expand_weights_pp(ws["w_blk1"]).astype(x.dtype),
                        ws["b_blk1"].astype(x.dtype), relu=True)


def fused_chain2(x, skip, ws, c, tile_rows=None):
    from unet_goolenet_tpu.ops.pallas import up2 as U2
    e1, avg, mx = U2.fused_cbn_stats_dense(skip, ws["w_e1"], ws["b_e1"])
    gate = jax.nn.sigmoid(avg + mx).astype(x.dtype)
    return U2.fused_up2(x, e1, 1.0 + gate[:, 0, 0, :],
                        ws["w_up"], ws["b_up"], ws["w_d2"], ws["b_d2"],
                        ws["w_pair"], ws["b_pair"], ws["w_blk1"], ws["b_blk1"],
                        tile_rows=tile_rows)


def gate_chain2(x, skip, ws, c, tile_rows=None):
    from unet_goolenet_tpu.ops.pallas import up2 as U2
    e1, _, _ = U2.fused_cbn_stats_dense(skip, ws["w_e1"], ws["b_e1"],
                                        tile_rows=tile_rows)
    return e1


def main_chain2(x, skip, ws, c, tile_rows=None):
    from unet_goolenet_tpu.ops.pallas import up2 as U2
    gate_p1 = jnp.full((x.shape[0], c), 1.5, x.dtype)
    return U2.fused_up2(x, skip, gate_p1,
                        ws["w_up"], ws["b_up"], ws["w_d2"], ws["b_d2"],
                        ws["w_pair"], ws["b_pair"], ws["w_blk1"], ws["b_blk1"],
                        tile_rows=tile_rows)


def xla_chain_dense(x, skip, ws, c):
    """The engine's dense _up_alig section (up3/up4: no packing anywhere)."""
    e1 = jax.nn.relu(O.conv2d(skip, ws["w_e1"].astype(skip.dtype),
                              ws["b_e1"].astype(skip.dtype), padding=1))
    avg = jnp.mean(e1, axis=(1, 2), keepdims=True)
    mx = jnp.max(e1, axis=(1, 2), keepdims=True)
    gate = jax.nn.sigmoid(avg + mx)  # stand-in for the tiny fc gate
    up = O.conv_transpose2x2(x, ws["w_up"].astype(x.dtype),
                             ws["b_up"].astype(x.dtype))
    d2 = jax.nn.relu(O.conv2d(up, ws["w_d2"].astype(x.dtype),
                              ws["b_d2"].astype(x.dtype), padding=1))
    gated = e1 + gate.astype(x.dtype) * d2 + d2
    hh = jax.nn.relu(O.conv2d(jnp.concatenate([up, gated], -1),
                              ws["w_pair"].astype(x.dtype),
                              ws["b_pair"].astype(x.dtype), padding=1))
    return jax.nn.relu(O.conv2d(hh, ws["w_blk1"].astype(x.dtype),
                                ws["b_blk1"].astype(x.dtype), padding=1))


def fused_chain_dense(x, skip, ws, c, tile_rows=None):
    from unet_goolenet_tpu.ops.pallas import up2 as U2
    e1, avg, mx = U2.fused_cbn_stats_dense(skip, ws["w_e1"], ws["b_e1"])
    gate = jax.nn.sigmoid(avg + mx).astype(x.dtype)
    return U2.fused_up_dense(x, e1, 1.0 + gate[:, 0, 0, :],
                             ws["w_up"], ws["b_up"], ws["w_d2"], ws["b_d2"],
                             ws["w_pair"], ws["b_pair"],
                             ws["w_blk1"], ws["b_blk1"], tile_rows=tile_rows)


def run_timed_dense(mode, tile, batch):
    """up3/up4 whole-level timing (dense fused variant, ops/pallas/up2.py
    fused_up_dense) vs the engine's XLA chain."""
    lvl = int(mode[-1])
    c, cq, h = {3: (256, 128, 56), 4: (512, 256, 28)}[lvl]
    ws = make_ws2(c, cq)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal(
        (batch, h // 2, h // 2, c)).astype(np.float32)).astype(dt)
    skip = jnp.asarray(rng.standard_normal(
        (batch, h, h, c)).astype(np.float32)).astype(dt)
    fn = xla_chain_dense if mode.startswith("xla") else fused_chain_dense
    kw = dict(ws=ws, c=c)
    if not mode.startswith("xla"):
        kw["tile_rows"] = tile
    t = scan_time(functools.partial(fn, **kw), (x, skip))
    print(f"{mode} tile={tile} batch={batch}: {t:.2f} ms/batch", flush=True)


def xla_chain_d1(x1_p, ws):
    pool = P.max_pool2x2_p_to_dense(x1_p)
    h = jax.nn.relu(O.conv2d(pool, ws["w1"].astype(x1_p.dtype),
                             ws["b1"].astype(x1_p.dtype), padding=1))
    return jax.nn.relu(O.conv2d(h, ws["w2"].astype(x1_p.dtype),
                                ws["b2"].astype(x1_p.dtype), padding=1))


def fused_chain_d1(x1_p, ws, tile_rows=None):
    from unet_goolenet_tpu.ops.pallas.down1 import fused_pool_down1
    return fused_pool_down1(x1_p, ws["w1"], ws["b1"], ws["w2"], ws["b2"],
                            tile_rows=tile_rows)


def run_timed_d1(mode, tile, batch):
    c, co = 64, 128
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32)) * 0.1
    ws = dict(w1=r(3, 3, c, co), b1=r(co), w2=r(3, 3, co, co), b2=r(co))
    dt = jnp.bfloat16
    x1_p = jnp.abs(jnp.asarray(
        rng.standard_normal((batch, 224, 112, 2 * c)).astype(np.float32))).astype(dt)
    if mode == "xlad1":
        t = scan_time(functools.partial(xla_chain_d1, ws=ws), (x1_p,))
    else:
        t = scan_time(functools.partial(fused_chain_d1, ws=ws,
                                        tile_rows=tile), (x1_p,))
    print(f"{mode} tile={tile} batch={batch}: {t:.2f} ms/batch", flush=True)


def run_timed2(mode, tile, batch):
    c, cq = 128, 64
    ws = make_ws2(c, cq)
    n, h, w = batch, 112, 112
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((n, h//2, w//2, c)).astype(np.float32)).astype(dt)
    skip = jnp.asarray(rng.standard_normal((n, h, w, c)).astype(np.float32)).astype(dt)
    fn = {"xla2": xla_chain2, "fused2": fused_chain2, "gate2": gate_chain2,
          "main2": main_chain2}[mode]
    kw = dict(ws=ws, c=c)
    if mode != "xla2":
        kw["tile_rows"] = tile
    t = scan_time(functools.partial(fn, **kw), (x, skip))
    abl = ",".join(sorted(U._ABLATE)) or "-"
    print(f"{mode} tile={tile} batch={batch} ablate={abl}: {t:.2f} ms/batch",
          flush=True)


def scan_time(fn, args, k=30):
    # the carry perturbs the input each iteration, or XLA hoists the whole
    # (loop-invariant) computation out of the scan and times nothing
    @jax.jit
    def loop(args):
        def body(carry, _):
            out = fn(args[0] + carry.astype(args[0].dtype) * 1e-12, *args[1:])
            return jnp.sum(out.astype(jnp.float32)), None
        s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
        return s
    np.asarray(loop(args))  # compile+warm
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(loop(args))
        best = min(best, time.time() - t0)
    return best / k * 1000


def run_parity():
    c = 64
    ws = make_ws(c)
    n, h, wp = 1, 32, 16
    x_p = jnp.asarray(rng.standard_normal((n, h//2, wp//2, 2*c)).astype(np.float32))
    x1_p = jnp.asarray(rng.standard_normal((n, h, wp, 2*c)).astype(np.float32))
    ref = np.asarray(jax.jit(functools.partial(xla_chain, ws=ws, c=c))(x_p, x1_p))
    print("parity ref done", flush=True)
    got = np.asarray(jax.jit(functools.partial(fused_chain, ws=ws, c=c))(x_p, x1_p))
    d = np.abs(got - ref).max()
    print(f"parity maxdiff {d:.2e}", flush=True)
    assert d < 1e-3, d


def run_parity_prod(batch=2):
    c = 64
    ws = make_ws(c)
    n, h, wp = batch, 224, 112
    dt = jnp.bfloat16
    x_p = jnp.asarray(rng.standard_normal((n, h//2, wp//2, 2*c)).astype(np.float32)).astype(dt)
    x1_p = jnp.asarray(rng.standard_normal((n, h, wp, 2*c)).astype(np.float32)).astype(dt)
    a = np.asarray(jax.jit(functools.partial(xla_chain, ws=ws, c=c))(x_p, x1_p), np.float32)
    b = np.asarray(jax.jit(functools.partial(fused_chain, ws=ws, c=c))(x_p, x1_p), np.float32)
    print(f"bf16 prod-shape maxdiff {np.abs(a-b).max():.3f} (bf16 rounding scale)",
          flush=True)


def run_parity_lvl(mode, batch=2):
    """On-chip bf16 parity for the round-3 fused kernels (up2/up3/up4/down1)
    vs their XLA chains at production shapes — the gate before a
    TwoStagePipeline fused_* default flips on."""
    dt = jnp.bfloat16
    if mode == "parityd1":
        c, co = 64, 128
        r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32)) * 0.1
        ws = dict(w1=r(3, 3, c, co), b1=r(co), w2=r(3, 3, co, co), b2=r(co))
        x1_p = jnp.abs(jnp.asarray(rng.standard_normal(
            (batch, 224, 112, 2 * c)).astype(np.float32))).astype(dt)
        a = jax.jit(functools.partial(xla_chain_d1, ws=ws))(x1_p)
        b = jax.jit(functools.partial(fused_chain_d1, ws=ws, tile_rows=28))(x1_p)
    else:
        lvl = int(mode[-1])
        c, cq, h = {2: (128, 64, 112), 3: (256, 128, 56),
                    4: (512, 256, 28)}[lvl]
        ws = make_ws2(c, cq)
        x = jnp.asarray(rng.standard_normal(
            (batch, h // 2, h // 2, c)).astype(np.float32)).astype(dt)
        skip = jnp.asarray(rng.standard_normal(
            (batch, h, h, c)).astype(np.float32)).astype(dt)
        if lvl == 2:
            a = jax.jit(functools.partial(xla_chain2, ws=ws, c=c))(x, skip)
            b = jax.jit(functools.partial(
                fused_chain2, ws=ws, c=c, tile_rows=28))(x, skip)
        else:
            a = jax.jit(functools.partial(
                xla_chain_dense, ws=ws, c=c))(x, skip)
            b = jax.jit(functools.partial(
                fused_chain_dense, ws=ws, c=c,
                tile_rows=28 if lvl == 3 else 14))(x, skip)
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    scale = max(1e-6, float(np.abs(a).max()))
    d = float(np.abs(a - b).max())
    print(f"{mode} bf16 prod-shape maxdiff {d:.4f} (rel {d/scale:.4f}, "
          f"bf16 rounding scale)", flush=True)


def run_timed(mode, tile, batch):
    c = 64
    ws = make_ws(c)
    n, h, wp = batch, 224, 112
    dt = jnp.bfloat16
    x_p = jnp.asarray(rng.standard_normal((n, h//2, wp//2, 2*c)).astype(np.float32)).astype(dt)
    x1_p = jnp.asarray(rng.standard_normal((n, h, wp, 2*c)).astype(np.float32)).astype(dt)
    fn = {"xla": xla_chain, "fused": fused_chain, "gate": gate_chain,
          "main": main_kernel_chain}[mode]
    kw = dict(ws=ws, c=c)
    if mode != "xla":
        kw["tile_rows"] = tile
    t = scan_time(functools.partial(fn, **kw), (x_p, x1_p))
    abl = ",".join(sorted(U._ABLATE)) or "-"
    print(f"{mode} tile={tile} batch={batch} ablate={abl}: {t:.2f} ms/batch",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="fused",
                    choices=["parity", "parity-prod", "xla", "fused", "gate",
                             "main", "xla2", "fused2", "gate2", "main2",
                             "xla3", "fused3", "xla4", "fused4",
                             "xlad1", "fusedd1",
                             "parity2", "parity3", "parity4", "parityd1"])
    ap.add_argument("--tile", type=int, default=56)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--ablate", default="",
                    help="comma list: nobuild,nomask,nodma (perf ablation only)")
    ap.add_argument("--interpret", action="store_true",
                    help="interpret-mode kernels (CPU smoke test)")
    args = ap.parse_args()
    if args.ablate:
        U._ABLATE = frozenset(args.ablate.split(","))
    if args.interpret:
        U._INTERPRET = True
    print(jax.devices(), flush=True)
    if args.mode == "parity":
        run_parity()
    elif args.mode == "parity-prod":
        run_parity_prod()
    elif args.mode.startswith("parity"):
        run_parity_lvl(args.mode)
    elif args.mode.endswith("d1"):
        run_timed_d1(args.mode, args.tile, args.batch)
    elif args.mode.endswith("3") or args.mode.endswith("4"):
        run_timed_dense(args.mode, args.tile, args.batch)
    elif args.mode.endswith("2"):
        run_timed2(args.mode, args.tile, args.batch)
    else:
        run_timed(args.mode, args.tile, args.batch)


if __name__ == "__main__":
    main()
