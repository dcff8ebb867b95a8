"""One process of the two-process rig in tests/test_multihost.py (not a test
module). Runs the 8-device global DP seg train step with this process holding
4 virtual CPU devices and half the global batch; dumps loss + a param slice
for the parent to compare against the single-process reference.

Usage: multihost_worker.py <process_id> <num_processes> <port> <out_json>
(env must carry PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=4 PYTHONPATH=<repo root>)
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from unet_goolenet_tpu.parallel import (  # noqa: E402
    global_batch,
    init_distributed,
    is_main,
    make_mesh,
    make_sharded_seg_train_step,
    process_mean,
    replicate_global,
)

def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, out = sys.argv[3], sys.argv[4]
    init_distributed(f"127.0.0.1:{port}", nproc, pid)

    import numpy as np
    from unet_goolenet_tpu.models import UNetTaskAligWeight
    from unet_goolenet_tpu.train import optim
    from unet_goolenet_tpu.train.seg import init_seg_state

    assert jax.process_count() == nproc
    assert jax.local_device_count() == 4 and jax.device_count() == 8

    S = 16
    model = UNetTaskAligWeight(n_classes=1)
    tx = optim.make_adamw(1e-4)
    # same seed on every process -> identical local init; replicate_global
    # re-places it across both hosts' devices
    state = init_seg_state(model, tx, jax.random.PRNGKey(0),
                           input_shape=(1, S, S, 3))
    mesh = make_mesh()
    state = replicate_global(mesh, jax.device_get(state))

    # the SAME fixed global batch on every process (host numpy, shared seed);
    # each process feeds only its stripe to global_batch
    rng = np.random.default_rng(7)
    imgs = rng.random((8, S, S, 3)).astype(np.float32)
    labels = (rng.random((8, S, S, 1)) > 0.5).astype(np.float32)
    lo = pid * (8 // nproc)
    hi = lo + 8 // nproc

    step = make_sharded_seg_train_step(model, tx, mesh)
    metrics = None
    for _ in range(2):
        b = global_batch(mesh, {"imgs": imgs[lo:hi], "labels": labels[lo:hi]})
        state, metrics = step(state, b["imgs"], b["labels"])

    leaf = np.asarray(
        jax.device_get(jax.tree_util.tree_leaves(state.params)[0])
    ).ravel()[:16]
    json.dump(
        {
            "loss": float(metrics["loss"]),
            "pmean": process_mean(float(pid) + 1.0),
            "leaf": leaf.tolist(),
            "main": is_main(),
        },
        open(out, "w"),
    )
    print("WORKER OK", pid, flush=True)


if __name__ == "__main__":
    main()
