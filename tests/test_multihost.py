"""Multi-host data parallelism (parallel/multihost.py) on a REAL two-process
jax.distributed rig: two subprocesses, 4 virtual CPU devices each, gloo
collectives — the pod topology in miniature. The global 8-device DP step must
match the single-process 8-device step on the same global batch (SURVEY.md §5
distributed row; the reference is single-GPU torch with a never-read --n_gpu
flag, 分割/main.py:35)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env() -> dict:
    env = dict(os.environ)
    env.update(
        PALLAS_AXON_POOL_IPS="",  # keep the axon TPU plugin out of subprocesses
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PYTHONPATH=REPO,
    )
    return env


def _run_pair(tmp_path, cmds, timeout=1800):
    """Launch the two rig processes with stdout captured to FILES (a PIPE
    would lose all diagnostics when a deadlocked pair times out), wait for
    both, and return their logs after asserting both exited 0."""
    log_files = [tmp_path / f"proc{p}.out" for p in range(len(cmds))]
    procs = [
        subprocess.Popen(cmd, env=_worker_env(), cwd=REPO,
                         stdout=open(lf, "wb"), stderr=subprocess.STDOUT)
        for cmd, lf in zip(cmds, log_files)
    ]
    try:
        for proc in procs:
            proc.wait(timeout=timeout)
    except subprocess.TimeoutExpired:
        for proc in procs:
            proc.kill()
        pytest.fail("multihost pair timed out; log tails:\n" + "\n".join(
            lf.read_bytes().decode(errors="replace")[-3000:] for lf in log_files))
    logs = [lf.read_bytes().decode(errors="replace") for lf in log_files]
    for proc, log in zip(procs, logs):
        assert proc.returncode == 0, log[-4000:]
    return logs


def test_stripe_host_logic():
    from unet_goolenet_tpu.parallel import stripe

    ds = list(range(10))
    s0 = stripe(ds, index=0, count=3)
    s1 = stripe(ds, index=1, count=3)
    s2 = stripe(ds, index=2, count=3)
    # equalised: 10//3 = 3 each, tail dropped so step counts match
    assert [len(s) for s in (s0, s1, s2)] == [3, 3, 3]
    assert [s0[i] for i in range(3)] == [0, 1, 2]
    assert [s2[i] for i in range(3)] == [6, 7, 8]
    with pytest.raises(IndexError):
        s0[3]
    with pytest.raises(ValueError):  # fewer items than processes: fail loud
        stripe(list(range(2)), index=0, count=3)
    # even=False (val stripes): last process takes the tail, no sample dropped
    v0 = stripe(ds, index=0, count=3, even=False)
    v2 = stripe(ds, index=2, count=3, even=False)
    assert len(v0) == 3 and len(v2) == 4
    assert [v2[i] for i in range(4)] == [6, 7, 8, 9]


def test_single_process_helpers_degrade():
    """global_batch/replicate_global/process_mean work identically in the
    single-process case (so CLIs need no fallback branch)."""
    from unet_goolenet_tpu.parallel import (
        global_batch, make_mesh, process_mean, replicate_global)

    mesh = make_mesh()
    x = np.arange(16, dtype=np.float32).reshape(8, 2)
    g = global_batch(mesh, {"x": x})["x"]
    assert len(g.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(g), x)
    r = replicate_global(mesh, np.float32(3.0))
    assert r.sharding.is_fully_replicated
    assert process_mean(4.2) == pytest.approx(4.2)


def test_multihost_cli_train_seg(tmp_path):
    """`train_seg --multihost` end-to-end on the two-process rig: both hosts
    train their stripe of a shared dataset in lockstep, agree bit-for-bit on
    the (process-averaged) val loss driving control flow, save collectively to
    the shared dir, and only process 0 logs."""
    from PIL import Image

    rng = np.random.default_rng(5)
    for split in ("train", "val"):
        (tmp_path / split / "images").mkdir(parents=True)
        (tmp_path / split / "labels").mkdir(parents=True)
        for i in range(8):
            img = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
            mask = np.zeros((40, 48), np.uint8)
            mask[8 + i : 30, 10 : 34 - i] = 255
            Image.fromarray(img).save(tmp_path / split / "images" / f"{i}.png")
            Image.fromarray(mask).save(tmp_path / split / "labels" / f"{i}.png")

    # orbax saves are collective, so both processes point at the SAME
    # save dir (the shared-storage contract from the --multihost help text)
    port = _free_port()
    save_dir = str(tmp_path / "ckpt_shared")
    log_dirs = [str(tmp_path / f"log{p}") for p in range(2)]
    logs = _run_pair(tmp_path, [
        [sys.executable, "-m", "unet_goolenet_tpu.apps.train_seg",
         "--train-dir", str(tmp_path / "train"),
         "--val-dir", str(tmp_path / "val"),
         "--epochs", "1", "--batch-size", "4", "--img-size", "16",
         "--save-dir", save_dir, "--log-dir", log_dirs[p],
         "--data-parallel", "--multihost",
         "--coordinator", f"127.0.0.1:{port}",
         "--num-processes", "2", "--process-id", str(p)]
        for p in range(2)
    ])

    # lockstep invariant: the process-averaged val loss that drives plateau /
    # early-stop / best-checkpoint decisions prints identically on both hosts
    import re
    done = [re.search(r"done: best_val_loss=([\d.]+)", log) for log in logs]
    assert done[0] and done[1], logs[0][-2000:]
    assert done[0].group(1) == done[1].group(1)
    # one checkpoint in the shared dir; logging is process-0-only
    assert any(f.startswith("best_model") for f in os.listdir(save_dir))
    assert os.listdir(log_dirs[0])
    assert not os.path.isdir(log_dirs[1]) or not os.listdir(log_dirs[1])


def test_multihost_resume(tmp_path):
    """Pod-scale checkpoint durability (SURVEY §5 checkpoint row): a
    checkpoint written by the COLLECTIVE multihost save must restore — in a
    fresh multihost run via --resume (picking up at the saved epoch) and in a
    plain single-process restore (host tooling reading a pod's artifact)."""
    from PIL import Image

    rng = np.random.default_rng(13)
    for split in ("train", "val"):
        (tmp_path / split / "images").mkdir(parents=True)
        (tmp_path / split / "labels").mkdir(parents=True)
        for i in range(8):
            img = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
            mask = np.zeros((40, 48), np.uint8)
            mask[6 + i : 32, 8 : 36 - i] = 255
            Image.fromarray(img).save(tmp_path / split / "images" / f"{i}.png")
            Image.fromarray(mask).save(tmp_path / split / "labels" / f"{i}.png")

    save_dir = str(tmp_path / "ckpt_shared")

    def cmd(p, port, extra):
        return [sys.executable, "-m", "unet_goolenet_tpu.apps.train_seg",
                "--train-dir", str(tmp_path / "train"),
                "--val-dir", str(tmp_path / "val"),
                "--batch-size", "4", "--img-size", "16",
                "--save-dir", save_dir,
                "--data-parallel", "--multihost",
                "--coordinator", f"127.0.0.1:{port}",
                "--num-processes", "2", "--process-id", str(p)] + extra

    port = _free_port()
    _run_pair(tmp_path, [cmd(p, port, ["--epochs", "1"]) for p in range(2)])
    ckpts = [f for f in os.listdir(save_dir) if f.startswith("best_model")]
    assert ckpts, os.listdir(save_dir)
    ckpt = os.path.join(save_dir, ckpts[0])

    # single-process restore of the pod-written artifact
    import jax
    from unet_goolenet_tpu.models import UNetTaskAligWeight
    from unet_goolenet_tpu.train import optim
    from unet_goolenet_tpu.train.checkpoint import CheckpointManager
    from unet_goolenet_tpu.train.seg import init_seg_state

    template = init_seg_state(UNetTaskAligWeight(n_classes=1),
                              optim.make_adamw(1e-4), jax.random.PRNGKey(0),
                              input_shape=(1, 16, 16, 3))
    state, epoch = CheckpointManager(save_dir).restore(ckpt, template)
    assert epoch == 0
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

    # multihost --resume restores on BOTH hosts and re-enters the loop at the
    # saved epoch (the repo-wide resume convention, range(start_epoch, epochs))
    port = _free_port()
    logs = _run_pair(tmp_path, [
        cmd(p, port, ["--epochs", "2", "--resume", ckpt]) for p in range(2)])
    import re
    for log in logs:
        assert re.search(r"resumed from .* at epoch 0", log), log[-2000:]
        assert "[step 1]" in log, log[-2000:]


def test_multihost_cli_train_cls(tmp_path):
    """`train_cls --multihost` on the two-process rig: the frozen-UNet ROI
    extraction + GoogLeNet train step run as one global-mesh program per
    process, hosts agree bit-for-bit on the process-averaged control-flow
    values, and logging stays on process 0."""
    from PIL import Image

    import jax
    from unet_goolenet_tpu.models import UNetTaskAligWeight
    from unet_goolenet_tpu.train import optim
    from unet_goolenet_tpu.train.checkpoint import CheckpointManager
    from unet_goolenet_tpu.train.seg import init_seg_state

    S = 32  # GoogLeNet's ceil-mode pool chain is proven at 32 (test_apps.py)
    rng = np.random.default_rng(9)
    for split in ("ctrain", "cval"):
        (tmp_path / split / "images").mkdir(parents=True)
        (tmp_path / split / "labels").mkdir(parents=True)
        lines = []
        for i in range(8):
            g = (rng.random((40, 48)) * 255).astype(np.uint8)
            Image.fromarray(g).save(tmp_path / split / "images" / f"{i}.png")
            lines.append(f"{i}.png {i % 6}")
        (tmp_path / split / "labels" / "label.txt").write_text("\n".join(lines))

    # tiny frozen stage-1 checkpoint (random-init weights are fine: under test
    # is the multihost plumbing, not model quality)
    unet = UNetTaskAligWeight(n_classes=1)
    seg_state = init_seg_state(unet, optim.make_adamw(), jax.random.PRNGKey(0),
                               input_shape=(1, S, S, 3))
    seg_ckpt = CheckpointManager(str(tmp_path / "seg")).save_best_loss(seg_state, 0)

    port = _free_port()
    save_dir = str(tmp_path / "ckpt_shared")
    log_dirs = [str(tmp_path / f"log{p}") for p in range(2)]
    logs = _run_pair(tmp_path, [
        [sys.executable, "-m", "unet_goolenet_tpu.apps.train_cls",
         "--train-dir", str(tmp_path / "ctrain"),
         "--val-dir", str(tmp_path / "cval"),
         "--unet-checkpoint", seg_ckpt,
         "--epochs", "1", "--batch-size", "4", "--img-size", str(S),
         "--crop-augment", "none",
         "--save-dir", save_dir, "--log-dir", log_dirs[p],
         "--data-parallel", "--multihost",
         "--coordinator", f"127.0.0.1:{port}",
         "--num-processes", "2", "--process-id", str(p)]
        for p in range(2)
    ])

    import re
    done = [re.search(r"done: best_val_loss=([\d.]+) best_acc=([\d.]+)", log)
            for log in logs]
    assert done[0] and done[1], logs[0][-2000:]
    assert done[0].groups() == done[1].groups()
    assert any(f.startswith("best_model") for f in os.listdir(save_dir))
    assert os.listdir(log_dirs[0])
    assert not os.path.isdir(log_dirs[1]) or not os.listdir(log_dirs[1])


def test_two_process_dp_matches_single_process(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"w{p}.json") for p in range(2)]
    _run_pair(tmp_path, [
        [sys.executable, WORKER, str(p), "2", str(port), outs[p]]
        for p in range(2)
    ])

    w0, w1 = (json.load(open(o)) for o in outs)
    # the replicated loss/params are identical on both hosts
    assert w0["loss"] == pytest.approx(w1["loss"], rel=1e-6)
    np.testing.assert_allclose(w0["leaf"], w1["leaf"], rtol=1e-6)
    assert w0["main"] is True and w1["main"] is False
    # process_mean of (1.0, 2.0) across the two processes
    assert w0["pmean"] == pytest.approx(1.5)

    # single-process reference on this (8-device) interpreter: same model,
    # same global batch, same two steps
    from unet_goolenet_tpu.models import UNetTaskAligWeight
    from unet_goolenet_tpu.parallel import (
        make_mesh, make_sharded_seg_train_step, global_batch, replicate_global)
    from unet_goolenet_tpu.train import optim
    from unet_goolenet_tpu.train.seg import init_seg_state

    S = 16
    model = UNetTaskAligWeight(n_classes=1)
    tx = optim.make_adamw(1e-4)
    state = init_seg_state(model, tx, jax.random.PRNGKey(0),
                           input_shape=(1, S, S, 3))
    mesh = make_mesh()
    state = replicate_global(mesh, jax.device_get(state))
    rng = np.random.default_rng(7)
    imgs = rng.random((8, S, S, 3)).astype(np.float32)
    labels = (rng.random((8, S, S, 1)) > 0.5).astype(np.float32)
    step = make_sharded_seg_train_step(model, tx, mesh)
    for _ in range(2):
        b = global_batch(mesh, {"imgs": imgs, "labels": labels})
        state, metrics = step(state, b["imgs"], b["labels"])

    # gloo ring-reduce across processes reassociates f32 sums differently
    # than the in-process reduction, and the drift is amplified through FOUR
    # AdamW updates before this loss is computed (2 steps x n_refine=2, the
    # same mechanism test_tp documents at 0.2%/update; measured here 0.33%).
    # A real stripe/reduction bug (wrong batch half, missing psum) is >10x.
    np.testing.assert_allclose(w0["loss"], float(metrics["loss"]), rtol=1e-2)
    # atol covers lr=1e-4 sign-flipped updates on near-zero-gradient params
    leaf = np.asarray(
        jax.device_get(jax.tree_util.tree_leaves(state.params)[0])).ravel()[:16]
    np.testing.assert_allclose(w0["leaf"], leaf, rtol=2e-3, atol=5e-4)
