"""Multi-host (pod-scale) data parallelism.

The single-process layers (parallel.mesh/tp/pp) drive every chip one Python
process can address. A v5e pod is N hosts x M local chips running one JAX
program per host: same jitted step everywhere, but host data only covers the
local shard, and `jax.device_put` cannot place onto another host's devices.
This module is the thin layer in between — the part the reference never needed
(it is single-GPU torch; its `--n_gpu` flag is parsed and never read,
分割/main.py:35):

  * `init_distributed()` — process-group bring-up (`jax.distributed`). On TPU
    pods every argument auto-detects from the TPU metadata; CPU test rigs pass
    coordinator/num_processes/process_id explicitly.
  * `stripe()` — per-process dataset striping (contiguous, equalised), the
    torch `DistributedSampler` role.
  * `global_batch()` — local host numpy -> global `jax.Array` sharded over
    'data', via `jax.make_array_from_process_local_data`. The existing
    sharded train steps (mesh.make_sharded_*) then run unchanged over the
    global mesh: within-slice gradient psums ride ICI, cross-host DCN, all
    XLA-emitted (scaling-book recipe, no hand-written collectives).
  * `replicate_global()` — replicated placement that works across hosts
    (mesh.replicate's device_put is single-process only).
  * `process_mean()` — cross-process scalar reduction for control-flow values
    (val loss, metric scores) so plateau/early-stop/checkpoint decisions stay
    bit-identical on every host and the programs cannot diverge.

Real-rig coverage: tests/test_multihost.py launches TWO jax.distributed CPU
processes (gloo collectives, 4 virtual devices each) and asserts the 8-device
global DP step matches the single-process step on the same global batch.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the JAX process group. Call before any other JAX API touches
    devices. On TPU pods call with no arguments (all three auto-detect); on
    CPU/GPU rigs pass all three (coordinator is "host:port" of process 0)."""
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def is_main() -> bool:
    """True on the process that should own NON-COLLECTIVE host-side side
    effects (metric logs, stdout, artifact writes). Checkpoint saves are NOT
    in that set: orbax saves are collective — every process must call them
    (train/checkpoint.py handles primary-only directory cleanup)."""
    return jax.process_index() == 0


class stripe:
    """Contiguous per-process view of a dataset (torch DistributedSampler role,
    minus its wrap-around padding): process p of P sees items
    [p*k, (p+1)*k) where k = len(ds)//P.

    even=True (default, TRAIN stripes) drops the tail remainder so every
    process runs the same number of steps — unequal stripes deadlock
    collective programs on the short hosts' last batch. even=False (VAL
    stripes) gives the tail to the LAST process so no sample is silently
    excluded from metrics: val eval is local (no collectives) and
    process_mean's weights already handle unequal stripe sizes."""

    def __init__(self, dataset, index: Optional[int] = None,
                 count: Optional[int] = None, even: bool = True):
        self.dataset = dataset
        self.count = jax.process_count() if count is None else count
        self.index = jax.process_index() if index is None else index
        base = len(dataset) // self.count
        if base == 0:
            raise ValueError(
                f"dataset of {len(dataset)} items cannot be striped over "
                f"{self.count} processes (every process would see 0 items "
                "and the train/val loops would silently produce NaN means)")
        self._start = self.index * base
        self._len = base
        if not even and self.index == self.count - 1:
            self._len = len(dataset) - self._start

    def __len__(self) -> int:
        return self._len

    def __getitem__(self, i: int):
        if not 0 <= i < self._len:
            raise IndexError(i)
        return self.dataset[self._start + i]


def global_batch(mesh: Mesh, tree: Any, axis: str = "data") -> Any:
    """Local host numpy (this process's stripe of the batch) -> global
    jax.Array with the leading dim sharded over `axis`. The global batch size
    is process_count * local batch; every process must call with the same
    local shape."""
    def put(x):
        x = np.asarray(x)
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x)
    return jax.tree_util.tree_map(put, tree)


def replicate_global(mesh: Mesh, tree: Any) -> Any:
    """Replicate host values across ALL hosts' devices (every process passes
    the same value, e.g. a restored checkpoint read from shared storage).
    Single-process-safe, so callers need no mesh.replicate fallback branch."""
    sharding = NamedSharding(mesh, P())
    def put(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    return jax.tree_util.tree_map(put, tree)


def sync(name: str, timeout_s: int = 1800) -> None:
    """Coordination-service barrier: every process waits here until ALL reach
    it. Call at the end of a multihost CLI run, AFTER host-side side effects —
    process 0's checkpoint writes can outlast the other hosts' exits by more
    than jax.distributed's shutdown_timeout (default 300 s), and a host that
    exits first trips the shutdown barrier and gets the laggard killed
    mid-checkpoint. Single-process: no-op."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed

    distributed.global_state.client.wait_at_barrier(name, timeout_s * 1000)


def local_replica(tree: Any) -> Any:
    """Host-fetch a (fully-replicated) global tree and pin it on this host's
    first device, so local non-collective jits (the per-stripe val eval) can
    consume it without mixing in non-addressable arrays — and without
    re-uploading the tree on every call, which a raw host-numpy copy would."""
    dev = jax.local_devices()[0]
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), dev), tree)


def process_sum(value) -> np.ndarray:
    """Elementwise sum of a host array across processes (count-style metrics,
    e.g. a confusion matrix: each process counted only its val stripe).
    Single-process: returns np.asarray(value) unchanged."""
    arr = np.asarray(value)
    if jax.process_count() == 1:
        return arr
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr)).sum(axis=0)


def process_mean(value: float, weight: float = 1.0) -> float:
    """Weighted mean of a python scalar across processes (weight = e.g. this
    process's sample count). Every process gets the identical result, keeping
    host-side control flow (plateau LR, early stop, best-checkpoint compare)
    in lockstep. Single-process: returns the value unchanged."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    pair = multihost_utils.process_allgather(
        np.asarray([value * weight, weight], np.float64))
    pair = pair.reshape(-1, 2)
    total_w = pair[:, 1].sum()
    return float(pair[:, 0].sum() / total_w) if total_w else float("nan")
