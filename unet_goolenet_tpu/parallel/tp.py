"""Tensor-parallel sharding rules (the 'model' mesh axis).

GSPMD style: we only ANNOTATE parameter shardings; XLA's SPMD partitioner
propagates them through the jitted train/infer step and inserts the collectives
(all-gather/reduce-scatter on ICI). Rules follow the Megatron pattern specialised
to this model family:

  * transformer bottleneck (the only matmul-dense component, SURVEY.md §3.5):
    - attention qkv / q/k/v projections: output-feature sharded  (column)
    - attention output projections:      input-feature sharded   (row)
    - MLP fc1: column;  fc2: row
    The head count (8) must divide the model axis.
  * deep encoder/decoder convs (>=256 output channels): output-channel sharded
    (column); the following conv's input dim re-gathers automatically.
  * GoogLeNet (stage 2): inception branch convs are concat-parallel, so every
    branch conv in the wide tail (4e/5a/5b, 832-1024 concat channels) is
    column-sharded — the channel concat of four column-sharded branches stays
    sharded and the global-avgpool + fc re-gather once at the end. Earlier
    modules (<=512 channels at 14x14) stay replicated: the all-gather per module
    would cost more than the conv saves (measured decision, PARITY.md).
  * everything else (BN scales, small convs, heads) stays replicated.

With model=1 every rule degenerates to replication, so the same code path serves
pure DP.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec builder given leaf ndim)
_COLUMN = "column"  # shard last axis over 'model'
_ROW = "row"        # shard first axis over 'model'

_TP_RULES = [
    (r".*attention\d/to_qkv/kernel$", _COLUMN),
    (r".*cross_attention_cl/to_[qkv]/kernel$", _COLUMN),
    (r".*/to_out/kernel$", _ROW),
    (r".*_feed/fc1/kernel$", _COLUMN),
    (r".*_feed/fc2/kernel$", _ROW),
    # deep convs: HWIO -> shard O (column) on the widest layers
    (r".*(down3|down4)/nConvs/block\d/conv/conv/kernel$", _COLUMN),
    # GoogLeNet wide-tail inception branches: all branch-channel counts in
    # 4e/5a/5b (256..384, min 32) divide a model axis of 2 or 4
    (r".*inception(4e|5a|5b)/branch\d(_\d)?/conv/conv/kernel$", _COLUMN),
]


def _spec_for(path: str, leaf) -> P:
    for pattern, kind in _TP_RULES:
        if re.match(pattern, path):
            nd = leaf.ndim
            if kind == _COLUMN:
                return P(*([None] * (nd - 1)), "model")
            return P("model", *([None] * (nd - 1)))
    return P()


def make_param_shardings(mesh: Mesh, tree: Any) -> Any:
    """NamedSharding pytree for a params/variables tree under the TP rules."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]

    def path_str(kp):
        return "/".join(str(getattr(k, "key", k)) for k in kp)

    specs = {path_str(kp): _spec_for(path_str(kp), leaf) for kp, leaf in flat}

    def assign(kp, leaf):
        return NamedSharding(mesh, specs[path_str(kp)])

    return jax.tree_util.tree_map_with_path(assign, tree)


def shard_params(mesh: Mesh, tree: Any) -> Any:
    """Place a params tree according to the TP rules (replicated where no rule)."""
    shardings = make_param_shardings(mesh, tree)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
