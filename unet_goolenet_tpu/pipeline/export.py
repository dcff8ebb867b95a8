"""Deployment export/load of the fused serving graph (jax.export, StableHLO).

The reference has no deployment story: serving IS the training repo —
分类/test.py:139-152 loads both torch models at import time and re-runs eager
Python per batch. Here the whole fused two-stage graph (wavelet preprocess ->
UNet -> bbox -> crop -> GoogLeNet -> argmax) is serialized ONCE as
batch-polymorphic StableHLO plus a weights blob, producing a self-contained
directory artifact a serving host loads and runs without the model code and
without re-tracing Python:

    export_serving(pipe, "artifact/", raw_hw=(400, 500))   # build box
    runner = load_serving("artifact/")                     # serving box
    grades = runner(gray_batch)     # (N, H, W) any N -> (N,) int grades

Artifact layout:
    serving.stablehlo   jax.export blob; args = (unet_vars, gnet_vars, input)
    vars.msgpack        flax.serialization msgpack of both variable trees
    meta.json           source / raw_hw / img_size / dtype / versions

Portability: StableHLO custom calls emitted by Pallas kernels are not stable
across compiler versions, so exports require the pure-XLA graph (every
fused_* kernel off) unless keep_fused=True is passed explicitly. The
artifact runs on the platform(s) it was lowered for (meta.json records them;
jax.export refuses a mismatched platform at call time).
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import jax
import jax.numpy as jnp

_BLOB = "serving.stablehlo"
_VARS = "vars.msgpack"
_META = "meta.json"


def _specs_like(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), tree)


def export_serving(pipe, out_dir: str, *, source: str = "gray",
                   raw_hw: Tuple[int, int] | None = None,
                   keep_fused: bool = False,
                   static_batch: int | None = None,
                   platforms: Tuple[str, ...] = ("cpu", "tpu")) -> dict:
    """Serialize `pipe`'s grades graph into `out_dir`. Returns the meta dict.

    source="gray": input is raw (N, H, W) grayscale in [0, 255]; raw_hw fixes
    (H, W) at export (the spatial preprocess is shape-specialised, exactly as
    in the --device-preprocess serving path); N stays symbolic.
    source="rgb": input is host-preprocessed (N, S, S, 3) in [0, 1].
    static_batch: fix N at export instead of leaving it symbolic. A symbolic
    N is inconclusive against the pipeline's dense/packed crossover so the
    polymorphic artifact always ships the packed graph; a STATIC batch makes
    the comparison conclusive, so static_batch >= dense_batch_min exports the
    measured-fastest dense(+fused-up1-tail) graph at the production batch
    (queue-9 hybrid, 1325.9 img/s at b128 vs the packed graph's 1235.7).
    The loaded ServingArtifact pads/chunks any N to multiples of
    static_batch on the host and slices the grades back to N.
    platforms: lowering targets baked into the artifact (cross-platform
    lowering — a CPU build box can produce the TPU serving artifact).
    """
    from jax import export as jexport

    import flax.serialization

    fused = [k for k in ("fused_up1", "fused_up2", "fused_up34", "fused_down1")
             if getattr(pipe, k, False)]
    # dense_fused_up1 puts a Pallas call in the DENSE branch only; a symbolic
    # batch dim ships the packed graph (two_stage.unet_engine_fwd), so it can
    # reach the artifact only when the dense branch is what gets exported
    # (dense_batch_min <= 1, odd img_size with no packed forward at all, or a
    # static batch at/above the crossover)
    dbm = getattr(pipe, "dense_batch_min", None)
    dense_exported = (getattr(pipe, "img_size", 0) % 2 == 1 or
                      (dbm is not None and dbm <= 1) or
                      (dbm is not None and static_batch is not None
                       and static_batch >= dbm))
    if getattr(pipe, "dense_fused_up1", False) and dense_exported:
        fused.append("dense_fused_up1")
        # the up2 switch point only takes effect together with the fused up1
        # tail (engine.unet_forward ignores it otherwise)
        if getattr(pipe, "dense_up2", "dense") == "fused":
            fused.append("dense_up2")
    if fused and not keep_fused:
        raise ValueError(
            f"pipeline has Pallas levels enabled ({', '.join(fused)}); their "
            "custom calls are not portable across compiler versions. Build "
            "the pipeline with fused_*=False for export, or pass "
            "keep_fused=True to export anyway (same-version TPU only)")

    if static_batch is not None:
        if static_batch < 1:
            raise ValueError(f"static_batch must be >= 1, got {static_batch}")
        b = static_batch
    else:
        b, = jexport.symbolic_shape("b")
    if source == "gray":
        if raw_hw is None:
            raise ValueError("source='gray' needs raw_hw=(H, W)")
        in_spec = jax.ShapeDtypeStruct((b, *raw_hw), jnp.float32)
        fn = pipe._grades
    elif source == "rgb":
        raw_hw = (pipe.img_size, pipe.img_size)
        in_spec = jax.ShapeDtypeStruct((b, *raw_hw, 3), jnp.float32)
        e2e = pipe._e2e_from_rgb.__wrapped__
        fn = jax.jit(lambda uv, gv, imgs: e2e(uv, gv, imgs)["grades"])
    else:
        raise ValueError(f"unknown source {source!r} (use 'gray' or 'rgb')")

    export_kw = {}
    if keep_fused and fused:
        # Pallas custom calls lower for the current backend only, and
        # jax.export refuses custom-call targets without compatibility
        # guarantees (the Mosaic `tpu_custom_call`) unless explicitly
        # waived — which is exactly the keep_fused contract the caller
        # opted into (same-version same-backend artifact).
        platforms = (jax.default_backend(),)
        export_kw["disabled_checks"] = [
            jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")]
    exp = jexport.export(fn, platforms=platforms, **export_kw)(
        _specs_like(pipe.unet_vars), _specs_like(pipe.gnet_vars), in_spec)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _BLOB), "wb") as f:
        f.write(exp.serialize())
    with open(os.path.join(out_dir, _VARS), "wb") as f:
        f.write(flax.serialization.msgpack_serialize(
            {"unet": jax.device_get(pipe.unet_vars),
             "gnet": jax.device_get(pipe.gnet_vars)}))
    meta = {
        "source": source,
        "raw_hw": list(raw_hw),
        "img_size": pipe.img_size,
        "dtype": jnp.dtype(pipe.dtype).name,
        "platforms": list(exp.platforms),
        "jax_version": jax.__version__,
        "fused_levels": fused,
        "static_batch": static_batch,
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class ServingArtifact:
    """Loaded serving artifact: `artifact(batch)` -> (N,) int grades.

    Batch-polymorphic artifacts run any N directly. static_batch artifacts
    accept any N too: the runner pads the last chunk with zero images (the
    pipeline's empty-mask centre-crop fallback grades them harmlessly,
    reference 分类/ROI_main.py:70-74 semantics) and slices the grades back
    to N — the standard fixed-shape production-serving pattern.
    """

    def __init__(self, exported, variables, meta: dict):
        self._exported = exported
        # device-resident weights, transferred once at load
        self._vars = jax.device_put(variables)
        self.meta = meta
        # exported.call alone re-traces the deserialized module on every
        # invocation (measured 3283 ms vs 86 ms live at batch 64 on chip,
        # queue 4) — wrap it in jit ONCE so the executable is cached per
        # concrete batch shape like any jitted function.
        self._call = jax.jit(exported.call)

    def _grades(self, x) -> jax.Array:
        return self._call(self._vars["unet"], self._vars["gnet"], x)

    def __call__(self, batch) -> jax.Array:
        x = jnp.asarray(batch, jnp.float32)
        sb = self.meta.get("static_batch")
        if not sb or x.shape[0] == sb:
            return self._grades(x)
        n = x.shape[0]
        out = []
        for i in range(0, n, sb):
            chunk = x[i:i + sb]
            if chunk.shape[0] < sb:
                pad = jnp.zeros((sb - chunk.shape[0],) + x.shape[1:], x.dtype)
                chunk = jnp.concatenate([chunk, pad])
            out.append(self._grades(chunk))
        return jnp.concatenate(out)[:n]


def load_serving(out_dir: str) -> ServingArtifact:
    """Load an export_serving artifact. Needs only jax + flax, no model code."""
    from jax import export as jexport

    import flax.serialization

    with open(os.path.join(out_dir, _BLOB), "rb") as f:
        exported = jexport.deserialize(f.read())
    with open(os.path.join(out_dir, _VARS), "rb") as f:
        variables = flax.serialization.msgpack_restore(f.read())
    with open(os.path.join(out_dir, _META)) as f:
        meta = json.load(f)
    return ServingArtifact(exported, variables, meta)
