"""Golden regression fixtures (SURVEY.md §4: golden-input tests as the parity
backbone). Fixed PRNG weights + fixed inputs -> stored output statistics. Catches
silent numerical drift in any layer of the stack; regenerate with
`python tests/test_golden.py` after an INTENTIONAL numerics change."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "golden.json")
KEY = jax.random.PRNGKey(1234)


def _stats(x) -> dict:
    x = np.asarray(x, np.float64)
    return {
        "mean": float(x.mean()),
        "std": float(x.std()),
        "absmax": float(np.abs(x).max()),
        "corner": [float(v) for v in x.ravel()[:4]],
    }


def compute_golden() -> dict:
    from unet_goolenet_tpu.models import UNetTaskAligWeight, GoogLeNetClassifier
    from unet_goolenet_tpu import ops
    from unet_goolenet_tpu.pipeline import preprocess_gray

    out = {}
    x = jax.random.uniform(KEY, (1, 64, 64, 3))

    unet = UNetTaskAligWeight(n_classes=1)
    uv = unet.init({"params": KEY}, x, train=False)
    out["unet_logits"] = _stats(unet.apply(uv, x, train=False))

    gnet = GoogLeNetClassifier(num_classes=6)
    gv = gnet.init({"params": KEY, "dropout": KEY}, x, train=False)
    out["gnet_logits"] = _stats(gnet.apply(gv, x, train=False))

    gray = jax.random.uniform(KEY, (1, 80, 90)) * 255
    out["preprocess"] = _stats(preprocess_gray(gray, out_hw=(64, 64)))

    mask = jnp.zeros((64, 64)).at[20:40, 25:45].set(1.0)
    crop, box = ops.roi_from_mask(x[0], mask, out_hw=(64, 64))
    out["roi_crop"] = _stats(crop)
    out["roi_box"] = [int(v) for v in np.asarray(box)]
    return out


class TestGolden:
    def test_against_stored(self):
        assert os.path.exists(GOLDEN_PATH), (
            "golden file missing — run `python tests/test_golden.py` to create")
        with open(GOLDEN_PATH) as f:
            stored = json.load(f)
        current = compute_golden()
        for name, ref in stored.items():
            got = current[name]
            if name == "roi_box":
                assert got == ref, (name, got, ref)
                continue
            for stat in ("mean", "std", "absmax"):
                assert abs(got[stat] - ref[stat]) <= 1e-4 * max(1.0, abs(ref[stat])), (
                    name, stat, got[stat], ref[stat])
            np.testing.assert_allclose(got["corner"], ref["corner"],
                                       rtol=1e-4, atol=1e-5, err_msg=name)


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(compute_golden(), f, indent=1)
    print(f"wrote {GOLDEN_PATH}")
