"""Property/fuzz tests for the on-device ROI bridge (ops/bbox.py) against a host
oracle that implements 分类/util/roi.py:25-39 exactly: np.where bbox with ±pad and
[0, size] exclusive-end clamping, empty-mask centre fallback, numpy slice, and
cv2.INTER_LINEAR resize (the half-pixel convention crop_and_resize targets).

≥200 randomised cases plus adversarial shapes: empty, full, single-pixel (incl.
corners), border-touching strips, thin lines, random blobs — asserting exact box
equality, crop agreement within interpolation tolerance, and top-1 stability
through a fixed GoogLeNet.
"""

import cv2
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unet_goolenet_tpu.ops.bbox import roi_from_mask

RNG = np.random.default_rng(42)
OUT = (64, 64)
PAD = 30


def host_oracle(image: np.ndarray, mask: np.ndarray, padding: int, out_hw):
    """roi.py:25-39 verbatim in numpy + cv2."""
    h, w = mask.shape
    ys, xs = np.where(mask == 1)
    if len(xs) == 0 or len(ys) == 0:
        cx, cy = w // 2, h // 2
        size = min(h, w) // 2
        x0, x1 = cx - size // 2, cx + size // 2
        y0, y1 = cy - size // 2, cy + size // 2
    else:
        x0 = max(xs.min() - padding, 0)
        x1 = min(xs.max() + padding, w)
        y0 = max(ys.min() - padding, 0)
        y1 = min(ys.max() + padding, h)
    crop = image[y0:y1, x0:x1]
    crop = cv2.resize(crop, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR)
    return crop, (int(y0), int(y1), int(x0), int(x1))


def make_cases(n_random: int = 200):
    """(image, mask) pairs: adversarial shapes first, then random blobs."""
    cases = []

    def case(h, w, paint):
        img = RNG.random((h, w, 3)).astype(np.float32)
        m = np.zeros((h, w), np.float32)
        paint(m)
        cases.append((img, m))

    for h, w in ((60, 80), (81, 61), (45, 45)):
        case(h, w, lambda m: None)                                   # empty
        case(h, w, lambda m: m.fill(1.0))                            # full
        case(h, w, lambda m: m.__setitem__((0, 0), 1.0))             # corner pixel
        case(h, w, lambda m: m.__setitem__((m.shape[0] - 1, m.shape[1] - 1), 1.0))
        case(h, w, lambda m: m.__setitem__((m.shape[0] // 2, m.shape[1] // 2), 1.0))
        case(h, w, lambda m: m.__setitem__((0, slice(None)), 1.0))   # top strip
        case(h, w, lambda m: m.__setitem__((slice(None), -1), 1.0))  # right strip
        case(h, w, lambda m: m.__setitem__((slice(None), m.shape[1] // 3), 1.0))

    for _ in range(n_random):
        h = int(RNG.integers(40, 128))
        w = int(RNG.integers(40, 128))
        img = RNG.random((h, w, 3)).astype(np.float32)
        m = np.zeros((h, w), np.float32)
        kind = RNG.integers(0, 3)
        if kind == 0:  # rectangle blob
            y0 = int(RNG.integers(0, h - 1)); y1 = int(RNG.integers(y0 + 1, h + 1))
            x0 = int(RNG.integers(0, w - 1)); x1 = int(RNG.integers(x0 + 1, w + 1))
            m[y0:y1, x0:x1] = 1.0
        elif kind == 1:  # sparse noise
            m[RNG.random((h, w)) > float(RNG.uniform(0.9, 0.999))] = 1.0
        # kind == 2: leave empty (fallback path)
        cases.append((img, m))
    return cases


class TestROIFuzz:
    def test_box_and_crop_vs_host_oracle(self):
        bad_boxes, bad_crops = [], []
        for i, (img, mask) in enumerate(make_cases()):
            want_crop, want_box = host_oracle(img, mask, PAD, OUT)
            crop, box = roi_from_mask(jnp.asarray(img), jnp.asarray(mask),
                                      padding=PAD, out_hw=OUT)
            box = tuple(int(v) for v in np.asarray(box))
            if box != want_box:
                bad_boxes.append((i, box, want_box))
                continue
            diff = float(np.abs(np.asarray(crop) - want_crop).max())
            if diff > 5e-3:
                bad_crops.append((i, diff, box, mask.sum()))
        assert not bad_boxes, bad_boxes[:5]
        assert not bad_crops, bad_crops[:5]

    def test_top1_stability_through_fixed_googlenet(self):
        """The interpolation delta between the device crop and the host-oracle
        crop must not flip classification (unless the logit gap itself is
        sub-tolerance — a genuine tie)."""
        from unet_goolenet_tpu.models import GoogLeNetClassifier

        model = GoogLeNetClassifier(num_classes=6)
        variables = model.init({"params": jax.random.PRNGKey(5),
                                "dropout": jax.random.PRNGKey(5)},
                               jnp.zeros((1, *OUT, 3)), train=False)
        apply = jax.jit(lambda v, x: model.apply(v, x, train=False))

        dev_crops, host_crops = [], []
        for img, mask in make_cases(n_random=16)[:40]:
            want_crop, _ = host_oracle(img, mask, PAD, OUT)
            crop, _ = roi_from_mask(jnp.asarray(img), jnp.asarray(mask),
                                    padding=PAD, out_hw=OUT)
            dev_crops.append(np.asarray(crop))
            host_crops.append(want_crop)
        dev_logits = np.asarray(apply(variables, jnp.asarray(np.stack(dev_crops))))
        host_logits = np.asarray(apply(variables, jnp.asarray(np.stack(host_crops))))
        for d, h in zip(dev_logits, host_logits):
            top2 = np.sort(h)[-2:]
            if top2[1] - top2[0] > 1e-3:
                assert int(d.argmax()) == int(h.argmax()), (d, h)
