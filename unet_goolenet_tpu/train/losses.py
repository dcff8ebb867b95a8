"""Loss zoo (reference: 分割/util/loss.py + 分割/util/lovasz.py), as pure JAX functions.

Conventions: segmentation logits/targets are NHWC (targets (N,H,W,1) float in {0,1});
multiclass pixel losses take logits (N,H,W,C) and int targets (N,H,W); classification
losses take (N,C) logits and (N,) int labels. All reductions return scalars in f32.

The two losses actually *used* by the reference training loops are
`dc_and_bce_loss` (seg, main.py:245) and plain `cross_entropy` (cls,
ROI_main.py:228-229 builds a fresh nn.CrossEntropyLoss inside the loop); the rest of
the zoo is part of the capability surface (instantiated-but-unused `bce_focal_loss`
included).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

# --------------------------------------------------------------------------- utils


def _flatten_keep_channel(x: jax.Array) -> jax.Array:
    """(N, H, W, C) -> (N, C, H*W); also accepts (N, C)->(N, C, 1)."""
    if x.ndim == 2:
        return x[:, :, None]
    n = x.shape[0]
    c = x.shape[-1]
    return x.reshape(n, -1, c).transpose(0, 2, 1)


def sigmoid_binary_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Numerically-stable elementwise BCE-with-logits (no reduction)."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def softmax_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    weight: Optional[jax.Array] = None,
) -> jax.Array:
    """torch.nn.CrossEntropyLoss semantics: int labels, optional per-class weight,
    weighted mean reduction."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    if weight is None:
        return jnp.mean(nll)
    w = weight[labels]
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    return softmax_cross_entropy(logits, labels)


# ------------------------------------------------------------------ dice & friends


def soft_dice_loss(
    logits: jax.Array,
    target: jax.Array,
    *,
    sigmoid: bool = True,
    smooth_nr: float = 1e-5,
    smooth_dr: float = 1e-5,
) -> jax.Array:
    """monai.losses.DiceLoss(sigmoid=True) semantics: per-(sample, channel) dice over
    spatial dims, mean-reduced."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32)) if sigmoid else logits.astype(jnp.float32)
    t = target.astype(jnp.float32)
    spatial = tuple(range(1, p.ndim - 1))
    inter = jnp.sum(p * t, axis=spatial)
    denom = jnp.sum(p, axis=spatial) + jnp.sum(t, axis=spatial)
    dice = (2.0 * inter + smooth_nr) / (denom + smooth_dr)
    return jnp.mean(1.0 - dice)


def dc_and_bce_loss(
    logits: jax.Array, target: jax.Array, *, dice_weight: float = 0.5
) -> jax.Array:
    """(1-w)*BCEWithLogits + w*DiceLoss(sigmoid) — THE seg training loss
    (loss.py:64-86, instantiated with dice_weight=0.5 at main.py:245)."""
    bce = jnp.mean(sigmoid_binary_cross_entropy(logits, target))
    dice = soft_dice_loss(logits, target, sigmoid=True)
    return (1.0 - dice_weight) * bce + dice_weight * dice


def mask_dice_loss(logits: jax.Array, target: jax.Array, *, sigmoid: bool = False) -> jax.Array:
    """loss.py:14-39: squared-denominator dice on channel 0, global reduction."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32)) if sigmoid else logits.astype(jnp.float32)
    t = target.astype(jnp.float32)
    p0, t0 = p[..., 0], t[..., 0]
    smooth = 1e-5
    inter = jnp.sum(p0 * t0)
    coef = (2 * inter + smooth) / (jnp.sum(p0 * p0) + jnp.sum(t0 * t0) + smooth)
    return 1.0 - coef


def mask_dc_and_bce_loss(
    logits: jax.Array,
    target: jax.Array,
    *,
    pos_weight: Optional[jax.Array] = None,
    dice_weight: float = 0.6,
) -> jax.Array:
    """loss.py:40-62."""
    logits32 = logits.astype(jnp.float32)
    t = target.astype(jnp.float32)
    bce = sigmoid_binary_cross_entropy(logits32, t)
    if pos_weight is not None:
        # BCEWithLogitsLoss(pos_weight): scales the positive term
        logp = jax.nn.log_sigmoid(logits32)
        log1mp = jax.nn.log_sigmoid(-logits32)
        bce = -(pos_weight * t * logp + (1 - t) * log1mp)
    ce = jnp.mean(bce)
    dice = mask_dice_loss(logits, target, sigmoid=True)
    return (1 - dice_weight) * ce + dice_weight * dice


# ------------------------------------------------------------------- focal family


def bce_focal_loss(
    logits: jax.Array, target: jax.Array, *, gamma: float = 1.5, alpha: float = 0.2,
    reduction: str = "mean",
) -> jax.Array:
    """Binary focal loss (loss.py:118-138; instantiated with gamma=2, alpha=0.4 at
    main.py:246 / ROI_main.py:300). Uses raw log(p) like the reference."""
    pt = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = target.astype(jnp.float32)
    eps = 1e-12  # the reference relies on torch log(0)=-inf*0 edge behaviour; we clamp
    loss = -alpha * (1 - pt) ** gamma * t * jnp.log(jnp.maximum(pt, eps)) - (
        1 - alpha
    ) * pt ** gamma * (1 - t) * jnp.log(jnp.maximum(1 - pt, eps))
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def multiclass_focal_loss_with_alpha(
    logits: jax.Array, labels: jax.Array, *, alpha: Sequence[float] = (0.6, 0.4),
    gamma: float = 1.5, reduction: str = "mean",
) -> jax.Array:
    """loss.py:89-115: per-sample alpha[label] * (1-pt)^gamma * CE."""
    a = jnp.asarray(alpha, jnp.float32)[labels]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    logpt = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    pt = jnp.exp(logpt)
    focal = a * (1 - pt) ** gamma * (-logpt)
    if reduction == "mean":
        return jnp.mean(focal)
    if reduction == "sum":
        return jnp.sum(focal)
    return focal


def focal_loss_multiclass(
    logits: jax.Array, labels: jax.Array, *, alpha=None, gamma: float = 2.0,
    num_classes: int = 3, size_average: bool = True,
) -> jax.Array:
    """loss.py:425-470 (`focal_loss`): list/scalar alpha focal CE."""
    if alpha is None:
        a = jnp.ones((num_classes,), jnp.float32)
    elif jnp.ndim(alpha) == 0 or isinstance(alpha, float):
        a = jnp.concatenate([
            jnp.asarray([alpha], jnp.float32),
            jnp.full((num_classes - 1,), 1.0 - float(alpha), jnp.float32),
        ])
    else:
        a = jnp.asarray(alpha, jnp.float32)
    logits2 = logits.reshape(-1, logits.shape[-1]).astype(jnp.float32)
    lab = labels.reshape(-1).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits2, axis=-1)
    logpt = jnp.take_along_axis(logp, lab[:, None], axis=-1)[:, 0]
    pt = jnp.exp(logpt)
    loss = -a[lab] * (1 - pt) ** gamma * logpt
    return jnp.mean(loss) if size_average else jnp.sum(loss)


# -------------------------------------------------------------------- tversky etc.


def tversky_loss(
    logits: jax.Array, target: jax.Array, *, alpha: float, beta: float,
    apply_nonlin: bool = False, batch_dice: bool = False, do_bg: bool = True,
    smooth: float = 1.0, square: bool = False,
) -> jax.Array:
    """loss.py:191-228 (returns -tversky like the reference)."""
    x = jax.nn.sigmoid(logits.astype(jnp.float32)) if apply_nonlin else logits.astype(jnp.float32)
    t = target.astype(jnp.float32)
    xc = _flatten_keep_channel(x)
    tc = _flatten_keep_channel(t)
    tp, fp, fn = xc * tc, xc * (1 - tc), (1 - xc) * tc
    if square:
        tp, fp, fn = tp ** 2, fp ** 2, fn ** 2
    axes = (0, 2) if batch_dice else (2,)
    tp, fp, fn = (jnp.sum(v, axis=axes) for v in (tp, fp, fn))
    tv = (tp + smooth) / (tp + alpha * fp + beta * fn + smooth)
    if not do_bg:
        tv = tv[1:] if batch_dice else tv[:, 1:]
    return -jnp.mean(tv)


def focal_tversky_loss(
    logits: jax.Array, target: jax.Array, *, gamma: float = 2.0,
    alpha: float = 0.6, beta: float = 0.7,
) -> jax.Array:
    """loss.py:229-246."""
    tl = 1.0 + tversky_loss(logits, target, alpha=alpha, beta=beta)
    return tl ** gamma


# ------------------------------------------------------------------ binary family


def binary_jaccard_loss(logits: jax.Array, target: jax.Array) -> jax.Array:
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = target.astype(jnp.float32)
    inter = jnp.sum(p * t)
    union = jnp.maximum(jnp.sum(p) + jnp.sum(t) - inter + 1e-5, 1e-7)
    return 1.0 - (inter + 1e-5) / union


def binary_dice_loss(logits: jax.Array, target: jax.Array) -> jax.Array:
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = target.astype(jnp.float32)
    inter = jnp.sum(p * t)
    dsc = (2 * inter + 1e-5) / jnp.maximum(jnp.sum(p) + jnp.sum(t) + 1e-5, 1e-7)
    return 1.0 - dsc


def binary_el_dice_loss(logits: jax.Array, target: jax.Array) -> jax.Array:
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = target.astype(jnp.float32)
    inter = jnp.sum(p * t)
    dsc = (2 * inter + 1e-5) / jnp.maximum(jnp.sum(p) + jnp.sum(t) + 1e-5, 1e-7)
    return jnp.clip((-jnp.log(dsc + 1e-5)) ** 0.3, 0.0, 2.0)


def binary_ss_loss(logits: jax.Array, target: jax.Array, *, r: float = 0.1) -> jax.Array:
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = target.astype(jnp.float32)
    sq = (p - t) ** 2
    spec = jnp.sum(sq * t) / (1e-5 + jnp.sum(t))
    sens = jnp.sum(sq * (1 - t)) / (1e-5 + jnp.sum(1 - t))
    return r * spec + (1 - r) * sens


def binary_tversky_loss(
    probs: jax.Array, target: jax.Array, *, alpha: float = 0.3, beta: float = 0.7
) -> jax.Array:
    """NOTE: the reference variant takes probabilities, not logits (loss.py:356-358)."""
    p = probs.astype(jnp.float32)
    t = target.astype(jnp.float32)
    tp = jnp.sum(p * t)
    fp = jnp.sum(p * (1 - t))
    fn = jnp.sum((1 - p) * t)
    tv = (tp + 1e-5) / (tp + alpha * fp + beta * fn + 1e-5)
    return jnp.clip(1.0 - tv, 0.0, 2.0)


def binary_cross_entropy_loss(logits: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(sigmoid_binary_cross_entropy(logits, target))


def binary_cross_entropy_dice_loss(logits: jax.Array, target: jax.Array) -> jax.Array:
    return 0.5 * binary_cross_entropy_loss(logits, target) + 0.5 * binary_dice_loss(
        logits, target
    )


def mcc_loss(probs: jax.Array, target: jax.Array) -> jax.Array:
    """Matthews correlation coefficient loss (loss.py:510-542)."""
    p = probs.astype(jnp.float32)
    t = target.astype(jnp.float32)
    tp = jnp.sum(p * t)
    tn = jnp.sum((1 - p) * (1 - t))
    fp = jnp.sum(p * (1 - t))
    fn = jnp.sum((1 - p) * t)
    num = tp * tn - fp * fn
    den = jnp.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    return 1.0 - num / (den + 1.0)


# --------------------------------------------------------------------- lovasz


def _lovasz_grad(gt_sorted: jax.Array) -> jax.Array:
    """Gradient of the Lovasz extension w.r.t. sorted errors (Berman 2018)."""
    p = gt_sorted.shape[0]
    gts = jnp.sum(gt_sorted)
    cum = jnp.cumsum(gt_sorted)
    intersection = gts - cum
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / union
    if p > 1:
        jaccard = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
    return jaccard


def _lovasz_hinge_flat(logits: jax.Array, labels: jax.Array) -> jax.Array:
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    order = jnp.argsort(-errors)
    errors_sorted = errors[order]
    grad = _lovasz_grad(labels[order])
    return jnp.dot(jax.nn.relu(errors_sorted), grad)


def lovasz_hinge(
    logits: jax.Array, labels: jax.Array, *, per_image: bool = False
) -> jax.Array:
    """Binary Lovasz hinge. logits/labels NHWC or (N,H,W)."""
    lg = logits.reshape(logits.shape[0], -1).astype(jnp.float32)
    lb = labels.reshape(labels.shape[0], -1).astype(jnp.float32)
    if per_image:
        return jnp.mean(jax.vmap(_lovasz_hinge_flat)(lg, lb))
    return _lovasz_hinge_flat(lg.reshape(-1), lb.reshape(-1))


def _lovasz_softmax_flat(probs: jax.Array, labels: jax.Array) -> jax.Array:
    """probs (P, C), labels (P,) int."""
    c = probs.shape[1]

    def per_class(ci):
        fg = (labels == ci).astype(jnp.float32)
        errors = jnp.abs(fg - probs[:, ci])
        order = jnp.argsort(-errors)
        loss = jnp.dot(errors[order], _lovasz_grad(fg[order]))
        present = jnp.sum(fg) > 0
        return loss, present

    losses, present = jax.vmap(per_class)(jnp.arange(c))
    pm = present.astype(jnp.float32)
    return jnp.sum(losses * pm) / jnp.maximum(jnp.sum(pm), 1.0)


def lovasz_softmax(
    logits: jax.Array, labels: jax.Array, *, per_image: bool = False
) -> jax.Array:
    """Multiclass Lovasz-softmax. logits (N,H,W,C), labels (N,H,W) int."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    p = probs.reshape(probs.shape[0], -1, probs.shape[-1])
    l = labels.reshape(labels.shape[0], -1)
    if per_image:
        return jnp.mean(jax.vmap(_lovasz_softmax_flat)(p, l))
    return _lovasz_softmax_flat(p.reshape(-1, p.shape[-1]), l.reshape(-1))


# -------------------------------------------------------------- multiclass family


def _onehot_cp(labels: jax.Array, c: int) -> jax.Array:
    """(N, P) int -> (N, C, P) one-hot float."""
    return jax.nn.one_hot(labels, c, axis=1, dtype=jnp.float32)


def mutil_cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """loss.py:557-570: CE weighted by class presence in the batch."""
    c = logits.shape[-1]
    flat_logits = logits.reshape(-1, c)
    flat_labels = labels.reshape(-1)
    onehot = jax.nn.one_hot(flat_labels, c, dtype=jnp.float32)
    present = (jnp.sum(onehot, axis=0) > 0).astype(jnp.float32)
    return softmax_cross_entropy(flat_logits, flat_labels, weight=present)


def mutil_focal_loss(logits: jax.Array, labels: jax.Array, *, gamma: float = 2.0) -> jax.Array:
    """loss.py:573-595."""
    c = logits.shape[-1]
    flat_logits = logits.reshape(-1, c).astype(jnp.float32)
    flat_labels = labels.reshape(-1).astype(jnp.int32)
    onehot = jax.nn.one_hot(flat_labels, c, dtype=jnp.float32)
    present = (jnp.sum(onehot, axis=0) > 0).astype(jnp.float32)
    logp = jax.nn.log_softmax(flat_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, flat_labels[:, None], axis=-1)[:, 0]
    w = present[flat_labels]
    logpt = nll * w  # weighted per-element CE, reduction='none' semantics
    pt = jnp.exp(-logpt)
    return jnp.mean((1 - pt) ** gamma * logpt)


def mutil_dice_loss(
    logits: jax.Array, labels: jax.Array, *, alpha: Optional[Sequence[float]] = None
) -> jax.Array:
    """loss.py:598-635: per-class generalized dice over (batch, pixels), weighted,
    masked to present classes. NOTE the reference returns MINUS dice (not 1-dice)."""
    c = logits.shape[-1]
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    pc = p.reshape(-1, c)
    onehot = jax.nn.one_hot(labels.reshape(-1), c, dtype=jnp.float32)
    inter = jnp.sum(pc * onehot, axis=0)
    denom = jnp.sum(pc + onehot, axis=0)
    coef = jnp.maximum((2 * inter + 1e-5) / (denom + 1e-5), 1e-7)
    mask = (jnp.sum(onehot, axis=0) > 0).astype(jnp.float32)
    a = jnp.ones((c,), jnp.float32) if alpha is None else jnp.asarray(alpha, jnp.float32)
    loss = -coef * mask * a
    return jnp.sum(loss) / jnp.maximum(jnp.sum(mask), 1.0)


def mutil_cross_entropy_dice_loss(
    logits: jax.Array, labels: jax.Array, *, alpha: Optional[Sequence[float]] = None
) -> jax.Array:
    return mutil_cross_entropy_loss(logits, labels) + mutil_dice_loss(
        logits, labels, alpha=alpha
    )


def mutil_el_dice_loss(
    logits: jax.Array, labels: jax.Array, *, alpha: Optional[Sequence[float]] = None
) -> jax.Array:
    """loss.py:655-692."""
    c = logits.shape[-1]
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).reshape(-1, c)
    onehot = jax.nn.one_hot(labels.reshape(-1), c, dtype=jnp.float32)
    inter = jnp.sum(p * onehot, axis=0)
    denom = jnp.sum(p + onehot, axis=0)
    coef = jnp.maximum((2 * inter + 1e-5) / (denom + 1e-5), 1e-7)
    mask = (jnp.sum(onehot, axis=0) > 0).astype(jnp.float32)
    a = jnp.ones((c,), jnp.float32) if alpha is None else jnp.asarray(alpha, jnp.float32)
    dice = coef * mask * a
    val = jnp.sum((-jnp.log(dice + 1e-5)) ** 0.3) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.clip(val, 0.0, 2.0)


def mutil_ss_loss(
    logits: jax.Array, labels: jax.Array, *, r: float = 0.1,
    alpha: Optional[Sequence[float]] = None,
) -> jax.Array:
    """loss.py:695-728 (fixing nothing: mirrors its sensitivity/specificity split)."""
    c = logits.shape[-1]
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).reshape(-1, c)
    onehot = jax.nn.one_hot(labels.reshape(-1), c, dtype=jnp.float32)
    sq = (onehot - p) ** 2
    tsum = jnp.sum(onehot, axis=0)
    spec = jnp.sum(sq * onehot, axis=0) / (tsum + 1e-5)
    sens = jnp.sum(sq * (1 - onehot), axis=0) / (tsum + 1e-5)
    ss = r * spec + (1 - r) * sens
    mask = (tsum > 0).astype(jnp.float32)
    a = jnp.ones((c,), jnp.float32) if alpha is None else jnp.asarray(alpha, jnp.float32)
    return jnp.sum(ss * mask * a) / jnp.maximum(jnp.sum(mask), 1.0)


def mutil_tversky_loss(
    logits: jax.Array, labels: jax.Array, *, alpha: float = 0.3, beta: float = 0.7,
    class_weight: Optional[Sequence[float]] = None,
) -> jax.Array:
    """loss.py:731-769 (returns minus tversky, masked/weighted)."""
    c = logits.shape[-1]
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).reshape(-1, c)
    onehot = jax.nn.one_hot(labels.reshape(-1), c, dtype=jnp.float32)
    tp = jnp.sum(p * onehot, axis=0)
    fp = jnp.sum(p * (1 - onehot), axis=0)
    fn = jnp.sum((1 - p) * onehot, axis=0)
    tv = -(tp + 1e-5) / (tp + alpha * fp + beta * fn + 1e-5)
    mask = (jnp.sum(onehot, axis=0) > 0).astype(jnp.float32)
    w = jnp.ones((c,), jnp.float32) if class_weight is None else jnp.asarray(class_weight, jnp.float32)
    return jnp.sum(tv * mask * w) / jnp.maximum(jnp.sum(mask), 1.0)


# ----------------------------------------------------- uncertainty-weighted multitask


def automatic_weighted_loss(params: jax.Array, *losses: jax.Array) -> jax.Array:
    """Uncertainty-weighted multitask aggregation (loss.py:473-493).
    `params` is a learnable (num,) vector, ones-initialised."""
    total = jnp.float32(0.0)
    for i, loss in enumerate(losses):
        total = total + 0.5 / (params[i] ** 2) * loss + jnp.log1p(params[i] ** 2)
    return total


def aux_weighted_cross_entropy(
    main_logits: jax.Array,
    aux_logits: Sequence[jax.Array],
    labels: jax.Array,
    *,
    aux_weight: float = 0.3,
) -> jax.Array:
    """GoogLeNet paper-style training loss: CE(main) + 0.3 * sum CE(aux_i).
    The reference never exercises this (pretrained torchvision strips aux heads) but
    BASELINE.json asks for aux-loss training support."""
    loss = softmax_cross_entropy(main_logits, labels)
    for a in aux_logits:
        if a is not None:
            loss = loss + aux_weight * softmax_cross_entropy(a, labels)
    return loss


REGISTRY = {
    "dc_and_bce": dc_and_bce_loss,
    "mask_dice": mask_dice_loss,
    "mask_dc_and_bce": mask_dc_and_bce_loss,
    "bce_focal": bce_focal_loss,
    "multiclass_focal_alpha": multiclass_focal_loss_with_alpha,
    "focal_multiclass": focal_loss_multiclass,
    "tversky": tversky_loss,
    "focal_tversky": focal_tversky_loss,
    "binary_jaccard": binary_jaccard_loss,
    "binary_dice": binary_dice_loss,
    "binary_el_dice": binary_el_dice_loss,
    "binary_ss": binary_ss_loss,
    "binary_tversky": binary_tversky_loss,
    "binary_ce": binary_cross_entropy_loss,
    "binary_ce_dice": binary_cross_entropy_dice_loss,
    "mcc": mcc_loss,
    "lovasz_hinge": lovasz_hinge,
    "lovasz_softmax": lovasz_softmax,
    "mutil_ce": mutil_cross_entropy_loss,
    "mutil_focal": mutil_focal_loss,
    "mutil_dice": mutil_dice_loss,
    "mutil_ce_dice": mutil_cross_entropy_dice_loss,
    "mutil_el_dice": mutil_el_dice_loss,
    "mutil_ss": mutil_ss_loss,
    "mutil_tversky": mutil_tversky_loss,
    "cross_entropy": cross_entropy,
    "aux_weighted_ce": aux_weighted_cross_entropy,
}
