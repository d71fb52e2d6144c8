"""YOLOv2 region-layer training loss, vectorized, gradient-exact.

The reference computes a hand-written delta field rather than
differentiating a scalar loss (src_yolo2/region_layer.c:177-319):

  * coord deltas carry explicit logistic' factors for tx/ty
    (delta_region_box:101-104), tw/th are linear in the raw logits;
  * the objectness delta mixes noobject/object/rescore cases with
    logistic' factors (:232-305);
  * the class delta is (onehot - softmax_out) applied to the softmax
    OUTPUT and backpropagated as if the softmax were the identity
    (backward_region_layer:323-326 copies delta straight through) — a
    quirk that makes the effective gradient differ from cross-entropy.

Because of that last point, autodiff of any scalar cannot reproduce the
reference update. We therefore compute the exact delta field with
vectorized ops and inject it through jax.custom_vjp: the returned cost
matches the reference's printed cost (sum of squared deltas,
region_layer.c:319) and its gradient wrt the region input equals
-delta exactly (darknet deltas are negative gradients).

Truth layout matches data.c fill_truth_detection: (B, 30, 5) of
[x, y, w, h, class] relative coords, zero-padded.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.spec import RegionSpec
from ..ops.boxes import box_iou


def _truth_mask(truth):
    """Truths are consumed until the first x==0 (region_layer.c:224
    'if(!truth.x) break') — not just nonzero entries."""
    nonzero = truth[..., 0] != 0.0
    return jnp.cumprod(nonzero.astype(jnp.int32), axis=-1).astype(bool)


def region_delta(raw_flat, truth, seen, spec: RegionSpec):
    """Compute (activated_output_flat, delta_flat, stats).

    raw_flat: (B, H*W*A*F) region-layer input in darknet location-major
    order (== NHWC raster of the preceding conv). delta has the same
    layout; gradient wrt raw input is -delta.
    """
    b = raw_flat.shape[0]
    h, w, a, c = spec.h, spec.w, spec.n, spec.classes
    f = spec.coords + c + 1
    raw = raw_flat.reshape(b, h, w, a, f)

    anchors = jnp.asarray(np.asarray(spec.anchors, np.float32).reshape(a, 2))

    # ---- forward activations (region_layer.c:144-176) ----------------
    sig_xy = jax.nn.sigmoid(raw[..., 0:2])
    obj = jax.nn.sigmoid(raw[..., 4])
    cls_prob = jax.nn.softmax(raw[..., 5:], axis=-1) if spec.softmax \
        else raw[..., 5:]

    # ---- predicted boxes (get_region_box, DOABS) ---------------------
    col = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)[None, :, :, None]
    row = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)[None, :, :, None]
    px = (col + sig_xy[..., 0]) / w
    py = (row + sig_xy[..., 1]) / h
    pw = jnp.exp(raw[..., 2]) * anchors[:, 0] / w
    ph = jnp.exp(raw[..., 3]) * anchors[:, 1] / h
    pred = jnp.stack([px, py, pw, ph], axis=-1)       # (B,H,W,A,4)

    tmask = _truth_mask(truth)                        # (B,30)
    tboxes = truth[..., :4]                           # (B,30,4)
    tcls = truth[..., 4].astype(jnp.int32)

    # ---- stage 1: noobject deltas (region_layer.c:215-242) -----------
    ious = box_iou(pred[:, :, :, :, None, :],
                   tboxes[:, None, None, None, :, :])   # (B,H,W,A,30)
    ious = jnp.where(tmask[:, None, None, None, :], ious, 0.0)
    best_iou = jnp.max(ious, axis=-1)                 # (B,H,W,A)
    sig_grad_obj = obj * (1.0 - obj)

    d_obj = spec.noobject_scale * (0.0 - obj) * sig_grad_obj
    if spec.classfix == -1:
        d_obj = spec.noobject_scale * (best_iou - obj) * sig_grad_obj
    else:
        d_obj = jnp.where(best_iou > spec.thresh, 0.0, d_obj)

    # ---- stage 1b: coord warm-up toward anchors (seen < 12800) -------
    # delta_region_box(truth=anchor-centered box, scale .01)
    warm_t = jnp.stack([
        jnp.broadcast_to((col + 0.5) / w, pred.shape[:-1]),
        jnp.broadcast_to((row + 0.5) / h, pred.shape[:-1]),
        jnp.broadcast_to(anchors[:, 0] / w, pred.shape[:-1]),
        jnp.broadcast_to(anchors[:, 1] / h, pred.shape[:-1]),
    ], axis=-1)
    d_coord_warm = _coord_delta(raw, sig_xy, warm_t, anchors, col, row,
                                w, h, 0.01)
    d_coord = jnp.where(jnp.asarray(seen) < 12800,
                        d_coord_warm, jnp.zeros_like(d_coord_warm))

    d_cls = jnp.zeros_like(cls_prob)

    # ---- stage 2: per-truth assignment (region_layer.c:259-313) ------
    ti = jnp.clip((tboxes[..., 0] * w).astype(jnp.int32), 0, w - 1)
    tj = jnp.clip((tboxes[..., 1] * h).astype(jnp.int32), 0, h - 1)

    # best anchor by shifted IoU at the truth's cell
    cell_raw = raw[jnp.arange(b)[:, None], tj, ti]          # (B,30,A,F)
    cell_sig = jax.nn.sigmoid(cell_raw[..., 0:2])
    cpx = (ti[..., None] + cell_sig[..., 0]) / w
    cpy = (tj[..., None] + cell_sig[..., 1]) / h
    cpw = jnp.exp(cell_raw[..., 2]) * anchors[:, 0] / w
    cph = jnp.exp(cell_raw[..., 3]) * anchors[:, 1] / h
    if spec.bias_match:
        cpw = jnp.broadcast_to(anchors[:, 0] / w, cpw.shape)
        cph = jnp.broadcast_to(anchors[:, 1] / h, cph.shape)
    zeros = jnp.zeros_like(cpw)
    shifted_pred = jnp.stack([zeros, zeros, cpw, cph], axis=-1)
    shifted_truth = tboxes.at[..., 0:2].set(0.0)[..., None, :]
    siou = box_iou(shifted_pred, jnp.broadcast_to(shifted_truth,
                                                  shifted_pred.shape))
    best_n = jnp.argmax(siou, axis=-1)                      # (B,30)

    # coord delta at assigned (tj, ti, best_n)
    bsel = jnp.arange(b)[:, None]
    a_raw = cell_raw[bsel, jnp.arange(truth.shape[1])[None, :], best_n]
    a_sig = jax.nn.sigmoid(a_raw[..., 0:2])
    a_anch = anchors[best_n]                                # (B,30,2)
    tx = tboxes[..., 0] * w - ti
    ty = tboxes[..., 1] * h - tj
    tw = jnp.log(jnp.maximum(tboxes[..., 2] * w, 1e-12) / a_anch[..., 0])
    th = jnp.log(jnp.maximum(tboxes[..., 3] * h, 1e-12) / a_anch[..., 1])
    d_assigned = spec.coord_scale * jnp.stack([
        (tx - a_sig[..., 0]) * a_sig[..., 0] * (1 - a_sig[..., 0]),
        (ty - a_sig[..., 1]) * a_sig[..., 1] * (1 - a_sig[..., 1]),
        tw - a_raw[..., 2],
        th - a_raw[..., 3],
    ], axis=-1)                                             # (B,30,4)

    # iou of the (true, unshifted) assigned prediction vs truth
    apx = (ti + a_sig[..., 0]) / w
    apy = (tj + a_sig[..., 1]) / h
    apw = jnp.exp(a_raw[..., 2]) * a_anch[..., 0] / w
    aph = jnp.exp(a_raw[..., 3]) * a_anch[..., 1] / h
    a_pred = jnp.stack([apx, apy, apw, aph], axis=-1)
    a_iou = box_iou(a_pred, tboxes)                         # (B,30)

    a_obj = jax.nn.sigmoid(a_raw[..., 4])
    if spec.rescore:
        d_obj_assigned = spec.object_scale * (a_iou - a_obj) \
            * a_obj * (1 - a_obj)
    else:
        d_obj_assigned = spec.object_scale * (1.0 - a_obj) \
            * a_obj * (1 - a_obj)

    # class one-hot delta at assigned location
    a_cls_prob = cls_prob[bsel, tj, ti, best_n]             # (B,30,C)
    onehot = jax.nn.one_hot(tcls, c, dtype=a_cls_prob.dtype)
    d_cls_assigned = spec.class_scale * (onehot - a_cls_prob)

    # ---- scatter assigned deltas (sequential overwrite in reference;
    #      duplicate cells are rare and last-wins either way) ----------
    tjv, tiv, bnv = tj, ti, best_n
    mask = tmask

    def scatter(base, upd):
        """base (B,H,W,A,K); upd (B,30,K) masked scatter-set."""
        upd = jnp.where(mask[..., None], upd,
                        base[bsel, tjv, tiv, bnv])
        return base.at[bsel, tjv, tiv, bnv].set(upd)

    d_coord = scatter(d_coord, d_assigned)
    d_obj = scatter(d_obj[..., None], d_obj_assigned[..., None])[..., 0]
    d_cls = scatter(d_cls, d_cls_assigned)

    delta = jnp.concatenate([d_coord, d_obj[..., None], d_cls], axis=-1)
    acts = jnp.concatenate([raw[..., :4], obj[..., None], cls_prob],
                           axis=-1)

    n_t = jnp.sum(mask, axis=(0, 1))
    stats = {
        "avg_iou": jnp.sum(jnp.where(mask, a_iou, 0.0)) / jnp.maximum(n_t, 1),
        "recall": jnp.sum(jnp.where(mask, (a_iou > 0.5), False)) /
        jnp.maximum(n_t, 1),
        "avg_obj": jnp.sum(jnp.where(mask, a_obj, 0.0)) / jnp.maximum(n_t, 1),
        "avg_anyobj": jnp.mean(obj),
        "count": n_t,
    }
    return acts.reshape(b, -1), delta.reshape(b, -1), stats


def _coord_delta(raw, sig_xy, tgt, anchors, col, row, w, h, scale):
    """delta_region_box for a broadcast target box (B,H,W,A,4)."""
    tx = tgt[..., 0] * w - col
    ty = tgt[..., 1] * h - row
    tw = jnp.log(jnp.maximum(tgt[..., 2], 1e-12) * w / anchors[:, 0])
    th = jnp.log(jnp.maximum(tgt[..., 3], 1e-12) * h / anchors[:, 1])
    return scale * jnp.stack([
        (tx - sig_xy[..., 0]) * sig_xy[..., 0] * (1 - sig_xy[..., 0]),
        (ty - sig_xy[..., 1]) * sig_xy[..., 1] * (1 - sig_xy[..., 1]),
        tw - raw[..., 2],
        th - raw[..., 3],
    ], axis=-1)


# ---------------------------------------------------------------------------
# custom-vjp loss: cost = sum(delta^2) (region_layer.c:319), grad = -delta
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def region_loss(raw_flat, truth, seen, spec):
    _, delta, _ = region_delta(raw_flat, truth, seen, spec)
    return jnp.sum(jnp.square(delta))


def _region_loss_fwd(raw_flat, truth, seen, spec):
    _, delta, _ = region_delta(raw_flat, truth, seen, spec)
    return jnp.sum(jnp.square(delta)), delta


def _region_loss_bwd(spec, delta, g):
    # darknet semantics: delta is the NEGATIVE gradient wrt the region
    # input; the scalar cost is reported, but the backward pass uses
    # delta directly (backward_region_layer axpys delta into the
    # upstream gradient) — g scales it for composition with outer fns.
    return (-delta * g, None, None)


region_loss.defvjp(_region_loss_fwd, _region_loss_bwd)


def region_loss_with_stats(raw_flat, truth, seen, spec):
    """(cost, stats) pair; cost has the custom exact gradient."""
    cost = region_loss(raw_flat, truth, seen, spec)
    _, _, stats = region_delta(jax.lax.stop_gradient(raw_flat), truth,
                               seen, spec)
    return cost, stats


__all__ = ["region_delta", "region_loss", "region_loss_with_stats"]
