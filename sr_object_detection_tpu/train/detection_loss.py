"""YOLOv1 detection-layer loss, vectorized, gradient-exact.

Reference: forward_detection_layer train path
(src_yolo2/detection_layer.c:49-217). Like the region loss, the
reference writes a delta field directly (deltas are NEGATIVE gradients,
backward just axpys them — :218-222), so we compute the same field
vectorized and inject it via custom_vjp.

Layouts (flat per batch row of `inputs`):
  [side^2 * classes class probs][side^2 * n objectness]
  [side^2 * n * coords boxes]
Truth per cell (side^2 cells x (1+coords+classes)):
  [is_obj][class one-hot...][x, y, w, h] with x,y in CELL units
  (forward divides by side: :104-106).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..graph.spec import DetectionSpec
from ..ops.boxes import box_iou


def detection_delta(output, truth, seen, spec: DetectionSpec):
    """output: (B, inputs) post-softmax detection layer output.
    truth: (B, side^2, 1+coords+classes). Returns delta (B, inputs)."""
    b = output.shape[0]
    s2 = spec.side * spec.side
    nc, nb, co = spec.classes, spec.n, spec.coords

    cls = output[:, :s2 * nc].reshape(b, s2, nc)
    obj = output[:, s2 * nc:s2 * (nc + nb)].reshape(b, s2, nb)
    boxes = output[:, s2 * (nc + nb):].reshape(b, s2, nb, co)

    is_obj = truth[..., 0] > 0                        # (B, s2)
    t_cls = truth[..., 1:1 + nc]                      # (B, s2, C)
    t_box = truth[..., 1 + nc:1 + nc + 4]             # (B, s2, 4)

    # ---- objectness: noobject everywhere (:80-86) --------------------
    d_obj = spec.noobject_scale * (0.0 - obj)

    # ---- class deltas at object cells (:96-102) ----------------------
    d_cls = jnp.where(is_obj[..., None],
                      spec.class_scale * (t_cls - cls), 0.0)

    # ---- best box by IoU (rmse fallback) (:104-131) -------------------
    tb = t_box.at[..., 0].divide(spec.side).at[..., 1].divide(spec.side)
    ob = boxes.at[..., 0].divide(spec.side).at[..., 1].divide(spec.side)
    if spec.sqrt:
        ob = ob.at[..., 2].set(jnp.square(ob[..., 2]))
        ob = ob.at[..., 3].set(jnp.square(ob[..., 3]))
    ious = box_iou(ob, tb[..., None, :])              # (B, s2, nb)
    rmse = jnp.sqrt(jnp.sum(jnp.square(ob - tb[..., None, :]), axis=-1))
    any_iou = jnp.any(ious > 0, axis=-1, keepdims=True)
    score = jnp.where(any_iou, ious, -rmse)
    best = jnp.argmax(score, axis=-1)                 # (B, s2)
    if spec.forced:
        small = (tb[..., 2] * tb[..., 3]) < 0.1
        best = jnp.where(small, 1, 0)

    onehot_b = jax.nn.one_hot(best, nb, dtype=output.dtype)  # (B,s2,nb)
    sel = onehot_b[..., None]                                # (B,s2,nb,1)

    best_obj = jnp.sum(obj * onehot_b, axis=-1)       # (B, s2)
    best_iou = jnp.sum(ious * onehot_b, axis=-1)
    if spec.rescore:
        d_obj_sel = spec.object_scale * (best_iou - best_obj)
    else:
        d_obj_sel = spec.object_scale * (1.0 - best_obj)
    d_obj = jnp.where(is_obj[..., None] & (onehot_b > 0),
                      d_obj_sel[..., None], d_obj)

    # ---- coord deltas at the selected box (:166-174) ------------------
    tgt = t_box
    if spec.sqrt:
        tgt = tgt.at[..., 2].set(jnp.sqrt(jnp.maximum(tgt[..., 2], 0)))
        tgt = tgt.at[..., 3].set(jnp.sqrt(jnp.maximum(tgt[..., 3], 0)))
    d_box = spec.coord_scale * (tgt[..., None, :] - boxes)
    d_box = jnp.where(is_obj[..., None, None] & (sel > 0), d_box, 0.0)

    delta = jnp.concatenate([
        d_cls.reshape(b, -1), d_obj.reshape(b, -1), d_box.reshape(b, -1)
    ], axis=1)
    return delta


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def detection_loss(output, truth, seen, spec):
    d = detection_delta(output, truth, seen, spec)
    return jnp.sum(jnp.square(d))     # *(l.cost) = mag(delta)^2 (:205)


def _det_fwd(output, truth, seen, spec):
    d = detection_delta(output, truth, seen, spec)
    return jnp.sum(jnp.square(d)), d


def _det_bwd(spec, d, g):
    return (-d * g, None, None)


detection_loss.defvjp(_det_fwd, _det_bwd)


__all__ = ["detection_delta", "detection_loss"]
