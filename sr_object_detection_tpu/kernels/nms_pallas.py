"""Pallas TPU kernel: per-class greedy NMS.

Replaces the scalar qsort+suppress loops of the reference
(src_yolo2/box.c do_nms_sort:249-277). The XLA version
(ops/boxes.nms_sort_topk) lowers the rank recurrence to a lax.scan of k
tiny steps — correct but dispatch-heavy. This kernel runs one grid
program per class with the full (k, k) IoU matrix resident in VMEM and
the suppression recurrence as an in-register fori_loop: zero HBM
traffic between steps.

Candidates arrive pre-sorted by score descending (host side uses
jax.lax.top_k, same as the XLA path), boxes as four (C, k) planes so
every block is lane-aligned.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


CLASS_BLOCK = 8   # classes per grid program (sublane alignment)


def _nms_kernel(thresh_ref, x_ref, y_ref, w_ref, h_ref, p_ref, out_ref,
                iou_s, sup_s):
    x = x_ref[:]                       # (CB, k): CLASS_BLOCK classes
    y = y_ref[:]
    w = w_ref[:]
    h = h_ref[:]
    p = p_ref[:]
    cb, k = x.shape
    thresh = thresh_ref[0]

    # pairwise IoU per class: (CB, k, k) built once into VMEM scratch
    x1 = (x - w * 0.5)[:, :, None]
    x2 = (x + w * 0.5)[:, :, None]
    y1 = (y - h * 0.5)[:, :, None]
    y2 = (y + h * 0.5)[:, :, None]
    iw = jnp.minimum(x2, x2.transpose(0, 2, 1)) - \
        jnp.maximum(x1, x1.transpose(0, 2, 1))
    ih = jnp.minimum(y2, y2.transpose(0, 2, 1)) - \
        jnp.maximum(y1, y1.transpose(0, 2, 1))
    inter = jnp.where((iw < 0) | (ih < 0), 0.0, iw * ih)
    area = (w * h)[:, :, None]
    union = area + area.transpose(0, 2, 1) - inter
    iou_s[:] = inter / union
    sup_s[:] = jnp.zeros((cb, k), jnp.float32)

    ranks = jax.lax.broadcasted_iota(jnp.int32, (cb, k), 1)

    def body(r, _):
        # rank-r box per class survives if scored and unsuppressed; a
        # survivor kills every lower-ranked overlap of its class.
        # Lane-dim dynamic slicing isn't 128-aligned, so rank selection
        # uses iota masks + reductions (pure VPU ops).
        rmask = (ranks == r).astype(jnp.float32)                  # (CB,k)
        pr = jnp.sum(p * rmask, axis=1, keepdims=True)            # (CB,1)
        sr = jnp.sum(sup_s[:] * rmask, axis=1, keepdims=True)
        alive = (pr > 0) & (sr == 0)
        rmask3 = rmask[:, :, None]                                # f32 dim
        row = jnp.sum(iou_s[:] * rmask3, axis=1)                  # (CB,k)
        kill = alive & (row > thresh) & (ranks > r)
        sup_s[:] = jnp.where(kill, 1.0, sup_s[:])
        return 0

    jax.lax.fori_loop(0, k, body, 0)
    out_ref[:] = jnp.where(sup_s[:] > 0, 0.0, p)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nms_per_class_pallas(boxes_ckx4, probs_ck, thresh, *,
                         interpret: bool = False):
    """boxes_ckx4: (C, k, 4) rank-sorted candidates per class;
    probs_ck: (C, k) sorted probs. Returns suppressed probs (C, k)."""
    c, k, _ = boxes_ckx4.shape
    # pad classes to the block size and k to the lane width
    cb = CLASS_BLOCK
    cp = (c + cb - 1) // cb * cb
    kp = (k + 127) // 128 * 128
    pad = ((0, cp - c), (0, kp - k))
    planes = [jnp.pad(boxes_ckx4[..., i], pad) for i in range(4)]
    probs_p = jnp.pad(probs_ck.astype(jnp.float32), pad)
    thresh_arr = jnp.full((1,), thresh, jnp.float32)

    spec = pl.BlockSpec((cb, kp), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _nms_kernel,
        grid=(cp // cb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [spec] * 5,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((cp, kp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((cb, kp, kp), jnp.float32),   # iou matrix
            pltpu.VMEM((cb, kp), jnp.float32),       # suppression mask
        ],
        interpret=interpret,
    )(thresh_arr, *planes, probs_p)
    return out[:c, :k]


def nms_sort_topk_pallas(boxes, probs, iou_thresh: float, k: int = 128,
                         *, interpret: bool = False):
    """Drop-in for ops.boxes.nms_sort_topk with the Pallas core."""
    n, c = probs.shape
    k = min(k, n)
    top_p, top_i = jax.lax.top_k(probs.T, k)          # (C, k)
    top_boxes = boxes[top_i]                          # (C, k, 4)
    kept = nms_per_class_pallas(top_boxes, top_p, iou_thresh,
                                interpret=interpret)
    out = jnp.zeros_like(probs)
    return out.at[top_i, jnp.arange(c)[:, None]].set(kept)


__all__ = ["nms_per_class_pallas", "nms_sort_topk_pallas"]
