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
from ..ops.boxes import box_iou, grouped_softmax


class TreeInfo:
    """Static per-class tables for the hierarchical (9k) class delta.

    delta_region_class with a tree (region_layer.c:108-124) walks from
    the target class to the root, zeroing every sibling group along the
    path and setting +1 at each path node. We precompute:
      * chain (C, D): ancestor chain per class (padded with self);
      * path_groups (C, D): group id of each chain entry (-1 padding);
    so the per-truth masks become vectorized gathers/compares.
    """

    def __init__(self, tree, *, max_depth: int = 64):
        parent = np.asarray(tree.parent)
        group = np.asarray(tree.group)
        c = parent.shape[0]
        # Out-of-range / forward / self parent pointers occur in the
        # wild: the reference repo's shipped 9k.tree is NUL-truncated
        # (8714 of 9418 lines survive, leaving parents that point past
        # the end or at themselves). The C reference would spin forever
        # in delta_region_class's parent walk; we cut such edges and
        # cap the walk depth (real WordTree depth is ~20).
        idx = np.arange(c)
        parent = np.where((parent >= idx) | (parent < -1), -1, parent)
        chain = [idx]
        cur = parent.copy()
        while (cur >= 0).any() and len(chain) < max_depth:
            chain.append(np.where(cur >= 0, cur, chain[-1]))
            cur = np.where(cur >= 0, parent[np.maximum(cur, 0)], -1)
        self.chain = np.stack(chain, axis=1)              # (C, D)
        valid = np.ones_like(self.chain, dtype=bool)
        valid[:, 1:] = self.chain[:, 1:] != self.chain[:, :-1]
        self.chain_valid = valid
        self.path_groups = np.where(valid, group[self.chain], -1)
        self.group = group
        self.parent = parent

    def class_delta_masks(self, tcls):
        """tcls: (...,) int class ids. Returns (pos, grp) bool masks of
        shape (..., C): pos = path nodes (+1 targets), grp = all classes
        in any sibling group along the path (delta targets)."""
        chain = jnp.asarray(self.chain)
        valid = jnp.asarray(self.chain_valid)
        pgroups = jnp.asarray(self.path_groups)
        group = jnp.asarray(self.group)
        c = chain.shape[0]
        path = chain[tcls]                                  # (..., D)
        pvalid = valid[tcls]
        pos = _scatter_path(c, path, pvalid)
        pg = pgroups[tcls]                                  # (..., D)
        grp = jnp.any(group[None, :] == pg[..., :, None], axis=-2)
        return pos, grp


def _scatter_path(c, path, valid):
    """Build (..., C) bool with True at path[d] where valid[d]."""
    onehots = jax.nn.one_hot(path, c, dtype=jnp.bool_)      # (..., D, C)
    onehots = jnp.logical_and(onehots, valid[..., None])
    return jnp.any(onehots, axis=-2)


def _truth_mask(truth):
    """Truths are consumed until the first x==0 (region_layer.c:224
    'if(!truth.x) break') — not just nonzero entries."""
    nonzero = truth[..., 0] != 0.0
    return jnp.cumprod(nonzero.astype(jnp.int32), axis=-1).astype(bool)


def region_delta(raw_flat, truth, seen, spec: RegionSpec, *,
                 tree: "TreeInfo | None" = None, class_map=None):
    """Compute (activated_output_flat, delta_flat, stats).

    raw_flat: (B, H*W*A*F) region-layer input in darknet location-major
    order (== NHWC raster of the preceding conv). delta has the same
    layout; gradient wrt raw input is -delta.

    tree/class_map enable the YOLO9000 paths: grouped (WordTree) class
    softmax, hierarchical class deltas, truth-id remapping through the
    map file, and classification-only sentinel truths (x>100000 —
    region_layer.c:188-213 with data.c fill_hierarchy's 999999 markers).
    """
    b = raw_flat.shape[0]
    h, w, a, c = spec.h, spec.w, spec.n, spec.classes
    f = spec.coords + c + 1
    raw = raw_flat.reshape(b, h, w, a, f)

    anchors = jnp.asarray(np.asarray(spec.anchors, np.float32).reshape(a, 2))

    # ---- forward activations (region_layer.c:144-176) ----------------
    sig_xy = jax.nn.sigmoid(raw[..., 0:2])
    obj = jax.nn.sigmoid(raw[..., 4])
    if tree is not None:
        cls_prob = grouped_softmax(raw[..., 5:], tree.group)
    elif spec.softmax:
        cls_prob = jax.nn.softmax(raw[..., 5:], axis=-1)
    else:
        cls_prob = raw[..., 5:]

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

    # ---- stage 1c: classfix>0 class delta at high-IoU locations ------
    # (region_layer.c:235-240): where best_iou > thresh, push the class
    # toward the best-IoU truth's class with scale class_scale*(obj for
    # classfix==2, else 1). Note: the RAW truth class — the reference
    # does NOT remap through l.map here, unlike the stage-2 delta.
    if spec.classfix > 0:
        best_t = jnp.argmax(ious, axis=-1)                  # (B,H,W,A)
        bc = jnp.take_along_axis(
            jnp.broadcast_to(tcls[:, None, None, None, :], ious.shape),
            best_t[..., None], axis=-1)[..., 0]             # (B,H,W,A)
        fix_scale = spec.class_scale * (
            obj if spec.classfix == 2 else jnp.ones_like(obj))
        if tree is not None:
            posf, grpf = tree.class_delta_masks(bc)         # (B,H,W,A,C)
            d_fix = jnp.where(
                grpf, fix_scale[..., None] *
                (posf.astype(cls_prob.dtype) - cls_prob), 0.0)
        else:
            onehot_f = jax.nn.one_hot(bc, c, dtype=cls_prob.dtype)
            d_fix = fix_scale[..., None] * (onehot_f - cls_prob)
        d_cls = jnp.where((best_iou > spec.thresh)[..., None], d_fix,
                          d_cls)

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

    # class delta at assigned location (delta_region_class:108-131)
    if class_map is not None:
        tcls = jnp.asarray(np.asarray(class_map, np.int32))[tcls]
    a_cls_prob = cls_prob[bsel, tj, ti, best_n]             # (B,30,C)
    if tree is not None:
        pos, grp = tree.class_delta_masks(tcls)             # (B,30,C)
        d_cls_assigned = jnp.where(
            grp, spec.class_scale * (pos.astype(a_cls_prob.dtype)
                                     - a_cls_prob), 0.0)
    else:
        onehot = jax.nn.one_hot(tcls, c, dtype=a_cls_prob.dtype)
        d_cls_assigned = spec.class_scale * (onehot - a_cls_prob)

    # ---- scatter assigned deltas (sequential overwrite in reference;
    #      duplicate cells are rare and last-wins either way). Masked
    #      (padding) truths are routed to an out-of-bounds row and
    #      DROPPED — scattering a gathered pre-update value instead
    #      would let a padding row overwrite a real truth assigned to
    #      (0,0,anchor0), which the reference's early-break loop
    #      (region_layer.c:224) never does. ---------------------------
    mask = tmask
    tjv = jnp.where(mask, tj, h)          # h is out of bounds -> drop
    tiv, bnv = ti, best_n

    def scatter(base, upd):
        """base (B,H,W,A,K); upd (B,30,K) masked scatter-set."""
        return base.at[bsel, tjv, tiv, bnv].set(upd, mode="drop")

    d_coord = scatter(d_coord, d_assigned)
    d_obj = scatter(d_obj[..., None], d_obj_assigned[..., None])[..., 0]
    if tree is not None:
        # delta_region_class's tree variant (region_layer.c:108-124)
        # writes ONLY the sibling groups along the truth's path —
        # classes outside those groups keep whatever stage 1 wrote
        # (e.g. classfix>0 deltas). Merge with the current rows so the
        # full-row scatter doesn't zero them. (grp comes from
        # class_delta_masks above; gather-before-scatter means a
        # duplicate-cell second truth merges against pre-stage-2
        # values — the reference's sequential loop would see the first
        # truth's writes, a negligible duplicate-cell edge.)
        cur_rows = d_cls[bsel, tj, ti, best_n]
        d_cls_assigned = jnp.where(grp, d_cls_assigned, cur_rows)
    d_cls = scatter(d_cls, d_cls_assigned)

    # ---- classification-only sentinel truths (tree co-training) ------
    # region_layer.c:188-213: a truth with x,y > 100000 marks the batch
    # item as classification-only: find the location maximizing
    # objectness * hierarchy path probability of the class, apply ONLY
    # the class delta there (class id NOT remapped), skip all box/obj
    # deltas for the item.
    if tree is not None:
        raw_tcls = truth[..., 4].astype(jnp.int32)
        sentinel = (tboxes[..., 0] > 100000) & (tboxes[..., 1] > 100000) \
            & tmask
        has_sent = jnp.any(sentinel, axis=1)                 # (B,)
        first = jnp.argmax(sentinel, axis=1)                 # (B,)
        s_cls = raw_tcls[jnp.arange(b), first]               # (B,)

        chain = jnp.asarray(tree.chain)
        valid = jnp.asarray(tree.chain_valid)
        path = chain[s_cls]                                  # (B, D)
        pvalid = valid[s_cls]
        gathered = jnp.take_along_axis(
            cls_prob.reshape(b, -1, c)[:, :, :],
            path[:, None, :], axis=2)                        # (B, HWA, D)
        path_prob = jnp.prod(jnp.where(pvalid[:, None, :], gathered, 1.0),
                             axis=-1)                        # (B, HWA)
        score = obj.reshape(b, -1) * path_prob
        best_loc = jnp.argmax(score, axis=1)                 # (B,)

        pos_s, grp_s = tree.class_delta_masks(s_cls)         # (B, C)
        cls_at = jnp.take_along_axis(
            cls_prob.reshape(b, -1, c), best_loc[:, None, None]
            .repeat(c, axis=2), axis=1)[:, 0, :]             # (B, C)
        d_s = jnp.where(grp_s, spec.class_scale *
                        (pos_s.astype(cls_at.dtype) - cls_at), 0.0)
        loc_onehot = jax.nn.one_hot(best_loc, h * w * a,
                                    dtype=d_s.dtype)         # (B, HWA)
        d_cls_sent = (loc_onehot[..., None] * d_s[:, None, :]
                      ).reshape(b, h, w, a, c)

        sel = has_sent[:, None, None, None]
        d_coord = jnp.where(sel[..., None], 0.0, d_coord)
        d_obj = jnp.where(sel, 0.0, d_obj)
        d_cls = jnp.where(sel[..., None], d_cls_sent, d_cls)

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


def make_region_loss(spec: RegionSpec, tree=None, class_map=None):
    """Build loss(raw_flat, truth, seen) -> cost with the darknet-exact
    gradient (-delta). tree: io.tree.WordTree or TreeInfo."""
    tinfo = None
    if tree is not None:
        tinfo = tree if isinstance(tree, TreeInfo) else TreeInfo(tree)

    @jax.custom_vjp
    def loss(raw_flat, truth, seen):
        _, delta, _ = region_delta(raw_flat, truth, seen, spec,
                                   tree=tinfo, class_map=class_map)
        return jnp.sum(jnp.square(delta))

    def fwd(raw_flat, truth, seen):
        _, delta, _ = region_delta(raw_flat, truth, seen, spec,
                                   tree=tinfo, class_map=class_map)
        return jnp.sum(jnp.square(delta)), delta

    def bwd(delta, g):
        # darknet semantics: delta is the NEGATIVE gradient wrt the
        # region input (backward_region_layer axpys delta upstream);
        # g scales for composition with outer fns.
        return (-delta * g, None, None)

    loss.defvjp(fwd, bwd)

    def loss_with_stats(raw_flat, truth, seen):
        cost = loss(raw_flat, truth, seen)
        _, _, stats = region_delta(jax.lax.stop_gradient(raw_flat), truth,
                                   seen, spec, tree=tinfo,
                                   class_map=class_map)
        return cost, stats

    return loss, loss_with_stats


# plain-softmax convenience wrappers (kept for existing callers)
@partial(jax.custom_vjp, nondiff_argnums=(3,))
def region_loss(raw_flat, truth, seen, spec):
    _, delta, _ = region_delta(raw_flat, truth, seen, spec)
    return jnp.sum(jnp.square(delta))


def _region_loss_fwd(raw_flat, truth, seen, spec):
    _, delta, _ = region_delta(raw_flat, truth, seen, spec)
    return jnp.sum(jnp.square(delta)), delta


def _region_loss_bwd(spec, delta, g):
    return (-delta * g, None, None)


region_loss.defvjp(_region_loss_fwd, _region_loss_bwd)


def region_loss_with_stats(raw_flat, truth, seen, spec):
    """(cost, stats) pair; cost has the custom exact gradient."""
    cost = region_loss(raw_flat, truth, seen, spec)
    _, _, stats = region_delta(jax.lax.stop_gradient(raw_flat), truth,
                               seen, spec)
    return cost, stats


__all__ = ["region_delta", "region_loss", "region_loss_with_stats",
           "make_region_loss", "TreeInfo"]
