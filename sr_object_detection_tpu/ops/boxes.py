"""Box math, YOLOv2 region decode, and vectorized NMS.

TPU-native replacements for the scalar C loops in src_yolo2/box.c
(box_iou / do_nms_sort) and src_yolo2/region_layer.c
(get_region_box:73-85, get_region_boxes:328-379). Boxes are
(x, y, w, h) CENTER format, like the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def box_iou(a, b):
    """IoU of two (..., 4) center-format box arrays (box.c:33-58).

    Matches the reference's overlap(): intersection clamped at 0; union
    computed as areaA + areaB - inter.
    """
    ax1 = a[..., 0] - a[..., 2] / 2
    ax2 = a[..., 0] + a[..., 2] / 2
    ay1 = a[..., 1] - a[..., 3] / 2
    ay2 = a[..., 1] + a[..., 3] / 2
    bx1 = b[..., 0] - b[..., 2] / 2
    bx2 = b[..., 0] + b[..., 2] / 2
    by1 = b[..., 1] - b[..., 3] / 2
    by2 = b[..., 1] + b[..., 3] / 2
    iw = jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1)
    ih = jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1)
    inter = jnp.where((iw < 0) | (ih < 0), 0.0, iw * ih)
    union = a[..., 2] * a[..., 3] + b[..., 2] * b[..., 3] - inter
    return inter / union


def iou_matrix(boxes):
    """All-pairs IoU for (N, 4) center boxes -> (N, N)."""
    return box_iou(boxes[:, None, :], boxes[None, :, :])


def region_activate(raw, n_anchors: int, n_fields: int, *,
                    softmax: bool = False, tree_groups=None):
    """Apply the region layer's forward activations (region_layer.c:144-176).

    raw: NHWC (B, H, W, A*F) conv output, F = coords+classes+1.
    Returns (B, H, W, A, F) with logistic on the objectness slot and
    softmax (flat or grouped/tree) over the class slots. Box slots stay
    raw (decode applies logistic/exp later, exactly like the reference).
    """
    b, h, w, _ = raw.shape
    x = raw.reshape(b, h, w, n_anchors, n_fields)
    obj = jax.nn.sigmoid(x[..., 4:5])
    cls = x[..., 5:]
    if tree_groups is not None:
        cls = grouped_softmax(cls, tree_groups)
    elif softmax:
        cls = jax.nn.softmax(cls, axis=-1)
    return jnp.concatenate([x[..., :4], obj, cls], axis=-1)


def region_activate_aligned(raw, n_anchors: int, coords: int,
                            classes: int, block: int, *,
                            softmax: bool = False, tree_groups=None):
    """region_activate on the lane-ALIGNED head layout (see
    infer.engine.align_region_head): raw is (B, H, W, A*block) with
    per-anchor channels [coords+1 fields | pad->128 | classes | pad].
    The (.., A, block) reshape and the class slice land on 128-lane
    tile boundaries, so no relayout copies are emitted (the darknet-
    contiguous layout costs ~20% of a yolo9000 batch in copies).
    Output is identical to region_activate: (B, H, W, A, F) darknet
    field order."""
    b, h, w, _ = raw.shape
    x = raw.reshape(b, h, w, n_anchors, block)
    fields = x[..., :coords + 1]
    obj = jax.nn.sigmoid(fields[..., coords:coords + 1])
    cls = x[..., 128:128 + classes]
    if tree_groups is not None:
        cls = grouped_softmax(cls, tree_groups)
    elif softmax:
        cls = jax.nn.softmax(cls, axis=-1)
    return jnp.concatenate([fields[..., :coords], obj, cls], axis=-1)


def region_activate_split(raw, n_anchors: int, coords: int,
                          classes: int, block: int, *,
                          softmax: bool = False, tree_groups=None):
    """Pre-split region activation on the lane-ALIGNED head layout
    (infer.engine.align_region_head): raw is (B, H, W, A*block) with
    per-anchor channels [coords+1 fields | pad->128 | classes | pad].

    Unlike :func:`region_activate_aligned`, the darknet field order is
    NEVER reassembled — the engine emits (fields, cls) as separate
    tensors and the decode consumes them directly:

      fields: (B, H, W, A, coords+1) raw box slots + LOGISTIC obj
      cls:    (B, H, W, A, classes) softmaxed class probabilities

    Why: the flat output contract costs three full passes over the
    class tensor at the engine boundary ((A,F) reshape relayout + copy
    + field-order concatenate — profiled 3.4 ms of a 23 ms yolo9000-416
    batch); with the 128-aligned block both the reshape and the class
    slice are free. Parity: reassembling [fields[...,:coords], obj,
    cls] on the host reproduces region_activate exactly
    (tests/test_presplit.py)."""
    b, h, w, _ = raw.shape
    x = raw.reshape(b, h, w, n_anchors, block)    # free: block % 128 == 0
    fields = x[..., :coords + 1]
    obj = jax.nn.sigmoid(fields[..., coords:coords + 1])
    fields = jnp.concatenate([fields[..., :coords], obj], axis=-1)
    cls = x[..., 128:128 + classes]
    if tree_groups is not None:
        cls = grouped_softmax(cls, tree_groups)
    elif softmax:
        cls = jax.nn.softmax(cls, axis=-1)
    return fields, cls


_FLAT_GID_CACHE: dict = {}


def _flat_head_gids(n_anchors: int, coords: int, classes: int,
                    block: int, base_gids):
    """Extended group ids + additive mask for the FLAT aligned head
    row (A*block lanes): each anchor contributes [fields+pad | classes
    | tail-pad]; junk lanes get their own softmax groups (masked to a
    large negative, they exp to ~0 and normalize among themselves) so
    the class groups stay contiguous-monotone-gapless and the banded
    matmul lowering applies unchanged."""
    key = (n_anchors, coords, classes, block,
           None if base_gids is None else np.asarray(base_gids).tobytes())
    if key in _FLAT_GID_CACHE:
        return _FLAT_GID_CACHE[key]
    g0 = (np.zeros(classes, np.int64) if base_gids is None
          else np.asarray(base_gids, np.int64))
    ng = int(g0.max()) + 1
    total = n_anchors * block
    ext = np.zeros(total, np.int64)
    mask = np.full(total, -1e9, np.float32)
    nxt = 0
    tail = block - 128 - classes
    for a in range(n_anchors):
        o = a * block
        ext[o:o + 128] = nxt
        nxt += 1
        ext[o + 128:o + 128 + classes] = nxt + g0
        mask[o + 128:o + 128 + classes] = 0.0
        nxt += ng
        if tail > 0:
            ext[o + 128 + classes:o + block] = nxt
            nxt += 1
    _FLAT_GID_CACHE[key] = (ext, mask)
    return ext, mask


def region_activate_split_flat(raw, n_anchors: int, coords: int,
                               classes: int, block: int, *,
                               softmax: bool = False, tree_groups=None):
    """Pre-split region activation that NEVER forms the 5-D
    (B,H,W,A,block) view: the class tensor stays (B,H,W,A*block) in
    the head conv's own layout.

    Why: with A=3 anchors the 5-D view puts A in the sublane dim, and
    XLA retiles T(8,128)->T(4,128) around it — profiled as two pure
    relayout copies totalling 7.5 ms of a 52 ms yolo9000-416 B=128
    batch (14%). Keeping the row flat keeps one tiling end-to-end.

    Contract:
      fields:   (B, H, W, A, coords+1) raw box slots + LOGISTIC obj
                (tiny tensor — built from per-anchor lane slices)
      cls_flat: (B, H, W, A*block); softmaxed class probs at
                [a*block+128 : a*block+128+classes] for each anchor a;
                every other lane is junk (masked logits that softmax
                among themselves) and MUST be sliced away by the
                consumer.

    Exactness: softmax within a group is invariant to the shared
    per-row offset, so using the row max over the WHOLE flat row
    instead of the per-anchor max changes nothing mathematically
    (same identity as _grouped_softmax_matmul); pinned against
    region_activate_split in tests/test_presplit.py."""
    f = coords + 1
    slots = [raw[..., a * block:a * block + f]
             for a in range(n_anchors)]
    fields = jnp.stack(slots, axis=3)
    obj = jax.nn.sigmoid(fields[..., coords:coords + 1])
    fields = jnp.concatenate([fields[..., :coords], obj], axis=-1)
    if tree_groups is None and not softmax:
        return fields, raw
    base = tree_groups if tree_groups is not None else None
    ext, mask = _flat_head_gids(n_anchors, coords, classes, block, base)
    x_m = raw + jnp.asarray(mask, raw.dtype)
    return fields, grouped_softmax(x_m, ext)


def grouped_softmax(logits, group_ids):
    """Segmented softmax over the last axis (softmax_tree semantics).

    ``group_ids``: int array (C,) mapping each class to its sibling
    group (tree.c:53-103). Ragged 9k-tree groups stay vectorized
    instead of running 845k tiny softmaxes.
    """
    gids = np.asarray(jax.core.concrete_or_error(
        None, group_ids, "grouped_softmax group_ids must be static"))
    # WordTree groups are contiguous monotone class runs (sibling runs,
    # tree.c:63-91) — that makes the MXU formulation valid and it wins
    # the v5e A/B at yolo9000 shape (16224x9418, 2429 groups):
    # matmul+take 10.5ms vs segment-op scatter 24.4ms vs padded-bucket
    # gather 15.0ms. Non-contiguous ids (not produced by tree files)
    # fall back to the scatter lowering.
    d = np.diff(gids)
    if len(gids) and gids[0] == 0 and np.all((d >= 0) & (d <= 1)):
        # contiguous AND gapless: an empty group would make its
        # reciprocal inf and NaN the whole chunk in the band matmul
        return _grouped_softmax_matmul(logits, gids)
    return _grouped_softmax_scatter(logits, gids)


_SOFTMAX_MEMBER_CACHE: dict = {}


def _grouped_softmax_matmul(logits, gids: np.ndarray):
    """Segmented softmax via ONE dense matmul on the MXU.

    Key identity: a softmax within each group only needs a shared
    per-LOCATION offset for stability — probs = exp(x-c)/sum_group
    exp(x-c) is exact for any c — so the per-group segment_max
    disappears in favor of a cheap per-row max, and the per-group sums
    become exp(x) @ M with M the static {0,1} class->group membership
    matrix: dense MXU work instead of a serialized scatter. The -80
    clamp keeps a group whose members all sit far below the row max
    from flushing to 0/0 (its probs degrade toward uniform exactly
    where objectness gating discards them anyway; unreachable in f32
    parity tests)."""
    c = len(gids)
    g = int(gids.max()) + 1
    chunk = 1024
    key = (gids.tobytes(), c, chunk)
    if key not in _SOFTMAX_MEMBER_CACHE:
        # monotone group ids make the membership matrix a STAIRCASE
        # band: classes [a,b) only touch groups [gids[a], gids[b-1]] —
        # chunking the class axis turns one (C x G) matmul into ~C/1024
        # narrow band matmuls, ~8x fewer MACs at the 9k-tree density
        blocks = []
        for a in range(0, c, chunk):
            b = min(a + chunk, c)
            lo, hi = int(gids[a]), int(gids[b - 1]) + 1
            m = np.zeros((b - a, hi - lo), np.float32)
            m[np.arange(b - a), gids[a:b] - lo] = 1.0
            blocks.append((a, b, lo, hi, m))
        _SOFTMAX_MEMBER_CACHE[key] = blocks
    blocks = _SOFTMAX_MEMBER_CACHE[key]

    vmax = jnp.max(logits, axis=-1, keepdims=True)
    z = jnp.maximum((logits - vmax).astype(jnp.float32), -80.0)
    e32 = jnp.exp(z)
    e = e32.astype(logits.dtype)
    lead = logits.shape[:-1]
    # band matmuls -> per-group sums (boundary-spanning groups get
    # contributions from both adjacent chunks; sums just add)
    gsum = jnp.zeros((*lead, g), jnp.float32)
    for a, b, lo, hi, m in blocks:
        part = jnp.dot(e[..., a:b], jnp.asarray(m, logits.dtype),
                       preferred_element_type=jnp.float32)
        gsum = gsum.at[..., lo:hi].add(part)
    # expand the per-group reciprocal back to classes with the SAME
    # band matmuls transposed: a lane-dim gather here lowers to ~3x the
    # matmul's cost in transposes/copies on TPU (profiled), while
    # matmuls fuse into the surrounding elementwise work
    inv = (1.0 / gsum).astype(logits.dtype)
    parts = [jnp.dot(inv[..., lo:hi], jnp.asarray(m.T, logits.dtype),
                     preferred_element_type=jnp.float32)
             for a, b, lo, hi, m in blocks]
    return (e32 * jnp.concatenate(parts, axis=-1)).astype(logits.dtype)


def _softmax_buckets(gids: np.ndarray, buckets=(4, 16, 64, 256)):
    """Static gather tables for bucketed padded group softmax.

    Returns (tables, inv_perm, n_singles) where tables is a list of
    (Gb, Sb) class-index arrays (index C == the -inf pad slot) and
    inv_perm maps each class to its position in
    [ones(singles), bucket0_flat, bucket1_flat, ...].
    """
    c = len(gids)
    groups: list[list[int]] = []
    prev = None
    for i, g in enumerate(gids):
        if g != prev:
            groups.append([])
            prev = g
        groups[-1].append(i)

    singles = [g[0] for g in groups if len(g) == 1]
    tables = []
    placements = np.zeros(c, np.int64)
    for j, cls in enumerate(singles):
        placements[cls] = j
    offset = len(singles)
    for cap in buckets:
        lo = 1 if cap == buckets[0] else buckets[buckets.index(cap) - 1]
        sel = [g for g in groups if lo < len(g) <= cap]
        if not sel:
            continue
        tbl = np.full((len(sel), cap), c, np.int64)   # pad slot
        for gi, g in enumerate(sel):
            tbl[gi, :len(g)] = g
            for k, cls in enumerate(g):
                placements[cls] = offset + gi * cap + k
        tables.append(tbl)
        offset += tbl.size
    return tables, placements, len(singles)


_SOFTMAX_TABLE_CACHE: dict = {}


def _grouped_softmax_bucketed(logits, gids: np.ndarray):
    """Padded-bucket segmented softmax: groups gathered (statically)
    into (Gb, Sb) tiles with -inf padding, plain softmax per tile, and
    one static inverse permutation to reassemble. 1.8x faster than the
    segment-op version in isolation, but slower inside the full
    yolo9000 graph (see grouped_softmax) — kept as an alternative.
    Singleton groups (751 of the 9k tree's 2429) are the constant 1."""
    key = (gids.tobytes(), len(gids))
    if key not in _SOFTMAX_TABLE_CACHE:
        _SOFTMAX_TABLE_CACHE[key] = _softmax_buckets(gids)
    tables, inv_perm, n_singles = _SOFTMAX_TABLE_CACHE[key]

    lead = logits.shape[:-1]
    neg = jnp.full((*lead, 1), -jnp.inf, logits.dtype)
    v_ext = jnp.concatenate([logits, neg], axis=-1)

    parts = [jnp.ones((*lead, n_singles), logits.dtype)]
    for tbl in tables:
        g = v_ext[..., jnp.asarray(tbl)]              # (.., Gb, Sb)
        sm = jax.nn.softmax(g, axis=-1)
        parts.append(sm.reshape(*lead, tbl.size))
    packed = jnp.concatenate(parts, axis=-1)
    return packed[..., jnp.asarray(inv_perm)]


def _grouped_softmax_scatter(logits, gids):
    """Fallback for non-contiguous group ids (not produced by WordTree
    files; kept for API generality)."""
    num_groups = int(gids.max()) + 1
    group_ids = jnp.asarray(gids)
    lead = logits.shape[:-1]
    flat = logits.reshape(-1, logits.shape[-1])

    def one(v):
        gmax = jax.ops.segment_max(v, group_ids, num_segments=num_groups)
        e = jnp.exp(v - gmax[group_ids])
        gsum = jax.ops.segment_sum(e, group_ids, num_segments=num_groups)
        return e / gsum[group_ids]

    out = jax.vmap(one)(flat)
    return out.reshape(*lead, logits.shape[-1])


def decode_region_boxes(acts, anchors, *, img_w, img_h):
    """Vectorized get_region_box (region_layer.c:73-85, DOABS=1).

    acts: (B, H, W, A, F) activated region output.
    anchors: (A, 2) biases.
    Returns boxes (B, H, W, A, 4) scaled by (img_w, img_h) like
    get_region_boxes:342-345 (relative coords * requested image size).
    """
    b, h, w, a, _ = acts.shape
    col = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)[None, :, :, None]
    row = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)[None, :, :, None]
    anchors = jnp.asarray(anchors, jnp.float32).reshape(1, 1, 1, a, 2)
    bx = (col + jax.nn.sigmoid(acts[..., 0])) / w * img_w
    by = (row + jax.nn.sigmoid(acts[..., 1])) / h * img_h
    bw = jnp.exp(acts[..., 2]) * anchors[..., 0] / w * img_w
    bh = jnp.exp(acts[..., 3]) * anchors[..., 1] / h * img_h
    return jnp.stack([bx, by, bw, bh], axis=-1)


def region_class_probs(acts, *, thresh: float):
    """probs[box, cls] = objectness * class_prob, zeroed below thresh
    (get_region_boxes:368-373, the flat-softmax path).

    acts: (B, H, W, A, F). Returns (B, H*W*A, C).
    """
    b = acts.shape[0]
    obj = acts[..., 4:5]
    probs = obj * acts[..., 5:]
    probs = jnp.where(probs > thresh, probs, 0.0)
    return probs.reshape(b, -1, probs.shape[-1])


def nms_sort(boxes, probs, iou_thresh: float):
    """Vectorized per-class greedy NMS (box.c do_nms_sort:249-277).

    boxes: (N, 4); probs: (N, C). For each class: boxes sorted by prob
    desc; a box's prob is zeroed when a higher-scoring *surviving* box
    of that class overlaps it with IoU > thresh. Returns new probs.

    Implementation: one IoU matrix + a lax.scan over rank order per
    class (the suppression recurrence is inherently sequential in rank,
    but C classes run in a single vectorized pass and N-rank scan).
    """
    n, c = probs.shape
    ious = iou_matrix(boxes)                      # (N, N)

    order = jnp.argsort(-probs, axis=0)           # (N, C) box idx by rank
    ranked_probs = jnp.take_along_axis(probs, order, axis=0)
    # iou between rank r and rank q per class: ious[order[r,c], order[q,c]]
    # scan over ranks: keep[r] = prob>0 and no earlier surviving box
    # with iou > thresh.
    def body(carry, r):
        suppressed = carry                        # (N, C) per-rank flags
        alive = (ranked_probs[r] > 0) & ~suppressed[r]          # (C,)
        # iou_r[q, c] = iou(order[r, c], order[q, c]) — boxes at rank q
        iou_r = ious[order[r][None, :], order]    # (N, C)
        kill = alive[None, :] & (iou_r > iou_thresh)
        ranks = jnp.arange(n)[:, None]
        kill = kill & (ranks > r)
        return suppressed | kill, alive

    suppressed0 = jnp.zeros((n, c), dtype=bool)
    suppressed, _ = jax.lax.scan(body, suppressed0, jnp.arange(n))
    kept = jnp.where(suppressed, 0.0, ranked_probs)
    # scatter back to original order
    out = jnp.zeros_like(probs)
    out = out.at[order, jnp.arange(c)[None, :]].set(kept)
    return out


def nms_sort_exact(boxes, probs, iou_thresh: float):
    """Exact do_nms_sort (box.c:249-277) with O(N^2 + N*C) memory: one
    shared IoU matrix, classes processed SEQUENTIALLY (lax.map). The
    full-k variant of nms_sort_topk would materialize a (C, N, N) IoU
    tensor — ~9.7 GB for yolo9000's 9418 classes — so offline exact
    paths (detector valid) use this instead."""
    n, c = probs.shape
    iou = box_iou(boxes[:, None, :], boxes[None, :, :])   # (N, N) once

    def per_class(p):
        order = jnp.argsort(-p)
        p_o = p[order]
        iou_o = iou[order][:, order]

        def body(suppressed, r):
            alive = (p_o[r] > 0) & ~suppressed[r]
            kill = alive & (iou_o[r] > iou_thresh) & (jnp.arange(n) > r)
            return suppressed | kill, None

        suppressed, _ = jax.lax.scan(body, jnp.zeros(n, bool),
                                     jnp.arange(n))
        kept = jnp.where(suppressed, 0.0, p_o)
        return jnp.zeros_like(p).at[order].set(kept)

    return jax.lax.map(per_class, probs.T).T


def nms_sort_topk(boxes, probs, iou_thresh: float, k: int = 128):
    """NMS over only the top-k candidates per class — the production
    path. Identical result to :func:`nms_sort` whenever <=k boxes per
    class have nonzero prob (true for real thresholds: 13*13*5=845
    candidates but a handful above 0.005); O(k^2 * C) instead of O(N^2).
    """
    n, c = probs.shape
    k = min(k, n)
    top_p, top_i = jax.lax.top_k(probs.T, k)      # (C, k)
    top_boxes = boxes[top_i]                      # (C, k, 4)
    ious = box_iou(top_boxes[:, :, None, :], top_boxes[:, None, :, :])

    def per_class(p, iou):
        def body(suppressed, r):
            alive = (p[r] > 0) & ~suppressed[r]
            kill = alive & (iou[r] > iou_thresh) & (jnp.arange(k) > r)
            return suppressed | kill, None
        suppressed, _ = jax.lax.scan(body, jnp.zeros(k, bool), jnp.arange(k))
        return jnp.where(suppressed, 0.0, p)

    kept = jax.vmap(per_class)(top_p, ious)       # (C, k)
    out = jnp.zeros_like(probs)
    out = out.at[top_i, jnp.arange(c)[:, None]].set(kept)
    return out


def hierarchy_multiply(probs, parents):
    """hierarchy_predictions (tree.c:37-51): child *= parent, in index
    order (parents always precede children in 9k.tree). Sequential
    dependency resolved by multiplying along each node's root path —
    equivalent because prob[j] becomes prod(path to root).

    probs: (..., C); parents: (C,) int, -1 for roots.
    Returns path-product probabilities.
    """
    parents = np.asarray(parents)
    c = parents.shape[0]
    # Precompute ancestor chains as a (C, depth) gather table (static).
    depth = 1
    chain = [np.arange(c)]
    cur = parents.copy()
    while (cur >= 0).any():
        chain.append(np.where(cur >= 0, cur, chain[-1]))
        nxt = np.where(cur >= 0, parents[np.maximum(cur, 0)], -1)
        cur = nxt
        depth += 1
    chain = np.stack(chain, axis=1)               # (C, depth)
    gathered = probs[..., chain]                  # (..., C, depth)
    # mask duplicate trailing entries (where the walk stalled at a root):
    # chain repeats the node itself once parent < 0; build a one-hot-ish
    # multiplicity fix by only multiplying strictly-new ancestors.
    valid = np.ones_like(chain, dtype=bool)
    valid[:, 1:] = chain[:, 1:] != chain[:, :-1]
    gathered = jnp.where(jnp.asarray(valid), gathered, 1.0)
    return jnp.prod(gathered, axis=-1)


__all__ = [
    "box_iou", "iou_matrix", "region_activate", "grouped_softmax",
    "decode_region_boxes", "region_class_probs",
    "nms_sort", "nms_sort_topk", "nms_sort_exact", "hierarchy_multiply",
]
