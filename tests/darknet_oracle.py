"""Pure-numpy oracles implementing the reference C semantics verbatim.

These are scalar-loop transcriptions of the darknet CPU ops (cited per
function) used ONLY as test oracles for the vectorized TPU ops. They are
deliberately slow and literal.
"""

import numpy as np


def reorg_cpu(x_flat, w, h, c, stride, forward):
    """blas.c:8-29, single batch."""
    out = np.zeros_like(x_flat)
    out_c = c // (stride * stride)
    for k in range(c):
        for j in range(h):
            for i in range(w):
                in_index = i + w * (j + h * k)
                c2 = k % out_c
                offset = k // out_c
                w2 = i * stride + offset % stride
                h2 = j * stride + offset // stride
                out_index = w2 + w * stride * (h2 + h * stride * c2)
                if forward:
                    out[out_index] = x_flat[in_index]
                else:
                    out[in_index] = x_flat[out_index]
    return out


def forward_maxpool(x_chw, size, stride, pad):
    """maxpool_layer.c:79-114, single batch; x_chw: (c, h, w)."""
    c, h, w = x_chw.shape
    out_h = (h + 2 * pad) // stride
    out_w = (w + 2 * pad) // stride
    out = np.zeros((c, out_h, out_w), np.float32)
    for k in range(c):
        for i in range(out_h):
            for j in range(out_w):
                m = -np.inf
                for n in range(size):
                    for mm in range(size):
                        cur_h = -pad + i * stride + n
                        cur_w = -pad + j * stride + mm
                        if 0 <= cur_h < h and 0 <= cur_w < w:
                            v = x_chw[k, cur_h, cur_w]
                        else:
                            v = -np.inf
                        if v > m:
                            m = v
                out[k, i, j] = m
    return out


def resize_image(im_hwc, w, h):
    """image.c:1950-1992; im_hwc float32 (H, W, C)."""
    ih, iw, c = im_hwc.shape
    part = np.zeros((ih, w, c), np.float32)
    w_scale = np.float32(iw - 1) / np.float32(w - 1) if w > 1 else np.float32(0)
    h_scale = np.float32(ih - 1) / np.float32(h - 1) if h > 1 else np.float32(0)
    for r in range(ih):
        for col in range(w):
            if col == w - 1 or iw == 1:
                val = im_hwc[r, iw - 1]
            else:
                sx = np.float32(col) * w_scale
                ix = int(sx)
                dx = sx - np.float32(ix)
                val = (1 - dx) * im_hwc[r, ix] + dx * im_hwc[r, ix + 1]
            part[r, col] = val
    out = np.zeros((h, w, c), np.float32)
    for r in range(h):
        sy = np.float32(r) * h_scale
        iy = int(sy)
        dy = sy - np.float32(iy)
        out[r] = (1 - dy) * part[iy]
        if r == h - 1 or ih == 1:
            continue
        out[r] += dy * part[iy + 1]
    return out


def lrn_forward(x_chw, size, alpha, beta, kappa):
    """normalization_layer.c:66-96, single batch, including the
    running-sum init quirk."""
    c, h, w = x_chw.shape
    squared = x_chw ** 2
    norms = np.zeros_like(x_chw)
    norms[0] = kappa
    for k in range(size // 2):
        norms[0] += alpha * squared[k]
    for k in range(1, c):
        norms[k] = norms[k - 1].copy()
        prev = k - ((size - 1) // 2) - 1
        nxt = k + (size // 2)
        if prev >= 0:
            norms[k] -= alpha * squared[prev]
        if nxt < c:
            norms[k] += alpha * squared[nxt]
    return x_chw * norms ** (-beta)


def nms_sort(boxes, probs, iou_thresh):
    """box.c:249-277: per-class sort + suppress. boxes (N,4) xywh center,
    probs (N,C). Returns suppressed probs copy."""
    probs = probs.copy()
    n, classes = probs.shape

    def iou(a, b):
        def overlap(x1, w1, x2, w2):
            l1, l2 = x1 - w1 / 2, x2 - w2 / 2
            left = max(l1, l2)
            r1, r2 = x1 + w1 / 2, x2 + w2 / 2
            right = min(r1, r2)
            return right - left
        ow = overlap(a[0], a[2], b[0], b[2])
        oh = overlap(a[1], a[3], b[1], b[3])
        if ow < 0 or oh < 0:
            inter = 0.0
        else:
            inter = ow * oh
        u = a[2] * a[3] + b[2] * b[3] - inter
        return inter / u

    for k in range(classes):
        order = sorted(range(n), key=lambda i: -probs[i, k])
        for ii, i in enumerate(order):
            if probs[i, k] == 0:
                continue
            for j in order[ii + 1:]:
                if iou(boxes[i], boxes[j]) > iou_thresh:
                    probs[j, k] = 0
    return probs


def softmax(x, temp=1.0):
    """blas.c:205-221."""
    largest = x.max()
    e = np.exp(x / temp - largest / temp)
    return e / e.sum()


def hierarchy_predictions(pred, parent):
    """tree.c:37-45 (in-place parent multiply, in index order)."""
    pred = pred.copy()
    for j in range(len(pred)):
        p = parent[j]
        if p >= 0:
            pred[j] *= pred[p]
    return pred


def shortcut_cpu(batch, w1, h1, c1, add, w2, h2, c2, out):
    """blas.c:57-81 verbatim; add (c1,h1,w1) flat, out (c2,h2,w2) flat."""
    stride = w1 // w2
    sample = w2 // w1
    assert stride == h1 // h2 and sample == h2 // h1
    stride = max(stride, 1)
    sample = max(sample, 1)
    minw = min(w1, w2)
    minh = min(h1, h2)
    minc = min(c1, c2)
    out = out.copy()
    for b in range(batch):
        for k in range(minc):
            for j in range(minh):
                for i in range(minw):
                    out_index = i * sample + w2 * (j * sample + h2 * (k + c2 * b))
                    add_index = i * stride + w1 * (j * stride + h1 * (k + c1 * b))
                    out[out_index] += add[add_index]
    return out
