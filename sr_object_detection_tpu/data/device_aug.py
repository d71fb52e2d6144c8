"""Batched ON-DEVICE detection augmentation.

The reference augments per image on the host (load_data_detection,
src_yolo2/data.c:664-716: jitter crop -> stretch resize -> flip -> HSV
distort), parallelized with loader pthreads. The numpy re-creation of
that pipeline measures ~25 img/s/core at 416px — two orders below the
2.5k img/s the TPU trains at, so real training would be input-bound.

TPU-first shape: the host only DECODES frames (threaded PIL) and draws
the per-image augmentation parameters; the whole batch then goes
through ONE jitted program that does crop+resize (darknet's exact
two-pass bilinear composed with the edge-clamped crop as four gathered
taps mixed in the same order), horizontal flip, and HSV distortion
(image.c:1718-1795 sextant math) for every image at once. Original
sizes vary, so frames sit in a zero-padded uint8 canvas with their real
(oh, ow) carried per image; canvas dims are bucketed to powers-of-two
multiples to bound recompiles.

Exactness: pinned against the host pipeline (augment.py / image.py) in
tests/test_device_aug.py — same crop params give the same pixels to
float tolerance (the mix order matches resize_image_np; the tap
index/weight tables are computed on HOST because jitted f32
arange*scale is not bit-stable under --xla_allow_excess_precision).

Measured (v5e, B=128 @ 416px from 375x500 frames): 29.1 ms/batch =
4397 img/s on device — above the 2730 img/s tiny-yolo train step, so
augmentation leaves the critical path (the host pipeline was the bound
at ~25 img/s/core; CPU-jit end-to-end A/B: 13 -> 74 img/s). The
remaining host work is image DECODE (threaded PIL) plus the uint8
canvas upload (1 byte/px).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def host_coeffs(in_size: int, out_size: int, *, clamp_last: bool,
                off: int, limit: int):
    """Darknet resize coefficients computed ON HOST with the exact
    numpy f32 math of ops.image._resize_coeffs, composed with the
    edge-clamped crop (source index = clip(off + i, 0, limit-1)).

    Device-side computation of `arange*scale` is NOT bit-stable: under
    jit, XLA's --xla_allow_excess_precision changes the f32 rounding at
    integer knife-edges (e.g. 31*(49/31) -> 48.999998 vs numpy's 49.0),
    flipping a tap index and, on the last row (whose second tap is
    dropped), the whole row. Host-computed index/weight arrays are a
    few KB and keep exact index parity with the host pipeline."""
    from ..ops.image import _resize_coeffs
    i0, i1, w0, w1 = _resize_coeffs(in_size, out_size,
                                    clamp_last=clamp_last)
    s0 = np.clip(off + i0, 0, limit - 1).astype(np.int32)
    s1 = np.clip(off + i1, 0, limit - 1).astype(np.int32)
    return s0, s1, w0.astype(np.float32), w1.astype(np.float32)


def _rgb_to_hsv(im):
    """image.c:1718-1753 (h in [0,1))."""
    r, g, b = im[..., 0], im[..., 1], im[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    delta = mx - mn
    v = mx
    s = jnp.where(mx == 0, 0.0, delta / jnp.where(mx == 0, 1.0, mx))
    dsafe = jnp.where(delta == 0, 1.0, delta)
    h = jnp.where(r == mx, (g - b) / dsafe,
                  jnp.where(g == mx, 2.0 + (b - r) / dsafe,
                            4.0 + (r - g) / dsafe))
    h = jnp.where(delta == 0, 0.0, h)
    h = jnp.where(h < 0, h + 6.0, h) / 6.0
    h = jnp.where(mx == 0, 0.0, h)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    """image.c:1755-1795 sextant table."""
    h6 = h * 6.0
    idx = jnp.floor(h6).astype(jnp.int32) % 6
    f = h6 - jnp.floor(h6)
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    def pick(table):
        out = table[0]
        for k in range(1, 6):
            out = jnp.where(idx == k, table[k], out)
        return out
    r = pick([v, q, p, p, t, v])
    g = pick([t, v, v, q, p, p])
    b = pick([p, p, t, v, v, q])
    gray = s == 0
    r = jnp.where(gray, v, r)
    g = jnp.where(gray, v, g)
    b = jnp.where(gray, v, b)
    return jnp.stack([r, g, b], axis=-1)


def _augment_one(img_u8, sx0, sx1, wx0, wx1, sy0, sy1, wy0, wy1,
                 flip, dhue, dsat, dexp, do_distort, *, w: int,
                 h: int, resample: str = "gather",
                 precision=None):
    """One image: edge-clamped jitter crop composed with the darknet
    two-pass bilinear (the horizontal mix happens first, matching
    resize_image_np's float order), then flip, then HSV distort. The
    tap indices/weights arrive precomposed from host_coeffs.

    resample="matmul" (the TPU path): the two-tap mixes become two
    sparse-as-dense one-hot matmuls on the MXU — Wy (h, Hmax) carries
    wy0/wy1 at the tap columns, Wx (Wmax, w) likewise — instead of
    gathers (TPU gathers are scalar-unit-bound; measured 29 ms/batch
    vs ~6 ms matmul at B=128/416px). Values match the gather path to
    f32 rounding (the dot adds exact zeros; fused taps at clamped
    edges sum their weights first)."""
    im = img_u8.astype(jnp.float32) / 255.0          # (Hmax, Wmax, 3)
    if resample == "matmul":
        hmax, wmax, _ = im.shape
        wy = jnp.zeros((h, hmax), jnp.float32)
        wy = wy.at[jnp.arange(h), sy0].add(wy0)
        wy = wy.at[jnp.arange(h), sy1].add(wy1)
        wx = jnp.zeros((wmax, w), jnp.float32)
        wx = wx.at[sx0, jnp.arange(w)].add(wx0)
        wx = wx.at[sx1, jnp.arange(w)].add(wx1)
        prec = (jax.lax.Precision.HIGHEST if precision is None
                else precision)
        rows = jnp.einsum("rH,HWc->rWc", wy, im, precision=prec)
        out = jnp.einsum("rWc,Wo->roc", rows, wx, precision=prec)
    else:
        # horizontal pass on the two needed row sets, then vertical
        # mix — the same association order as the two-pass host resize
        rows0 = im[sy0]                               # (h, Wmax, 3)
        rows1 = im[sy1]
        part0 = (wx0[:, None] * rows0[:, sx0, :]
                 + wx1[:, None] * rows0[:, sx1, :])   # (h, w, 3)
        part1 = (wx0[:, None] * rows1[:, sx0, :]
                 + wx1[:, None] * rows1[:, sx1, :])
        out = wy0[:, None, None] * part0 + wy1[:, None, None] * part1

    out = jnp.where(flip, out[:, ::-1, :], out)

    hh, ss, vv = _rgb_to_hsv(out)
    ss = ss * dsat
    vv = vv * dexp
    hh = hh + dhue
    hh = jnp.where(hh > 1.0, hh - 1.0, hh)
    hh = jnp.where(hh < 0.0, hh + 1.0, hh)
    dist = jnp.clip(_hsv_to_rgb(hh, ss, vv), 0.0, 1.0)
    return jnp.where(do_distort, dist, out)


class DeviceAugmenter:
    """Jitted batched augmentation; call with a padded uint8 canvas and
    per-image parameter/coefficient arrays. One compile per canvas
    bucket."""

    _KEYS = ("sx0", "sx1", "wx0", "wx1", "sy0", "sy1", "wy0", "wy1",
             "flip", "dhue", "dsat", "dexp", "do_distort")

    def __init__(self, w: int, h: int, resample: str = "auto",
                 precision: str = "exact", out_dtype=None):
        self.w, self.h = w, h
        # out_dtype=bfloat16: cast at aug WRITE instead of at train-
        # step entry — bit-identical end-to-end for a bf16 compute
        # step (which casts its input first anyway) and halves the
        # batch's HBM read + kills the in-step convert (measured
        # -0.75 ms/step on tiny-yolo-416 B=128, round 5)
        self.out_dtype = out_dtype
        if resample == "auto":
            # MXU one-hot matmuls beat gathers on TPU; on CPU the
            # matmul costs real FLOPs and gathers win
            resample = ("matmul" if jax.default_backend() == "tpu"
                        else "gather")
        self.resample = resample
        # precision="exact": f32 HIGHEST matmuls, bit-parity with the
        # host pipeline (the tested default). precision="fast": the
        # MXU's native bf16-input/f32-accumulate dot — pixel values
        # move by <~1e-3 (augmentation noise scale), the resample runs
        # ~8x faster, and the one-hot structure keeps tap SELECTION
        # exact (zeros and the index pattern are unaffected by input
        # rounding). The from-disk training pipeline uses "fast" so
        # augmentation stays off the step's critical path.
        self.precision = precision
        prec = (None if precision == "exact"
                else jax.lax.Precision.DEFAULT)
        od = self.out_dtype

        def _one(img, p):
            out = _augment_one(
                img, *(p[k] for k in self._KEYS), w=w, h=h,
                resample=resample, precision=prec)
            return out if od is None else out.astype(od)
        self._fn = jax.jit(jax.vmap(_one, in_axes=(0, 0)))

    def coeffs(self, params: dict) -> dict:
        """Host-side tap tables for one image's crop params."""
        sx0, sx1, wx0, wx1 = host_coeffs(
            params["swidth"], self.w, clamp_last=True,
            off=params["pleft"], limit=params["ow"])
        sy0, sy1, wy0, wy1 = host_coeffs(
            params["sheight"], self.h, clamp_last=False,
            off=params["ptop"], limit=params["oh"])
        return dict(sx0=sx0, sx1=sx1, wx0=wx0, wx1=wx1, sy0=sy0,
                    sy1=sy1, wy0=wy0, wy1=wy1, flip=params["flip"],
                    dhue=np.float32(params["dhue"]),
                    dsat=np.float32(params["dsat"]),
                    dexp=np.float32(params["dexp"]),
                    do_distort=params["do_distort"])

    def __call__(self, canvas_u8: np.ndarray, params: dict):
        p = {k: jnp.asarray(np.asarray(v)) for k, v in params.items()
             if k in self._KEYS}
        return self._fn(jnp.asarray(canvas_u8), p)


def _bucket(n: int) -> int:
    """Canvas dim bucket: next multiple of 128 (bounds recompiles)."""
    return max(((n + 127) // 128) * 128, 128)


def draw_params(rng: np.random.Generator, oh: int, ow: int, *,
                jitter: float, hue: float, saturation: float,
                exposure: float, augment: bool = True):
    """The host-side RNG draws — the same distributions as the host
    pipeline (load_detection_sample / rand_scale)."""
    from .augment import rand_scale
    if not augment:
        return dict(oh=oh, ow=ow, pleft=0, ptop=0, swidth=ow,
                    sheight=oh, flip=False, dhue=0.0, dsat=1.0,
                    dexp=1.0, do_distort=False), (0.0, 0.0, 1.0, 1.0,
                                                  False)
    dw, dh = int(ow * jitter), int(oh * jitter)
    pleft = int(rng.uniform(-dw, dw))
    pright = int(rng.uniform(-dw, dw))
    ptop = int(rng.uniform(-dh, dh))
    pbot = int(rng.uniform(-dh, dh))
    swidth = ow - pleft - pright
    sheight = oh - ptop - pbot
    sx, sy = swidth / ow, sheight / oh
    flip = bool(rng.integers(0, 2))
    dhue = float(rng.uniform(-hue, hue))
    dsat = float(rand_scale(rng, saturation))
    dexp = float(rand_scale(rng, exposure))
    do_distort = not (dhue == 0 and dsat == 1 and dexp == 1)
    params = dict(oh=oh, ow=ow, pleft=pleft, ptop=ptop, swidth=swidth,
                  sheight=sheight, flip=flip, dhue=dhue, dsat=dsat,
                  dexp=dexp, do_distort=do_distort)
    box_xform = ((pleft / ow) / sx, (ptop / oh) / sy, 1.0 / sx,
                 1.0 / sy, flip)
    return params, box_xform


__all__ = ["DeviceAugmenter", "draw_params", "_bucket"]
