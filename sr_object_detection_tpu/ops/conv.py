"""Convolution / batchnorm / connected ops, NHWC, MXU-shaped.

TPU-native replacement for the reference's im2col+GEMM convolution path
(src_yolo2/convolutional_layer.c:435-474, im2col.c, gemm.c): a single
``lax.conv_general_dilated`` in NHWC/HWIO lands directly on the MXU and
XLA fuses the batchnorm affine + bias + activation into its epilogue.

Parity-critical details preserved from the reference:
  * forward order is conv -> batchnorm(normalize+scale) -> +bias -> act
    (convolutional_layer.c:455-473);
  * batchnorm normalizes as (x-mean)/(sqrt(var) + 1e-6) — epsilon added
    OUTSIDE the sqrt (blas.c:122);
  * train-time batch variance uses the 1/(N-1) estimator (blas.c:101);
  * rolling stats update with 0.9/0.1 on CPU (batchnorm_layer.c:133-136).

Inference-path speed: pass ``compute_dtype=jnp.bfloat16`` to run the conv
on the MXU in bf16 with fp32 accumulation (preferred_element_type).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

BN_EPS = 1e-6  # blas.c:122 — added outside sqrt


def conv2d(x, w, *, stride: int, pad: int, compute_dtype=None):
    """NHWC conv. ``w`` is HWIO.

    compute_dtype=None (parity/training default): operands as given,
    fp32 output via preferred_element_type. With a compute_dtype (the
    bf16 production path): both operands cast and the conv runs natively
    in that dtype — the TPU MXU still accumulates in fp32 internally,
    and keeping operand/cotangent dtypes uniform lets autodiff build the
    transposed convs without dtype mismatches.
    """
    if compute_dtype is not None:
        y = lax.conv_general_dilated(
            x.astype(compute_dtype), w.astype(compute_dtype),
            window_strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # cast back to fp32 for the epilogue: XLA fuses it away, and in
        # training the cast's transpose downcasts cotangents to the
        # compute dtype so the transposed convs see uniform operands
        return y.astype(jnp.float32)
    # f32 path: a narrower input (e.g. the bf16 aug-output dataflow
    # feeding an f32-compute trainer) upcasts exactly
    if x.dtype != w.dtype:
        x = x.astype(w.dtype)
    return lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def conv2d_b1_tap_matmul(x, w, *, pad: int, compute_dtype=None):
    """3x3 stride-1 conv at batch 1 as 9 explicit (H*W, Cin)@(Cin, Cout)
    matmuls.

    At B=1 XLA lays the conv's NHWC operand with the unit batch dim in
    SUBLANES (layout {3,0,2,1}, T(2,128) tile), wasting half of every
    tile at 13x13-scale spatial dims — measured 1.4-1.55x slower than
    this formulation on v5e (conv7/conv8 of tiny-yolo-416; PARITY.md
    batch-1 section). Here the spatial dim itself fills the sublanes.
    Accumulation f32 like conv2d; output f32 NHWC.
    """
    _, H, W, _ = x.shape
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    xp = jnp.pad(x[0], ((pad, pad), (pad, pad), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            a = xp[dy:dy + H, dx:dx + W].reshape(H * W, -1)
            d = jnp.dot(a, w[dy, dx],
                        preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
    return acc.reshape(1, H, W, -1)


def batchnorm_inference(x, scales, rolling_mean, rolling_var):
    """(x - mean) / (sqrt(var) + eps) * scale  — channelwise over NHWC[-1].

    Folded to a single multiply-add so XLA fuses it into the conv epilogue.
    """
    inv = scales / (jnp.sqrt(rolling_var) + BN_EPS)
    return x * inv + (-rolling_mean * inv)


def batchnorm_train(x, scales, rolling_mean, rolling_var):
    """Train-mode batchnorm over NHWC batch+spatial dims.

    Returns (normalized*scale, new_rolling_mean, new_rolling_var,
             batch_mean, batch_var, x_hat).

    Forward matches the reference exactly: 1/(N-1) variance (blas.c:101),
    eps added OUTSIDE the sqrt (blas.c:122), rolling update 0.9/0.1.
    The backward pass reproduces the reference's HAND-WRITTEN gradient
    (backward_batchnorm_layer, batchnorm_layer.c:147-157 with
    mean_delta/variance_delta/normalize_delta at :74-115), which is NOT
    the autodiff gradient of the forward — it uses eps=1e-5 placed
    differently (inside pow for variance, added to sqrt'd var for the
    direct term) and 1/N weighting. Besides parity, this keeps the
    gradient finite at zero batch variance where true autodiff would
    produce inf (d sqrt(v)/dv at v=0).

    A bf16 input selects the bandwidth-optimized core (same math, f32
    accumulation, single-pass shifted-moment statistics, residual-free
    backward) — profiled 2x+ cheaper on 600px activations where the f32
    three-pass core dominated the train step.
    """
    if x.dtype == jnp.bfloat16:
        y, x_hat, mean, var = _bn_core_fast(
            x, scales, lax.stop_gradient(rolling_mean))
    else:
        y, x_hat, mean, var = _bn_core(x, scales)
    new_rm = 0.9 * rolling_mean + 0.1 * mean
    new_rv = 0.9 * rolling_var + 0.1 * var
    return y, new_rm, new_rv, mean, var, x_hat


@jax.custom_vjp
def _bn_core(x, scales):
    reduce_axes = tuple(range(x.ndim - 1))
    n = 1
    for a in reduce_axes:
        n *= x.shape[a]
    mean = jnp.mean(x, axis=reduce_axes)
    var = jnp.sum(jnp.square(x - mean), axis=reduce_axes) / max(n - 1, 1)
    x_hat = (x - mean) / (jnp.sqrt(var) + BN_EPS)
    return x_hat * scales, x_hat, mean, var


def _bn_core_fwd(x, scales):
    out = _bn_core(x, scales)
    y, x_hat, mean, var = out
    return out, (x, scales, x_hat, mean, var)


def _bn_core_bwd(res, g):
    x, scales, x_hat, mean, var = res
    dy = g[0]
    # cotangents of the aux outputs (x_hat/mean/var) are ignored — the
    # reference's backward only propagates through the output path, and
    # rolling-stat updates are not differentiated

    reduce_axes = tuple(range(x.ndim - 1))
    n = 1
    for a in reduce_axes:
        n *= x.shape[a]
    eps_b = 1e-5  # backward eps (batchnorm_layer.c:74-115: .00001f)
    dscales = jnp.sum(dy * x_hat, axis=reduce_axes)
    d = dy * scales                      # scale_bias on delta (:150)
    sum_d = jnp.sum(d, axis=reduce_axes)
    mean_delta = sum_d * (-1.0 / jnp.sqrt(var + eps_b))
    variance_delta = jnp.sum(d * (x - mean), axis=reduce_axes) * \
        (-0.5) * jnp.power(var + eps_b, -1.5)
    dx = (d / (jnp.sqrt(var) + eps_b)
          + variance_delta * 2.0 * (x - mean) / n
          + mean_delta / n)
    return dx, dscales


_bn_core.defvjp(_bn_core_fwd, _bn_core_bwd)


@jax.custom_vjp
def _bn_core_fast(x, scales, shift):
    """bf16 batchnorm core: identical formulas to :func:`_bn_core`
    (1/(N-1) variance, eps outside sqrt, reference hand-written
    backward) restructured for HBM bandwidth:

      * statistics in ONE fused pass — sum(x-shift) and sum((x-shift)^2)
        share a single read of x; ``shift`` (the rolling mean, gradient-
        stopped) removes the catastrophic cancellation the textbook
        E[x^2]-E[x]^2 identity would have;
      * elementwise math reads/writes bf16 with f32 scalars in
        registers;
      * the backward recomputes x_hat from (x, mean, var) instead of
        saving it — one fewer full-size residual.
    """
    f32 = jnp.float32
    reduce_axes = tuple(range(x.ndim - 1))
    n = 1
    for a in reduce_axes:
        n *= x.shape[a]
    xs = x.astype(f32) - shift
    sx = jnp.sum(xs, axis=reduce_axes)
    sxx = jnp.sum(jnp.square(xs), axis=reduce_axes)
    mean = shift + sx / n
    # clamp: on a near-constant channel the sxx - sx^2/n cancellation
    # can round NEGATIVE in f32, and sqrt(var) = NaN would poison the
    # whole train step (the two-pass core can never go negative)
    var = jnp.maximum(
        (sxx - jnp.square(sx) / n) / max(n - 1, 1), 0.0)
    inv = 1.0 / (jnp.sqrt(var) + BN_EPS)
    x_hat = (x.astype(f32) - mean) * inv
    y = (x_hat * scales).astype(x.dtype)
    return y, x_hat, mean, var


def _bn_core_fast_fwd(x, scales, shift):
    out = _bn_core_fast(x, scales, shift)
    _, _, mean, var = out
    return out, (x, scales, mean, var)


def _bn_core_fast_bwd(res, g):
    x, scales, mean, var = res
    dy = g[0].astype(jnp.float32)   # casts fuse; tensors stay bf16 in HBM
    reduce_axes = tuple(range(x.ndim - 1))
    n = 1
    for a in reduce_axes:
        n *= x.shape[a]
    eps_b = 1e-5                     # batchnorm_layer.c:74-115 backward eps
    xm = x.astype(jnp.float32) - mean
    x_hat = xm / (jnp.sqrt(var) + BN_EPS)
    dscales = jnp.sum(dy * x_hat, axis=reduce_axes)
    d = dy * scales
    sum_d = jnp.sum(d, axis=reduce_axes)
    mean_delta = sum_d * (-1.0 / jnp.sqrt(var + eps_b))
    variance_delta = jnp.sum(d * xm, axis=reduce_axes) * \
        (-0.5) * jnp.power(var + eps_b, -1.5)
    dx = (d / (jnp.sqrt(var) + eps_b)
          + variance_delta * 2.0 * xm / n
          + mean_delta / n).astype(x.dtype)
    return dx, dscales, jnp.zeros_like(var)


_bn_core_fast.defvjp(_bn_core_fast_fwd, _bn_core_fast_bwd)


@jax.custom_vjp
def bias_add(y, b):
    """y + b broadcast over the channel (last) axis, with the bias
    GRADIENT accumulated in f32.

    Autodiff of ``y + b.astype(y.dtype)`` on a bf16 tensor makes the bias
    gradient an XLA reduce with a bf16 ACCUMULATOR, which saturates: once
    |acc| exceeds ~256x the element magnitude the ulp outgrows the
    addends and the sum stalls (measured: summing 16384 cotangents of
    1.7 returned exactly 2048 — the plateau — instead of ~27000, found
    by tests/test_fused_stem.py). Darknet accumulates in f32
    (backward_bias, blas.c) and so must we."""
    return y + b.astype(y.dtype)


def _bias_add_fwd(y, b):
    return bias_add(y, b), b


def _bias_add_bwd(b, g):
    db = jnp.sum(g, axis=tuple(range(g.ndim - 1)), dtype=jnp.float32)
    return g, db.astype(b.dtype)


bias_add.defvjp(_bias_add_fwd, _bias_add_bwd)


def binarize_weights(w_hwio):
    """XNOR-net weight binarization (convolutional_layer.c:37-49):
    per-filter sign(w) * mean(|w|)."""
    mean = jnp.mean(jnp.abs(w_hwio), axis=(0, 1, 2), keepdims=True)
    return jnp.where(w_hwio > 0, mean, -mean)


def binarize_input(x):
    """binarize_cpu (convolutional_layer.c:52-58): sign in {+1,-1}
    (zero maps to -1)."""
    return jnp.where(x > 0, 1.0, -1.0).astype(x.dtype)


def conv_block(x, params, spec, activation_fn, *, train: bool = False,
               compute_dtype=None, b1_matmul: bool = False):
    """Full darknet conv layer: conv [+BN] +bias +activation.

    ``params``: dict with 'weights' (HWIO), 'biases' (C,), and when
    batch_normalize: 'scales', 'rolling_mean', 'rolling_variance'.

    When train=True and BN is on, returns (y, bn_updates) where
    bn_updates = {'rolling_mean': ..., 'rolling_variance': ...};
    otherwise returns y alone.
    """
    w = params["weights"]
    if getattr(spec, "xnor", False) and not train:
        # XNOR inference path (forward_convolutional_layer:443-448):
        # binarized weights AND sign-binarized input
        w = binarize_weights(w)
        x = binarize_input(x)
    if (b1_matmul and not train and x.shape[0] == 1 and spec.size == 3
            and spec.stride == 1 and not getattr(spec, "xnor", False)):
        y = conv2d_b1_tap_matmul(x, w, pad=spec.pad,
                                 compute_dtype=compute_dtype)
    else:
        y = conv2d(x, w, stride=spec.stride, pad=spec.pad,
                   compute_dtype=compute_dtype)
    bn_updates = None
    if spec.batch_normalize:
        if train:
            if compute_dtype is not None:
                # bf16 training: hand BN the compute-dtype tensor so the
                # bandwidth-optimized core runs (stats still accumulate
                # f32) and the epilogue below stays bf16 end-to-end
                y = y.astype(compute_dtype)
            y, new_rm, new_rv, _, _, _ = batchnorm_train(
                y, params["scales"], params["rolling_mean"],
                params["rolling_variance"])
            bn_updates = {"rolling_mean": new_rm, "rolling_variance": new_rv}
        else:
            y = batchnorm_inference(
                y, params["scales"], params["rolling_mean"],
                params["rolling_variance"])
    y = bias_add(y, params["biases"])
    y = activation_fn(y)
    if compute_dtype is not None:
        # store activations in the compute dtype: the cast fuses into the
        # conv epilogue and halves inter-layer HBM traffic (the fp32
        # accumulate stays inside the MXU). In train mode this also
        # keeps the BACKWARD chain in the compute dtype — BN batch
        # stats and rolling updates are computed above in f32 before
        # the cast, but cotangents flow bf16 between layers (round-2
        # profile: the f32 train graph ran at 13% MFU with f32
        # elementwise fusions on 600px activations dominating).
        y = y.astype(compute_dtype)
    if train:
        return y, bn_updates
    return y


def connected(x, params, activation_fn, *, batch_normalize: bool = False,
              train: bool = False):
    """Fully-connected layer: y = x @ W^T + b (connected_layer.c forward).

    ``params['weights']`` has darknet layout (outputs, inputs).
    When train=True and BN on, returns (y, bn_updates).
    """
    y = jnp.dot(x, params["weights"].T, preferred_element_type=jnp.float32)
    bn_updates = None
    if batch_normalize:
        if train:
            y, new_rm, new_rv, _, _, _ = batchnorm_train(
                y, params["scales"], params["rolling_mean"],
                params["rolling_variance"])
            bn_updates = {"rolling_mean": new_rm, "rolling_variance": new_rv}
        else:
            y = batchnorm_inference(
                y, params["scales"], params["rolling_mean"],
                params["rolling_variance"])
    y = y + params["biases"]
    y = activation_fn(y)
    if train:
        return y, bn_updates
    return y


def fold_batchnorm(params):
    """Fold BN into conv weights+bias for inference ('denormalize',
    convolutional_layer.c:321-334 / darknet.c denormalize_net).

    Returns a new params dict with only 'weights' and 'biases'.
    """
    scales = params["scales"]
    mean = params["rolling_mean"]
    var = params["rolling_variance"]
    inv = scales / (jnp.sqrt(var) + BN_EPS)
    w = params["weights"] * inv[None, None, None, :]
    b = params["biases"] - mean * inv
    return {"weights": w, "biases": b}


__all__ = [
    "conv2d", "conv_block", "connected",
    "binarize_weights", "binarize_input",
    "batchnorm_inference", "batchnorm_train", "fold_batchnorm", "BN_EPS",
]
