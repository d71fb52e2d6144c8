"""Recurrent layers: RNN / GRU / CRNN (darknet semantics).

The reference unrolls time by folding ``time_steps`` into the batch
dimension **step-major** and bumping sub-layer pointers
(rnn_layer.c:82-121, gru_layer.c:140-193, crnn_layer.c:91-130). We keep
the same data contract — input (steps*b, features) step-major — and
unroll with ``lax.scan`` so XLA compiles one step body.

Recurrences (all sub-layers are darknet connected/conv layers with
their own activation):
  RNN:  h_t   = inp(x_t) + self(h_{t-1})    [+ h_{t-1} if shortcut]
        out_t = out(h_t)
  GRU:  z = sigmoid(iz(x)+sz(h));  r = sigmoid(ir(x)+sr(h))
        hh = sigmoid(ih(x) + sh(r*h))        (LOGISTIC: USET undefined)
        out = z*h + (1-z)*hh;  h' = out      (weighted_sum_cpu:blas.c:49)
  CRNN: convolutional RNN, same recurrence with 3x3 conv sub-layers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import conv as C
from .activations import get_activation


def _split_steps(x, steps: int):
    """(steps*b, f) step-major -> (steps, b, f)."""
    total = x.shape[0]
    b = total // steps
    return x.reshape(steps, b, *x.shape[1:])


def _merge_steps(x):
    return x.reshape(x.shape[0] * x.shape[1], *x.shape[2:])


def _connected(p, x, activation: str, batch_normalize: bool,
               train: bool = False):
    """Sub-layer connected forward. In train mode BN uses batch stats
    (forward_batchnorm_layer with state.train, batchnorm_layer.c:130) —
    rolling-stat updates inside the scan are discarded (they do not
    affect the train forward)."""
    act = get_activation(activation)
    if batch_normalize and train:
        y, _ = C.connected(x, p, act, batch_normalize=True, train=True)
        return y
    return C.connected(x, p, act, batch_normalize=batch_normalize)


def rnn_forward(x, params, spec, *, time_steps: int, train: bool = False,
                state=None):
    """x: (steps*b, inputs) step-major. Returns (out, bn_updates)."""
    steps = time_steps
    xs = _split_steps(x, steps)
    b = xs.shape[1]
    if state is None:
        state = jnp.zeros((b, spec.hidden), x.dtype)

    def step(h, x_t):
        i_out = _connected(params["input"], x_t, spec.activation,
                           spec.batch_normalize, train)
        s_out = _connected(params["self"], h, spec.activation,
                           spec.batch_normalize, train)
        h_new = i_out + s_out
        # l.shortcut adds the previous state on top (rnn_layer.c:103-109)
        o = _connected(params["output"], h_new, spec.activation,
                       spec.batch_normalize, train)
        return h_new, o

    _, outs = jax.lax.scan(step, state, xs)
    return _merge_steps(outs), {}


def rnn_forward_stateful(x_t, params, spec, state):
    """Single-step RNN for generation; returns (out, new_state)."""
    i_out = _connected(params["input"], x_t, spec.activation,
                       spec.batch_normalize)
    s_out = _connected(params["self"], state, spec.activation,
                       spec.batch_normalize)
    h = i_out + s_out
    o = _connected(params["output"], h, spec.activation,
                   spec.batch_normalize)
    return o, h


def gru_forward(x, params, spec, *, time_steps: int, train: bool = False,
                state=None):
    steps = time_steps
    xs = _split_steps(x, steps)
    b = xs.shape[1]
    if state is None:
        state = jnp.zeros((b, spec.output), x.dtype)

    def step(h, x_t):
        o, h_new = gru_cell(x_t, params, h, spec.batch_normalize,
                            train=train)
        return h_new, o

    _, outs = jax.lax.scan(step, state, xs)
    return _merge_steps(outs), {}


def gru_cell(x_t, params, h, batch_normalize: bool, train: bool = False):
    lin = "linear"
    z = jax.nn.sigmoid(
        _connected(params["input_z"], x_t, lin, batch_normalize, train)
        + _connected(params["state_z"], h, lin, batch_normalize, train))
    r = jax.nn.sigmoid(
        _connected(params["input_r"], x_t, lin, batch_normalize, train)
        + _connected(params["state_r"], h, lin, batch_normalize, train))
    hh = jax.nn.sigmoid(
        _connected(params["input_h"], x_t, lin, batch_normalize, train)
        + _connected(params["state_h"], r * h, lin, batch_normalize, train))
    out = z * h + (1.0 - z) * hh
    return out, out


def crnn_forward(x, params, spec, *, time_steps: int, train: bool = False,
                 state=None):
    """x: NHWC (steps*b, h, w, c) step-major. conv sub-layers are 3x3
    stride-1 pad-1 (crnn_layer.c make_crnn_layer)."""
    steps = time_steps
    xs = x.reshape(steps, x.shape[0] // steps, *x.shape[1:])
    b = xs.shape[1]
    if state is None:
        state = jnp.zeros((b, spec.h, spec.w, spec.hidden_filters), x.dtype)

    class _SubSpec:
        stride = 1
        pad = 1
        batch_normalize = spec.batch_normalize

    act = get_activation(spec.activation)

    def step(h, x_t):
        i_out = C.conv_block(x_t, params["input"], _SubSpec, act)
        s_out = C.conv_block(h, params["self"], _SubSpec, act)
        h_new = i_out + s_out
        o = C.conv_block(h_new, params["output"], _SubSpec, act)
        return h_new, o

    _, outs = jax.lax.scan(step, state, xs)
    return outs.reshape(-1, *outs.shape[2:]), {}


__all__ = ["rnn_forward", "rnn_forward_stateful", "gru_forward", "gru_cell",
           "crnn_forward"]
