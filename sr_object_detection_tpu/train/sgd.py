"""Darknet-exact SGD (momentum + decay) and learning-rate policies.

Update rule (update_convolutional_layer,
src_yolo2/convolutional_layer.c:514-528; connected/local identical):

    weight_updates += -decay*batch * weights        (weights only)
    weights        += lr/batch * weight_updates
    weight_updates *= momentum

where ``weight_updates`` accumulates the NEGATIVE gradient summed over
the effective batch (darknet deltas are negative gradients). With
g = +dL/dw summed over the batch:

    v   <- momentum * v_prev - g - decay*batch*w    ('weights' leaves)
    v   <- momentum * v_prev - g                    (biases/scales)
    w   <- w + lr/batch * v

LR policies mirror get_current_rate (src_yolo2/network.c:48-79).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.spec import NetSpec


def init_velocity(params):
    return jax.tree.map(jnp.zeros_like, params)


def _is_weight_path(path) -> bool:
    for p in path:
        key = getattr(p, "key", getattr(p, "dict_key", None))
        if key == "weights":
            return True
    return False


def sgd_update(params, grads, velocity, *, lr, batch_size: int,
               momentum: float, decay: float):
    """One darknet SGD step. ``grads`` = dL/dw SUMMED over the batch.

    BN rolling stats (rolling_mean/rolling_variance) are not touched
    here — the trainer overwrites them from the forward pass aux.
    """

    def upd(path, p, g, v):
        key = None
        for entry in path:
            key = getattr(entry, "key", key)
        if key in ("rolling_mean", "rolling_variance"):
            return p, v
        if key == "weights":
            new_v = momentum * v - g - decay * batch_size * p
        else:
            new_v = momentum * v - g
        new_p = p + (lr / batch_size) * new_v
        return new_p, new_v

    flat = jax.tree_util.tree_map_with_path(
        lambda path, p, g, v: upd(path, p, g, v), params, grads, velocity)
    new_params = jax.tree.map(lambda t: t[0], flat,
                              is_leaf=lambda t: isinstance(t, tuple))
    new_vel = jax.tree.map(lambda t: t[1], flat,
                           is_leaf=lambda t: isinstance(t, tuple))
    return new_params, new_vel


def learning_rate(net: NetSpec, batch_num):
    """get_current_rate (network.c:48-79) as a jittable fn of batch_num.

    The RANDOM policy's rand() is evaluated host-side per step by the
    trainer (not traceable); here it falls back to constant.
    """
    bn = jnp.asarray(batch_num, jnp.float32)
    base = net.learning_rate
    if net.policy == "constant" or net.policy == "random":
        return jnp.asarray(base, jnp.float32)
    if net.policy == "step":
        return base * jnp.power(net.scale, jnp.floor(bn / net.step))
    if net.policy == "steps":
        rate = jnp.asarray(base, jnp.float32)
        for s, sc in zip(net.steps, net.scales):
            rate = jnp.where(bn >= s, rate * sc, rate)
        return rate
    if net.policy == "exp":
        return base * jnp.power(net.gamma, bn)
    if net.policy == "poly":
        warm = base * jnp.power(bn / max(net.burn_in, 1), net.power)
        main = base * jnp.power(1.0 - bn / max(net.max_batches, 1),
                                net.power)
        return jnp.where(bn < net.burn_in, warm, main)
    if net.policy == "sigmoid":
        return base / (1.0 + jnp.exp(net.gamma * (bn - net.step)))
    return jnp.asarray(base, jnp.float32)


def learning_rate_py(net: NetSpec, batch_num: int) -> float:
    """Host-side exact version incl. the 'steps' short-circuit quirk:
    the reference stops at the first step > batch_num, so an unsorted
    steps list behaves order-dependently — preserved here."""
    if net.policy == "constant":
        return net.learning_rate
    if net.policy == "step":
        return net.learning_rate * (net.scale ** (batch_num // net.step))
    if net.policy == "steps":
        rate = net.learning_rate
        for s, sc in zip(net.steps, net.scales):
            if s > batch_num:
                return rate
            rate *= sc
        return rate
    if net.policy == "exp":
        return net.learning_rate * (net.gamma ** batch_num)
    if net.policy == "poly":
        if batch_num < net.burn_in:
            return net.learning_rate * (
                (batch_num / max(net.burn_in, 1)) ** net.power)
        return net.learning_rate * (
            (1 - batch_num / max(net.max_batches, 1)) ** net.power)
    if net.policy == "random":
        return net.learning_rate * (np.random.uniform() ** net.power)
    if net.policy == "sigmoid":
        return net.learning_rate * (
            1.0 / (1.0 + np.exp(net.gamma * (batch_num - net.step))))
    return net.learning_rate


__all__ = ["init_velocity", "sgd_update", "learning_rate",
           "learning_rate_py"]


def adam_update(w, g, m, v, *, lr, batch_size: int, b1: float = 0.9,
                b2: float = 0.999, eps: float = 1e-6, decay: float = 0.0,
                t: int = 1):
    """Darknet Adam for conv weights (update_convolutional_layer_gpu,
    convolutional_kernels.cu:260-272 + adam_kernel, blas_kernels.cu:143):

        wu = -(g + decay*batch*w)                (weight_updates)
        m  = B1*m + (1-B1)*(g + decay*batch*w)
        v  = B2*v + (1-B2)*wu^2
        w  = w - lr/batch * sqrt(1-B2^t)/(1-B1^t) * m/(sqrt(v)+eps)

    ``g`` is +dL/dw summed over the batch; ``t`` is the 1-based update
    counter (layer.t+1). No shipped cfg enables adam, so the Trainer
    stays on the SGD path; this function plus the adam_m/adam_v
    checkpoint arrays (io/weights.py) complete the capability.
    """
    gd = g + decay * batch_size * w
    new_m = b1 * m + (1.0 - b1) * gd
    new_v = b2 * v + (1.0 - b2) * jnp.square(gd)
    rate = (lr / batch_size) * jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
    new_w = w - rate * new_m / (jnp.sqrt(new_v) + eps)
    return new_w, new_m, new_v
