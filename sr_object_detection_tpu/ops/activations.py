"""All 13 darknet activations as vectorized JAX functions.

Reference semantics: src_yolo2/activations.h:22-85. Each is a pure
elementwise fn; XLA fuses these into the producing matmul/conv, so there
is no separate "activation kernel" on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def logistic(x):
    return jax.nn.sigmoid(x)


def loggy(x):
    return 2.0 * jax.nn.sigmoid(x) - 1.0


def relu(x):
    return jnp.maximum(x, 0)


def elu(x):
    return jnp.where(x >= 0, x, jnp.expm1(x))


def relie(x):
    return jnp.where(x > 0, x, 0.01 * x)


def ramp(x):
    return x * (x > 0) + 0.1 * x


def leaky(x):
    return jnp.where(x > 0, x, 0.1 * x)


def tanh_(x):
    return jnp.tanh(x)


def plse(x):
    return jnp.where(
        x < -4.0, 0.01 * (x + 4.0),
        jnp.where(x > 4.0, 0.01 * (x - 4.0) + 1.0, 0.125 * x + 0.5))


def stair(x):
    n = jnp.floor(x)
    half = jnp.floor(x / 2.0)
    even = jnp.mod(n, 2) == 0
    return jnp.where(even, half, (x - n) + half)


def hardtan(x):
    return jnp.clip(x, -1.0, 1.0)


def lhtan(x):
    return jnp.where(
        x < 0, 0.001 * x,
        jnp.where(x > 1, 0.001 * (x - 1.0) + 1.0, x))


def linear(x):
    return x


ACTIVATIONS = {
    "logistic": logistic,
    "loggy": loggy,
    "relu": relu,
    "elu": elu,
    "relie": relie,
    "ramp": ramp,
    "leaky": leaky,
    "tanh": tanh_,
    "plse": plse,
    "stair": stair,
    "hardtan": hardtan,
    "lhtan": lhtan,
    "linear": linear,
}


def get_activation(name: str):
    """Mirror get_activation (activations.c:43): unknown -> relu + warning."""
    fn = ACTIVATIONS.get(name)
    if fn is None:
        import sys
        print(f"Couldn't find activation function {name}, going with ReLU",
              file=sys.stderr)
        return relu
    return fn


__all__ = ["ACTIVATIONS", "get_activation"] + list(ACTIVATIONS)
