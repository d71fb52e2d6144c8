"""make_multi_step: K training steps in one scanned dispatch must be
EXACTLY K sequential make_train_step calls (same rng split discipline,
same BN rolling-stat cadence, same SGD updates)."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from sr_object_detection_tpu.models.zoo import tiny_yolo_voc
from sr_object_detection_tpu.io.weights import init_params
from sr_object_detection_tpu.train.trainer import (
    make_train_step, make_multi_step, TrainState)
from sr_object_detection_tpu.train.sgd import init_velocity


def test_multi_step_equals_sequential_steps():
    K, B = 3, 2
    base = tiny_yolo_voc()
    spec = dataclasses.replace(
        base, net=dataclasses.replace(base.net, h=64, w=64, batch=B,
                                      subdivisions=1))
    spec = spec.resize(64, 64)
    params = init_params(spec, seed=0)
    rng = np.random.RandomState(0)
    xs = rng.uniform(0, 1, (K, B, 64, 64, 3)).astype(np.float32)
    ts = np.zeros((K, B, 30, 5), np.float32)
    ts[:, :, 0] = [0.5, 0.5, 0.4, 0.4, 3]

    # sequential reference, following multi_step's split discipline
    p = jax.tree.map(jnp.asarray, params)
    st = TrainState(p, init_velocity(p), jnp.asarray(0))
    step = jax.jit(make_train_step(spec))
    r = jax.random.PRNGKey(7)
    seq_losses = []
    for k in range(K):
        r, sub = jax.random.split(r)
        st, m = step(st, jnp.asarray(xs[k]), jnp.asarray(ts[k]), sub)
        seq_losses.append(float(m["loss"]))

    p2 = jax.tree.map(jnp.asarray, params)
    st2 = TrainState(p2, init_velocity(p2), jnp.asarray(0))
    multi = jax.jit(make_multi_step(spec))
    st2, ms = multi(st2, jnp.asarray(xs), jnp.asarray(ts),
                    jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(ms["loss"], np.float64),
                               seq_losses, rtol=1e-6)
    assert int(st2.seen) == int(st.seen) == K * B
    for a, b in zip(jax.tree.leaves(st.params),
                    jax.tree.leaves(st2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
