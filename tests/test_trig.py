"""Precise f64 trig: accuracy vs numpy's libm across argument ranges and
array sizes (including the small-array shapes where the backend's native
path is only f32-accurate — see d3d_tpu/ops/trig.py docstring)."""

import jax
import jax.numpy as jnp
import numpy as np

from d3d_tpu.ops import trig


def test_accuracy_scalar_and_vector():
    args = np.array([0.0, 0.3, 0.9, 1.2, 1.87, 3.0, 6.0, -2.5, -6.1, 100.0, -314.15])

    @jax.jit
    def f(x):
        return trig.sincos(x)

    # whole vector
    s, c = f(jnp.asarray(args))
    assert np.abs(np.asarray(s) - np.sin(args)).max() < 5e-16
    assert np.abs(np.asarray(c) - np.cos(args)).max() < 5e-16

    # scalar (0-d) path — the shape that breaks the native backend op
    for a in args:
        s, c = f(jnp.asarray(a))
        assert abs(float(s) - np.sin(a)) < 5e-16, a
        assert abs(float(c) - np.cos(a)) < 5e-16, a


def test_grad():
    g = jax.grad(trig.sin)(jnp.asarray(0.7))
    assert abs(float(g) - np.cos(0.7)) < 1e-12
    g = jax.grad(trig.cos)(jnp.asarray(0.7))
    assert abs(float(g) + np.sin(0.7)) < 1e-12


def test_f32_passthrough():
    x = jnp.asarray(np.float32(1.87))
    s, c = trig.sincos(x)
    assert s.dtype == jnp.float32
    assert abs(float(s) - np.sin(1.87)) < 1e-6
