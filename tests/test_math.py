"""Special math parity vs scipy (reference test/test_math.py oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.special as sp

from d3d_tpu.ops import special


def test_i0e_i1e_parity(rng):
    x = (rng.random(100) * 20 - 10).astype(np.float64)
    assert np.allclose(special.i0e(x), sp.i0e(x), atol=1e-7)
    assert np.allclose(special.i1e(x), sp.i1e(x), atol=1e-7)


def test_i0e_grad():
    # d/dx i0e(x) = i1e(x) - sign(x) * i0e(x); check against FD
    f = lambda v: special.i0e(jnp.asarray(v))
    for x0 in (0.7, 3.0, -1.3):
        g = float(jax.grad(f)(jnp.asarray(x0)))
        h = 1e-6
        fd = (sp.i0e(x0 + h) - sp.i0e(x0 - h)) / (2 * h)
        assert abs(g - fd) < 1e-6


def test_helpers():
    assert special.wmean(1.0, 1.0, 3.0, 3.0) == 2.5
    assert abs(special.diffnorm3([0, 0, 0], [1, 2, 2]) - 3.0) < 1e-12
    # identical quaternions -> zero angle; 90deg z-rotation vs identity -> pi/2
    qi = np.array([0, 0, 0, 1.0])
    qz = np.array([0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)])
    assert special.quatdiff(qi, qi) < 1e-9
    assert abs(special.quatdiff(qi, qz) - np.pi / 2) < 1e-9
