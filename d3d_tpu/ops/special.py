"""Special math for von-Mises-style uncertainty losses and evaluator
accumulation (reference d3d/math: Chebyshev i0e/i1e ports of Cephes,
d3d/math/bessel.h; inline wmean/diffnorm3/quatdiff helpers consumed by
benchmarks.pyx:19-21).

On TPU the exponentially-scaled Bessel functions are native XLA ops
(jax.scipy.special), already differentiable — the reference's hand-written
autograd wrapper (whose backward returns i1e(grad) instead of grad*i1e'(x),
noted as a bug in SURVEY.md §2.5) is replaced by correct autodiff.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import i0e as _i0e, i1e as _i1e

__all__ = ["i0e", "i1e", "wmean", "diffnorm3", "quatdiff"]


def i0e(x):
    """Exponentially scaled modified Bessel function of order 0."""
    convert = isinstance(x, np.ndarray) or np.isscalar(x)
    out = _i0e(jnp.asarray(x))
    return np.asarray(out) if convert else out


def i1e(x):
    """Exponentially scaled modified Bessel function of order 1."""
    convert = isinstance(x, np.ndarray) or np.isscalar(x)
    out = _i1e(jnp.asarray(x))
    return np.asarray(out) if convert else out


def wmean(mean1, w1, mean2, w2):
    """Weighted mean combine; zero-weight sides pass the other through (so a
    NaN placeholder with weight 0 does not poison the merge — reference
    d3d/math/__init__.pxd:4-9)."""
    if w1 == 0:
        return mean2
    if w2 == 0:
        return mean1
    return (mean1 * w1 + mean2 * w2) / (w1 + w2)


def diffnorm3(p1, p2):
    """Euclidean distance between 3-vectors (d3d/math/__init__.pxd:11-18)."""
    p1 = np.asarray(p1, dtype=np.float64)
    p2 = np.asarray(p2, dtype=np.float64)
    return np.linalg.norm(p1 - p2, axis=-1)


def quatdiff(q1, q2):
    """Relative rotation angle between two (x, y, z, w) quaternions in
    [0, pi] (reference benchmarks.pyx:43-57 computes the angle of the
    difference rotation)."""
    q1 = np.asarray(q1, dtype=np.float64)
    q2 = np.asarray(q2, dtype=np.float64)
    dot = np.clip(np.abs(np.sum(q1 * q2, axis=-1)), 0.0, 1.0)
    return 2.0 * np.arccos(dot)
