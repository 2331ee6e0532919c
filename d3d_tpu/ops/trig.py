"""Precise float64 sin/cos.

The XLA backend in this environment evaluates f64 `sin`/`cos` through an
f32-accurate scalar path for small arrays (measured: cos(0.3) off by 1.5e-8
on 0-d inputs while 4+-element vectors are exact to 1e-15). The rotated-box
geometry core advertises a `precise` fp64 contract (reference README.md:31),
so we cannot depend on backend libm behavior at all.

This module computes sin/cos with explicit Cody-Waite range reduction and
Taylor polynomials — plain f64 arithmetic only, accurate to ~1e-16 ulp-scale
for |x| <~ 1e6 on any backend. For non-f64 dtypes the native ops are used
(model code in bf16/f32 doesn't need this).
"""

import jax
import jax.numpy as jnp

__all__ = ["sincos", "sin", "cos"]

# pi/2 split with a 33-bit head so k * _PI2_1 is exact for |k| < 2^20
# (fdlibm-style Cody-Waite constants)
_PI2_1 = 1.57079632673412561417e00
_PI2_1T = 6.07710050650619224932e-11
_PI2_2T = 2.02226624879595063154e-21

# Taylor coefficients (exact rationals rounded to f64); remainder at
# |x| <= pi/4 is < 1.1e-19 for sin (x^19/19!) and < 1.3e-18 for cos (x^18/18!)
_SIN_C = [
    -1.0 / 6,
    1.0 / 120,
    -1.0 / 5040,
    1.0 / 362880,
    -1.0 / 39916800,
    1.0 / 6227020800,
    -1.0 / 1307674368000,
    1.0 / 355687428096000,
]
_COS_C = [
    -1.0 / 2,
    1.0 / 24,
    -1.0 / 720,
    1.0 / 40320,
    -1.0 / 3628800,
    1.0 / 479001600,
    -1.0 / 87178291200,
    1.0 / 20922789888000,
    -1.0 / 6402373705728000,
]


def _poly_sin(x):
    x2 = x * x
    acc = jnp.zeros_like(x)
    for c in reversed(_SIN_C):
        acc = (acc + c) * x2
    return x + x * acc


def _poly_cos(x):
    x2 = x * x
    acc = jnp.zeros_like(x)
    for c in reversed(_COS_C[1:]):
        acc = (acc + c) * x2
    return 1.0 + x2 * (_COS_C[0] + acc)


def sincos(x):
    """Return (sin(x), cos(x)) accurately for any input size/backend."""
    if x.dtype != jnp.float64:
        return jnp.sin(x), jnp.cos(x)
    k = jnp.round(x * (2.0 / jnp.pi))
    # |r| <= pi/4 + tiny slack; accurate to ~1ulp for |x| < ~1e6.
    # optimization_barrier stops XLA's algebraic simplifier from merging
    # k*_PI2_1 + k*_PI2_1T into k*(pi/2) (measured: it does, costing 2e-13).
    r = jax.lax.optimization_barrier(x - k * _PI2_1)
    r = jax.lax.optimization_barrier(r - k * _PI2_1T)
    r = r - k * _PI2_2T
    s, c = _poly_sin(r), _poly_cos(r)
    q = jnp.asarray(k, jnp.int64) & 3
    sin_x = jnp.where(
        q == 0, s, jnp.where(q == 1, c, jnp.where(q == 2, -s, -c))
    )
    cos_x = jnp.where(
        q == 0, c, jnp.where(q == 1, -s, jnp.where(q == 2, -c, s))
    )
    return sin_x, cos_x


def sin(x):
    return sincos(x)[0]


def cos(x):
    return sincos(x)[1]
