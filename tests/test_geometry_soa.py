"""SoA rotated-IoU kernel: exact agreement with the AoS reference
implementation (values and gradients) across fuzz cases."""

import jax
import jax.numpy as jnp
import numpy as np

from d3d_tpu.ops import geometry as G
from d3d_tpu.ops import geometry_soa as S


def _boxes(rng, n):
    return np.stack([
        rng.random(n) * 20,
        rng.random(n) * 20,
        rng.random(n) * 6 + 1,
        rng.random(n) * 6 + 1,
        rng.random(n) * 6 - 3,
    ], axis=1)


def test_matches_aos_fuzz(rng):
    b = jnp.asarray(_boxes(rng, 64))
    aos = np.asarray(G.rbox_iou(b[:, None], b[None, :]))
    soa = np.asarray(S.rbox_iou(b[:, None], b[None, :]))
    assert np.allclose(aos, soa, atol=1e-9)


def test_oracles(rng):
    eps = 1e-3
    b1 = jnp.asarray(np.array([[0, 0, 2, 2, 0.0], [-1, 1, 2, 2, 0], [1, 1, 2, 2, 0]], float))
    b2 = jnp.asarray(np.array([
        [-1, 1, 2 * np.sqrt(2) - eps, 2 * np.sqrt(2) - eps, np.pi / 4 - eps],
        [1, 1, np.sqrt(2) + eps, np.sqrt(2) + eps, np.pi / 4 + eps],
    ]))
    expected = np.array([[1 / 5, 1 / 11], [1 / 2, 0], [1 / 11, 1 / 2]])
    got = np.asarray(S.rbox_iou(b1[:, None], b2[None, :]))
    assert np.allclose(got, expected, atol=4e-3)


def test_grad_matches_aos(rng):
    b1 = jnp.asarray(np.array([0.1, 0.2, 2.0, 3.0, 0.3]))
    b2 = jnp.asarray(np.array([0.8, -0.3, 2.5, 1.5, -0.5]))
    g_aos = jax.grad(lambda a: G.rbox_iou(a, b2))(b1)
    g_soa = jax.grad(lambda a: S.rbox_iou(a, b2))(b1)
    assert np.allclose(np.asarray(g_aos), np.asarray(g_soa), atol=1e-9)


def test_f32_path(rng):
    b = jnp.asarray(_boxes(rng, 32), jnp.float32)
    m = np.asarray(S.rbox_iou(b[:, None], b[None, :]))
    assert np.allclose(np.diag(m), 1.0, atol=1e-4)
    assert m.min() >= 0 and m.max() <= 1 + 1e-5
