"""Dense-canvas middle extractor == sparse stage loop.

The dense path (models/second.dense_stage_loop) runs the identical
parameter tree through masked dense 3D convs instead of neighbor-map
gathers; below the sparse path's site caps the two must agree exactly
(same scatter order, f32 convs) up to matmul reassociation.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from d3d_tpu.models.second import (SECOND, SECONDConfig, dense_stage_loop,
                                   sparse_stage_loop)

CFG = SECONDConfig(grid=(16, 16, 8), max_voxels=256,
                   stage_channels=(8, 16), stage_sites=(256, 256),
                   subm_per_stage=2, head_channels=16, middle="sparse")


def _batch(rng, b=2, n_active=120):
    cells = np.stack(np.meshgrid(*[np.arange(g) for g in CFG.grid],
                                 indexing="ij"), -1).reshape(-1, 3)
    feats = np.zeros((b, CFG.max_voxels, 4), np.float32)
    coords = np.zeros((b, CFG.max_voxels, 3), np.int32)
    valid = np.zeros((b, CFG.max_voxels), bool)
    for i in range(b):
        pick = rng.choice(len(cells), n_active, replace=False)
        coords[i, :n_active] = cells[pick]
        valid[i, :n_active] = True
        feats[i, :n_active] = rng.normal(size=(n_active, 4))
    feats *= valid[..., None]
    return jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(3)
    feats, coords, valid = _batch(rng)
    model = SECOND(CFG)
    variables = model.init(jax.random.PRNGKey(0), feats, coords, valid)
    return feats, coords, valid, variables


def _densify(x, coords, valid, grid):
    out = np.zeros(x.shape[:1] + tuple(grid) + x.shape[-1:], np.float32)
    c = np.asarray(coords)
    v = np.asarray(valid)
    for i in range(x.shape[0]):
        out[i, c[i, v[i], 0], c[i, v[i], 1], c[i, v[i], 2]] = \
            np.asarray(x)[i, v[i]]
    return out


def test_forward_parity(problem):
    feats, coords, valid, variables = problem
    sparse_cfg = CFG
    dense_cfg = dataclasses.replace(CFG, middle="dense")
    out_s = SECOND(sparse_cfg).apply(variables, feats, coords, valid)
    out_d = SECOND(dense_cfg).apply(variables, feats, coords, valid)
    for a, b in zip(out_s, out_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4)


def test_stage_loop_parity(problem):
    """Stage-level check: the dense canvas equals the densified sparse
    active-site features at the final stage."""
    feats, coords, valid, variables = problem

    import flax.linen as nn

    class SparseTrunk(nn.Module):
        @nn.compact
        def __call__(self, f, c, v):
            return sparse_stage_loop(CFG, f, c, v, False)

    class DenseTrunk(nn.Module):
        @nn.compact
        def __call__(self, f, c, v):
            return dense_stage_loop(CFG, f, c, v, False)

    x, oc, ov, fg = SparseTrunk().apply({"params": variables["params"],
                                         "batch_stats":
                                         variables["batch_stats"]},
                                        feats, coords, valid)
    canvas, mask = DenseTrunk().apply({"params": variables["params"],
                                       "batch_stats":
                                       variables["batch_stats"]},
                                      feats, coords, valid)
    assert canvas.shape[1:4] == fg
    want = _densify(x, oc, ov, fg)
    np.testing.assert_allclose(np.asarray(canvas), want,
                               atol=2e-4, rtol=1e-4)
    # mask == the sparse active set
    want_mask = _densify(np.asarray(ov, np.float32)[..., None], oc, ov,
                         fg)[..., 0] > 0
    np.testing.assert_array_equal(np.asarray(mask), want_mask)


def test_grad_and_bn_parity(problem):
    feats, coords, valid, variables = problem
    dense_cfg = dataclasses.replace(CFG, middle="dense")

    def loss(params, cfg):
        out, upd = SECOND(cfg).apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feats, coords, valid, train=True, mutable=["batch_stats"])
        return sum(jnp.sum(jnp.abs(o)) for o in out), upd["batch_stats"]

    (l_s, bs_s), g_s = jax.value_and_grad(loss, has_aux=True)(
        variables["params"], CFG)
    (l_d, bs_d), g_d = jax.value_and_grad(loss, has_aux=True)(
        variables["params"], dense_cfg)
    assert abs(float(l_s) - float(l_d)) < 2e-2 * max(1.0, abs(float(l_s)))
    for (ka, a), (kb, b) in zip(jax.tree_util.tree_leaves_with_path(g_s),
                                jax.tree_util.tree_leaves_with_path(g_d)):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=5e-3,
                                   err_msg=str(ka))
    # train-mode BN running stats advance identically
    for (ka, a), (kb, b) in zip(jax.tree_util.tree_leaves_with_path(bs_s),
                                jax.tree_util.tree_leaves_with_path(bs_d)):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5, err_msg=str(ka))
