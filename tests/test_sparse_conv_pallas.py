"""Fused Pallas submanifold conv (interpret mode on CPU): forward and
gradient parity against the XLA gather+einsum formulation in
:func:`d3d_tpu.ops.sparse_conv.subm_conv_apply`, for both the
centrosymmetric (submanifold) backward and the general scatter-add
fallback (strided maps)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from d3d_tpu.ops.sparse_conv import (build_neighbor_map,
                                     build_neighbor_map_strided,
                                     downsample_coords, kernel_offsets,
                                     subm_conv_apply)
from d3d_tpu.ops.sparse_conv_pallas import fused_supported, subm_conv_fused

GRID = (8, 10, 6)


def _active_sites(rng, n_active, n_pad):
    all_cells = np.stack(np.meshgrid(*[np.arange(g) for g in GRID],
                                     indexing="ij"), -1).reshape(-1, 3)
    pick = rng.choice(len(all_cells), size=n_active, replace=False)
    coords = np.zeros((n_pad, 3), np.int32)
    coords[:n_active] = all_cells[pick]
    coords[n_active:] = 7
    valid = np.zeros(n_pad, bool)
    valid[:n_active] = True
    return jnp.asarray(coords), jnp.asarray(valid)


def _problem(rng, c_in=5, c_out=7, n_active=48, n_pad=64):
    coords, valid = _active_sites(rng, n_active, n_pad)
    feats = jnp.asarray(rng.normal(size=(n_pad, c_in)), jnp.float32)
    feats = feats * valid[:, None]
    w = jnp.asarray(rng.normal(size=(27, c_in, c_out)), jnp.float32)
    nbr = build_neighbor_map(coords, valid, GRID)
    return coords, valid, feats, w, nbr


@pytest.mark.parametrize("ks", [3, 5])
def test_offsets_centrosymmetric(ks):
    """The symmetric backward relies on offs[K-1-k] == -offs[k]."""
    offs = np.asarray(kernel_offsets(ks))
    np.testing.assert_array_equal(offs[::-1], -offs)


def test_forward_parity_submanifold(rng):
    _, valid, feats, w, nbr = _problem(rng)
    want = np.asarray(subm_conv_apply(feats, nbr, w, valid))
    assert fused_supported(feats, nbr)
    got = np.asarray(subm_conv_fused(feats, nbr, w, valid, True, True))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_forward_parity_strided(rng):
    """The fused forward is a general gather — also valid for strided maps
    (same padded row count); only the backward differs (scatter path)."""
    coords, valid = _active_sites(rng, 48, 64)
    feats = jnp.asarray(rng.normal(size=(64, 4)), jnp.float32)
    feats = feats * valid[:, None]
    w = jnp.asarray(rng.normal(size=(27, 4, 6)), jnp.float32)
    oc, ov = downsample_coords(coords, valid, GRID, stride=2)
    nbr = build_neighbor_map_strided(oc, ov, coords, valid, GRID, stride=2)
    want = np.asarray(subm_conv_apply(feats, nbr, w, ov))
    got = np.asarray(subm_conv_fused(feats, nbr, w, ov, False, True))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_grad_parity_symmetric(rng):
    _, valid, feats, w, nbr = _problem(rng)
    cot = jnp.asarray(rng.normal(size=(64, 7)), jnp.float32)

    def loss_ref(f, ww):
        return jnp.sum(subm_conv_apply(f, nbr, ww, valid) * cot)

    def loss_fused(f, ww):
        return jnp.sum(subm_conv_fused(f, nbr, ww, valid, True, True) * cot)

    df_ref, dw_ref = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    df_got, dw_got = jax.grad(loss_fused, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(df_got), np.asarray(df_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_got), np.asarray(dw_ref),
                               rtol=1e-5, atol=1e-5)


def test_grad_parity_general_strided(rng):
    coords, valid = _active_sites(rng, 48, 64)
    feats = jnp.asarray(rng.normal(size=(64, 4)), jnp.float32)
    feats = feats * valid[:, None]
    w = jnp.asarray(rng.normal(size=(27, 4, 6)), jnp.float32)
    oc, ov = downsample_coords(coords, valid, GRID, stride=2)
    nbr = build_neighbor_map_strided(oc, ov, coords, valid, GRID, stride=2)
    cot = jnp.asarray(rng.normal(size=(64, 6)), jnp.float32)

    def loss_ref(f, ww):
        return jnp.sum(subm_conv_apply(f, nbr, ww, ov) * cot)

    def loss_fused(f, ww):
        return jnp.sum(subm_conv_fused(f, nbr, ww, ov, False, True) * cot)

    df_ref, dw_ref = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    df_got, dw_got = jax.grad(loss_fused, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(df_got), np.asarray(df_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_got), np.asarray(dw_ref),
                               rtol=1e-5, atol=1e-5)


def test_padded_query_strided_parity(rng):
    """The TPU dispatch pads strided maps with fewer query rows than
    input rows (downsample cap < N) to operand shape and slices; the
    padded form must agree with the XLA strided path, grads included."""
    coords, valid = _active_sites(rng, 48, 64)
    feats = jnp.asarray(rng.normal(size=(64, 4)), jnp.float32)
    feats = feats * valid[:, None]
    w = jnp.asarray(rng.normal(size=(27, 4, 6)), jnp.float32)
    oc, ov = downsample_coords(coords, valid, GRID, stride=2, max_out=40)
    nbr = build_neighbor_map_strided(oc, ov, coords, valid, GRID, stride=2)
    assert nbr.shape[0] == 40 < 64
    nq = nbr.shape[0]
    nbr_full = jnp.concatenate(
        [nbr, jnp.full((64 - nq, 27), -1, nbr.dtype)])
    ov_full = jnp.concatenate([ov, jnp.zeros(64 - nq, bool)])
    cot = jnp.asarray(rng.normal(size=(nq, 6)), jnp.float32)

    def loss_ref(f, ww):
        return jnp.sum(subm_conv_apply(f, nbr, ww, ov) * cot)

    def loss_fused(f, ww):
        return jnp.sum(
            subm_conv_fused(f, nbr_full, ww, ov_full, False, True)[:nq]
            * cot)

    np.testing.assert_allclose(
        np.asarray(subm_conv_fused(feats, nbr_full, w, ov_full, False,
                                   True)[:nq]),
        np.asarray(subm_conv_apply(feats, nbr, w, ov)),
        rtol=2e-6, atol=2e-6)
    df_ref, dw_ref = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    df_got, dw_got = jax.grad(loss_fused, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(df_got), np.asarray(df_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_got), np.asarray(dw_ref),
                               rtol=1e-5, atol=1e-5)


def test_bf16_features(rng):
    """bf16 activations: fused accumulates f32 and casts back like the
    XLA path with preferred_element_type."""
    _, valid, feats, w, nbr = _problem(rng, c_in=8, c_out=8)
    fb = feats.astype(jnp.bfloat16)
    got = subm_conv_fused(fb, nbr, w, valid, True, True)
    assert got.dtype == jnp.bfloat16
    want = np.asarray(subm_conv_apply(fb, nbr, w, valid)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(got).astype(np.float32), want,
                               rtol=2e-2, atol=2e-2)


def test_vmapped_forward(rng):
    """The batched model path vmaps the conv; the kernel must batch."""
    probs = [_problem(rng) for _ in range(2)]
    feats = jnp.stack([p[2] for p in probs])
    nbrs = jnp.stack([p[4] for p in probs])
    valids = jnp.stack([p[1] for p in probs])
    w = probs[0][3]
    got = jax.vmap(lambda f, n, v: subm_conv_fused(f, n, w, v, True, True))(
        feats, nbrs, valids)
    for i, (_, valid, f, _, nbr) in enumerate(probs):
        want = np.asarray(subm_conv_apply(f, nbr, w, valid))
        np.testing.assert_allclose(np.asarray(got[i]), want, rtol=2e-6,
                                   atol=2e-6)
