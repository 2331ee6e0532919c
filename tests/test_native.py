"""Native C++ geometry oracle: cross-validate the JAX kernels against the
independent Sutherland-Hodgman implementation."""

import numpy as np
import pytest

from d3d_tpu import native
from d3d_tpu.ops.box import box2d_iou, box2d_nms, crop_mask_2dr

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ toolchain unavailable")


def _boxes(rng, n):
    return np.stack([
        rng.random(n) * 20,
        rng.random(n) * 20,
        rng.random(n) * 6 + 1,
        rng.random(n) * 6 + 1,
        rng.random(n) * 6 - 3,
    ], axis=1)


def test_iou_cross_validation(rng):
    b1 = _boxes(rng, 48)
    b2 = _boxes(rng, 32)
    jax_iou = box2d_iou(b1, b2, method="rbox")
    cpp_iou = native.rbox_iou_matrix(b1, b2)
    assert np.allclose(jax_iou, cpp_iou, atol=1e-9)
    assert np.allclose(box2d_iou(b1, b2, method="box"),
                       native.aabox_iou_matrix(b1, b2), atol=1e-9)


def test_nms_cross_validation(rng):
    b = _boxes(rng, 100)
    s = rng.random(100)
    for thr in (0.1, 0.3, 0.6):
        jax_keep = box2d_nms(b, s, iou_method="rbox", iou_threshold=thr)
        cpp_keep = native.nms2d(b, s, iou_method="rbox", iou_threshold=thr)
        assert np.array_equal(jax_keep, cpp_keep), thr


def test_contains_cross_validation(rng):
    b = _boxes(rng, 16)
    p = rng.random((256, 2)) * 20
    jax_mask = np.asarray(crop_mask_2dr(p, b))
    cpp_mask = native.box2dr_contains(b, p)
    assert np.array_equal(jax_mask, cpp_mask)


BOUNDS = np.asarray([0.0, 8.0, -4.0, 4.0, -2.0, 2.0])
SHAPE = (16, 16, 4)


def _cloud(rng, n=4000):
    # 20% of points outside the bounds, some negative fractional cells
    pts = np.stack([
        rng.random(n) * 10 - 1,
        rng.random(n) * 10 - 5,
        rng.random(n) * 5 - 2.5,
        rng.random(n),
    ], axis=1).astype(np.float32)
    return pts


@pytest.mark.parametrize("reduction", ["mean", "max", "min"])
def test_voxelize_dense_cross_validation(rng, reduction):
    """XLA sort+segment dense voxelizer vs the independent hash-map C++
    oracle: identical encounter-order ids, coords, counts, pmask, voxel
    tensor; aggregates to f32-accumulation tolerance."""
    import jax.numpy as jnp

    from d3d_tpu.ops.voxel import voxelize_dense_padded

    pts = _cloud(rng)
    max_points, max_voxels = 8, 300  # force both caps to bite
    got = voxelize_dense_padded(jnp.asarray(pts), SHAPE,
                                jnp.asarray(BOUNDS, jnp.float32),
                                max_points, max_voxels, reduction)
    want = native.voxelize_dense(pts, SHAPE, BOUNDS, max_points, max_voxels,
                                 reduction=reduction)
    nv = want["nvoxels"]
    assert int(got.nvoxels) == nv and 0 < nv <= max_voxels
    np.testing.assert_array_equal(np.asarray(got.coords)[:nv],
                                  want["coords"][:nv])
    np.testing.assert_array_equal(np.asarray(got.voxel_npoints)[:nv],
                                  want["voxel_npoints"][:nv])
    np.testing.assert_array_equal(np.asarray(got.voxel_pmask),
                                  want["voxel_pmask"])
    # voxel tensor entries are copied values: exact
    np.testing.assert_array_equal(np.asarray(got.voxels)[:nv],
                                  want["voxels"][:nv].astype(np.float32))
    # "mean" uses an f32 cumsum-difference on device: the running sum grows
    # to O(n * |x|), so per-voxel totals carry O(n * |x| * eps_f32) absolute
    # error vs the oracle's direct f64 summation (~1e-3 here)
    tol = 2e-3 if reduction == "mean" else 0.0
    np.testing.assert_allclose(np.asarray(got.aggregates)[:nv],
                               want["aggregates"][:nv], rtol=tol, atol=tol)


def test_voxelize_sparse_cross_validation(rng):
    import jax.numpy as jnp

    from d3d_tpu.ops.voxel import voxelize_sparse_padded

    # non-dyadic voxel size: f64 cell arithmetic in the oracle would
    # disagree with the device's f32 floors for ~3/million points — the
    # oracle mirrors the f32 path exactly
    pts = _cloud(rng, 1500)
    got = voxelize_sparse_padded(jnp.asarray(pts), jnp.float32(0.37))
    want = native.voxelize_sparse(pts, 0.37)
    nv = want["nvoxels"]
    assert int(got.nvoxels) == nv
    np.testing.assert_array_equal(np.asarray(got.points_mapping),
                                  want["points_mapping"])
    np.testing.assert_array_equal(np.asarray(got.coords)[:nv],
                                  want["coords"])
    np.testing.assert_array_equal(np.asarray(got.voxel_npoints)[:nv],
                                  want["voxel_npoints"])
