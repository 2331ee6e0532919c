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


def _adversarial_boxes(rng, n):
    """Edge-case generator: degenerate aspect ratios, tiny/huge dims,
    yaws at exact multiples of pi/2, coincident centers, shared edges."""
    kinds = rng.integers(0, 6, n)
    cx = rng.random(n) * 20
    cy = rng.random(n) * 20
    l = rng.random(n) * 6 + 1
    w = rng.random(n) * 6 + 1
    yaw = rng.random(n) * 6 - 3
    # thin slivers
    w = np.where(kinds == 0, 1e-3, w)
    # huge boxes
    l = np.where(kinds == 1, 500.0, l)
    # exact axis-aligned yaw
    yaw = np.where(kinds == 2,
                   rng.integers(-2, 3, n) * (np.pi / 2), yaw)
    # near-identical pairs: copy the previous row with a 1e-7 nudge
    b = np.stack([cx, cy, l, w, yaw], axis=1)
    dup = np.nonzero(kinds == 3)[0]
    dup = dup[dup > 0]
    b[dup] = b[dup - 1] + 1e-7
    # edge-sharing squares
    edge = np.nonzero(kinds == 4)[0]
    b[edge, 2:4] = 2.0
    b[edge, 4] = 0.0
    edge2 = edge[edge > 0]
    b[edge2, 0] = b[edge2 - 1, 0] + b[edge2 - 1, 2] / 2 + 1.0
    return b


def test_iou_adversarial_cross_validation(rng):
    """Degenerate geometry must agree with the independent C++ clip to
    f64 tolerance (slivers, pi/2 yaws, coincident boxes, shared edges)."""
    for trial in range(6):
        b1 = _adversarial_boxes(rng, 40)
        b2 = _adversarial_boxes(rng, 24)
        jax_iou = np.asarray(box2d_iou(b1, b2, method="rbox"))
        cpp_iou = native.rbox_iou_matrix(b1, b2)
        np.testing.assert_allclose(jax_iou, cpp_iou, rtol=0, atol=1e-7,
                                   err_msg=f"trial {trial}")
        assert (jax_iou >= -1e-12).all() and (jax_iou <= 1 + 1e-9).all()
        # self-IoU of every box is 1 (or 0 only for zero-area slivers)
        self_iou = np.diag(np.asarray(box2d_iou(b1, b1, method="rbox")))
        assert np.all((np.abs(self_iou - 1) < 1e-6) | (b1[:, 2] * b1[:, 3] < 1e-9))


def test_nms_adversarial_cross_validation(rng):
    for trial in range(4):
        b = _adversarial_boxes(rng, 64)
        s = rng.random(64)
        for thr in (0.05, 0.5):
            jax_keep = np.asarray(box2d_nms(b, s, iou_method="rbox",
                                            iou_threshold=thr))
            cpp_keep = native.nms2d(b, s, iou_method="rbox",
                                    iou_threshold=thr)
            assert np.array_equal(jax_keep, cpp_keep), (trial, thr)


def test_voxelize_boundary_points_cross_validation(rng):
    """Points EXACTLY on cell boundaries (the classic floor-vs-round
    divergence) and duplicated/out-of-bounds points must bucket
    identically to the C++ oracle, which mirrors the device's f32 cell
    arithmetic."""
    import jax.numpy as jnp

    from d3d_tpu.ops.voxel import voxelize_dense_padded

    xmin, xmax, ymin, ymax, zmin, zmax = BOUNDS
    vx = (xmax - xmin) / SHAPE[0]
    vy = (ymax - ymin) / SHAPE[1]
    # grid-line lattice points + exact bounds corners + duplicates + oob
    gx = xmin + np.arange(0, SHAPE[0] + 1) * vx
    gy = ymin + np.arange(0, SHAPE[1] + 1) * vy
    xs = rng.choice(gx, 256)
    ys = rng.choice(gy, 256)
    zs = rng.choice([zmin, 0.0, zmax - 1e-6, zmax], 256)
    pts = np.stack([xs, ys, zs, rng.random(256)], axis=1)
    pts = np.concatenate([pts, pts[:32],                      # duplicates
                          pts[:16] + [1e3, 0, 0, 0]])         # far oob
    pts = pts.astype(np.float32)

    got = voxelize_dense_padded(jnp.asarray(pts), SHAPE,
                                jnp.asarray(BOUNDS, jnp.float32),
                                8, 300, "mean")
    want = native.voxelize_dense(pts, SHAPE, BOUNDS, 8, 300,
                                 reduction="mean")
    nv = want["nvoxels"]
    assert int(got.nvoxels) == nv
    np.testing.assert_array_equal(np.asarray(got.coords)[:nv],
                                  want["coords"][:nv])
    np.testing.assert_array_equal(np.asarray(got.voxel_npoints)[:nv],
                                  want["voxel_npoints"][:nv])
    # every in-bounds coord is inside the grid
    c = want["coords"][:nv]
    assert (c >= 0).all() and (c < np.asarray(SHAPE)).all()
