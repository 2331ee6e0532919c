"""VoxelGenerator tests: invariants + spconv `VoxelGeneratorV2` parity via
the stored dump (fixture copied from the reference test data,
/root/reference/test/voxel_data.npz; semantics per test_voxel.py there)."""

import os

import numpy as np
import pytest

from d3d_tpu.ops.voxel import VoxelGenerator

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "voxel_data.npz")


@pytest.fixture
def cloud(rng):
    c = rng.random((2000, 4), dtype=np.float32)
    outliers = np.array([[-1, -1, -1, -100], [-2, -2, -2, 100]], dtype=np.float32)
    return np.concatenate([c, outliers], axis=0)


class TestDense:
    def test_generate_voxel_mean(self, cloud):
        gen = VoxelGenerator([0, 1, 0, 1, 0, 1], [10, 10, 10], reduction="mean",
                             max_points=5, max_voxels=20000,
                             max_points_filter="trim", max_voxels_filter="trim",
                             dense=True)
        data = gen(cloud)
        assert len(data.voxels) == len(data.coords)
        assert len(data.voxels) <= 1000
        # only filled slots carry point data
        filled = data.voxels[data.voxel_pmask]
        assert np.all((filled >= 0) & (filled <= 1))
        assert np.all((data.coords >= 0) & (data.coords <= 10))
        assert "aggregates" in data
        # coordinate consistency: every stored point falls in its voxel cell
        for i in range(len(data.voxels)):
            for j in range(min(data.voxel_npoints[i], 5)):
                for k in range(3):
                    assert data.coords[i, k] == int(data.voxels[i, j, k] * 10)
        # mean aggregate averages over ALL encountered points
        dense_pts = cloud[np.all((cloud[:, :3] >= 0) & (cloud[:, :3] < 1), axis=1)]
        cell = tuple(data.coords[0])
        sel = dense_pts[
            np.all((dense_pts[:, :3] * 10).astype(np.int64) == np.array(cell), axis=1)
        ]
        assert np.allclose(data.aggregates[0], sel.mean(axis=0), atol=1e-5)

    def test_generate_voxel_none(self, cloud):
        gen = VoxelGenerator([0, 1, 0, 1, 0, 1], [10, 10, 10], reduction="none",
                             max_points=5, max_voxels=20000,
                             max_points_filter="trim", max_voxels_filter="trim",
                             dense=True)
        data = gen(cloud)
        assert "aggregates" not in data
        assert len(data.voxels) == len(data.coords) <= 1000

    def test_max_voxels_order(self, cloud):
        """TRIM keeps the first-encountered voxels."""
        full = VoxelGenerator([0, 1, 0, 1, 0, 1], [10, 10, 10], dense=True)(cloud)
        trimmed = VoxelGenerator([0, 1, 0, 1, 0, 1], [10, 10, 10],
                                 max_voxels=50, dense=True)(cloud)
        assert len(trimmed.coords) == 50
        assert np.array_equal(trimmed.coords, full.coords[:50])

    def test_sorted_mode_vs_numpy(self, rng):
        """order_mode="sorted" (the model fast path, with more points than
        max_voxels so the slice branch is exercised): voxel ids ascend with
        the cell key; voxels/npoints/coords/mean match a numpy groupby."""
        import jax.numpy as jnp
        from d3d_tpu.ops.voxel import voxelize_dense_padded

        n, mv, mp = 4000, 50, 4
        pts = (rng.random((n, 4)) * 1.2 - 0.1).astype(np.float32)  # ~some OOB
        shape = (8, 8, 2)
        bounds = jnp.asarray([0, 1, 0, 1, 0, 1], jnp.float32)
        out = voxelize_dense_padded(jnp.asarray(pts), shape, bounds,
                                    mp, mv, "mean", order_mode="sorted")

        cell = np.trunc(pts[:, :3] * np.array([8, 8, 2])).astype(np.int64)
        valid = np.all((cell >= 0) & (cell < np.array([8, 8, 2])), axis=1)
        key = (cell[:, 0] * 8 + cell[:, 1]) * 2 + cell[:, 2]
        kept = np.unique(key[valid])[:mv]  # cell-key order
        assert int(out.nvoxels) == min(len(np.unique(key[valid])), mv)
        for v, k in enumerate(kept):
            sel = np.where(valid & (key == k))[0]
            np.testing.assert_array_equal(
                np.asarray(out.coords[v]),
                [k // 16, (k % 16) // 2, k % 2])
            assert int(out.voxel_npoints[v]) == len(sel)
            got_rows = np.asarray(out.voxels[v][: min(len(sel), mp)])
            np.testing.assert_allclose(got_rows, pts[sel[:mp]], atol=0)
            assert np.allclose(np.asarray(out.aggregates[v]),
                               pts[sel].mean(axis=0), atol=1e-5)

    def test_mean_fm_vs_numpy(self, rng):
        """voxelize_mean_fm (feature-major fixed-point fast path) matches an
        exact float64 numpy groupby to quantization precision, and its
        coords/npoints/nvoxels match the sorted-mode dense path exactly."""
        import jax.numpy as jnp
        from d3d_tpu.ops.voxel import voxelize_dense_padded, voxelize_mean_fm

        n, mv = 4000, 50
        pts = (rng.random((n, 4)) * 1.2 - 0.1).astype(np.float32)
        shape = (8, 8, 2)
        bounds = jnp.asarray([0, 1, 0, 1, 0, 1], jnp.float32)
        ref = voxelize_dense_padded(jnp.asarray(pts), shape, bounds,
                                    4, mv, "mean", order_mode="sorted")
        out = voxelize_mean_fm(jnp.asarray(pts.T), shape, bounds, mv)

        assert int(out.nvoxels) == int(ref.nvoxels)
        np.testing.assert_array_equal(np.asarray(out.coords).T,
                                      np.asarray(ref.coords))
        np.testing.assert_array_equal(np.asarray(out.voxel_npoints),
                                      np.asarray(ref.voxel_npoints))

        cell = np.trunc(pts[:, :3] * np.array([8, 8, 2])).astype(np.int64)
        valid = np.all((cell >= 0) & (cell < np.array([8, 8, 2])), axis=1)
        key = (cell[:, 0] * 8 + cell[:, 1]) * 2 + cell[:, 2]
        agg = np.asarray(out.aggregates).T
        for v, k in enumerate(np.unique(key[valid])[:mv]):
            sel = np.where(valid & (key == k))[0]
            exact = pts[sel].astype(np.float64).mean(axis=0)
            # xyz quantized in-cell (range = voxel size), extras over their
            # global range: both bounded by range / 2^(qbits+1)
            tol = np.array([1 / 8, 1 / 8, 1 / 2, 1.2]) / 2 ** 12
            assert np.all(np.abs(agg[v] - exact) < tol), (v, agg[v], exact)

    def test_mean_fm_exact_vs_numpy(self, rng):
        """voxelize_mean_fm_exact matches a float64 numpy groupby to f32
        rounding (NOT quantization tolerance) and agrees with the sorted
        dense path on structure."""
        import jax.numpy as jnp
        from d3d_tpu.ops.voxel import (voxelize_dense_padded,
                                       voxelize_mean_fm_exact)

        n, mv = 4000, 50
        pts = (rng.random((n, 4)) * 1.2 - 0.1).astype(np.float32)
        shape = (8, 8, 2)
        bounds = jnp.asarray([0, 1, 0, 1, 0, 1], jnp.float32)
        ref = voxelize_dense_padded(jnp.asarray(pts), shape, bounds,
                                    4, mv, "mean", order_mode="sorted")
        out = voxelize_mean_fm_exact(jnp.asarray(pts.T), shape, bounds, mv)

        assert int(out.nvoxels) == int(ref.nvoxels)
        np.testing.assert_array_equal(np.asarray(out.coords).T,
                                      np.asarray(ref.coords))
        np.testing.assert_array_equal(np.asarray(out.voxel_npoints),
                                      np.asarray(ref.voxel_npoints))

        cell = np.trunc(pts[:, :3] * np.array([8, 8, 2])).astype(np.int64)
        valid = np.all((cell >= 0) & (cell < np.array([8, 8, 2])), axis=1)
        key = (cell[:, 0] * 8 + cell[:, 1]) * 2 + cell[:, 2]
        agg = np.asarray(out.aggregates).T
        for v, k in enumerate(np.unique(key[valid])[:mv]):
            sel = np.where(valid & (key == k))[0]
            exact = pts[sel].astype(np.float64).mean(axis=0)
            assert np.all(np.abs(agg[v] - exact) < 2e-6), (v, agg[v], exact)

    def test_mean_fm_exact_kitti_magnitude(self, rng):
        """The exact path's error at KITTI coordinate magnitudes stays at
        the output-f32 reconstruction-ulp floor — the docstring's bound
        (quantization cell x 2^-25 + ~3 finalize ulps), NOT the fixed-point
        path's range/2^15. Guards the two-limb accumulation against
        regressions that would silently fall back to ~1e-5-class error."""
        import jax.numpy as jnp
        from d3d_tpu.ops.voxel import voxelize_mean_fm_exact

        n, mv = 20000, 4000
        pts = np.stack([
            rng.random(n) * 69.12,
            rng.random(n) * 79.36 - 39.68,
            rng.random(n) * 4.0 - 3.0,
            rng.random(n),
        ], axis=1).astype(np.float32)
        shape = (432, 496, 1)
        bounds = jnp.asarray([0, 69.12, -39.68, 39.68, -3, 1], jnp.float32)
        out = voxelize_mean_fm_exact(jnp.asarray(pts.T), shape, bounds, mv)

        b = np.array([0, 69.12, -39.68, 39.68, -3, 1]).reshape(3, 2)
        vs = (b[:, 1] - b[:, 0]) / np.array(shape)
        sc = (pts[:, :3].astype(np.float64) - b[:, 0]) / vs
        cell = np.trunc(sc).astype(np.int64)
        inr = np.all((cell >= 0) & (cell < np.array(shape)), axis=1)
        key = (cell[:, 0] * shape[1] + cell[:, 1]) * shape[2] + cell[:, 2]
        agg = np.asarray(out.aggregates)
        # 8 ulps of the coordinate magnitude + the quantization term —
        # comfortably over the measured ~2-3 ulps, far under range/2^15
        tol = 8 * np.spacing(np.abs(b).max(axis=1).astype(np.float32)) \
            + vs / 2 ** 25
        tol = np.concatenate([tol, [8 * np.spacing(np.float32(1.0))
                                    + 2.0 ** -25]])
        for v, k in enumerate(np.unique(key[inr])[:mv]):
            sel = inr & (key == k)
            exact = pts[sel].astype(np.float64).mean(axis=0)
            assert np.all(np.abs(agg[:, v] - exact) < tol), \
                (v, agg[:, v] - exact, tol)

    def test_mean_fm_exact_padding_and_f3(self, rng):
        """Padding branch + 3-column input of the exact feature-major path."""
        import jax.numpy as jnp
        from d3d_tpu.ops.voxel import voxelize_mean_fm_exact

        pts = (rng.random((30, 3))).astype(np.float32)
        out = voxelize_mean_fm_exact(
            jnp.asarray(pts.T), (4, 4, 4),
            jnp.asarray([0, 1, 0, 1, 0, 1], jnp.float32), 64)
        nv = int(out.nvoxels)
        assert 0 < nv <= 30
        assert int(np.asarray(out.voxel_npoints).sum()) == 30
        cell = np.trunc(pts * 4).astype(np.int64)
        key = (cell[:, 0] * 4 + cell[:, 1]) * 4 + cell[:, 2]
        agg = np.asarray(out.aggregates).T
        for v, k in enumerate(np.unique(key)[:nv]):
            sel = key == k
            exact = pts[sel].astype(np.float64).mean(axis=0)
            assert np.all(np.abs(agg[v] - exact) < 2e-6)

    def test_mean_fm_padding_and_f3(self, rng):
        """N smaller than max_voxels (padding branch) and 3-column points."""
        import jax.numpy as jnp
        from d3d_tpu.ops.voxel import voxelize_mean_fm

        pts = (rng.random((30, 3))).astype(np.float32)
        out = voxelize_mean_fm(jnp.asarray(pts.T), (4, 4, 4),
                               jnp.asarray([0, 1, 0, 1, 0, 1], jnp.float32),
                               64)
        nv = int(out.nvoxels)
        assert 0 < nv <= 30
        assert int(np.asarray(out.voxel_npoints).sum()) == 30
        cell = np.trunc(pts * 4).astype(np.int64)
        key = (cell[:, 0] * 4 + cell[:, 1]) * 4 + cell[:, 2]
        for v, k in enumerate(np.unique(key)[:nv]):
            sel = key == k
            exact = pts[sel].astype(np.float64).mean(axis=0)
            assert np.all(np.abs(np.asarray(out.aggregates)[:, v] - exact)
                          < 1e-3)

    def test_spconv_parity(self):
        gen = VoxelGenerator([0, 1, 0, 1, 0, 1], [10, 10, 10], max_points=5,
                             max_points_filter="trim", dense=True)
        data = np.load(FIXTURE)
        ret = gen(data["cloud"])
        assert np.allclose(ret.voxels, data["voxels"])
        assert np.allclose(ret.coords, data["coords"])


class TestSparse:
    def test_sparse_basic(self, cloud):
        gen = VoxelGenerator([0, 1, 0, 1, 0, 1], [10, 10, 10])
        data = gen(cloud)
        assert len(data.points) == 2000  # outliers filtered by bounds
        assert len(data.coords) <= 1000
        assert np.all((data.points[:, :3] >= 0) & (data.points[:, :3] <= 1))
        assert np.all((data.coords >= 0) & (data.coords <= 10))
        # mapping consistency
        cell = np.floor(data.points[:, :3] * 10).astype(np.int64)
        assert np.array_equal(data.coords[data.points_mapping], cell)
        # npoints consistency
        counts = np.bincount(data.points_mapping, minlength=len(data.coords))
        assert np.array_equal(counts, data.voxel_npoints)

    def test_bound_filter(self, rng):
        cloud = (rng.random((2000, 3), dtype=np.float32) - 0.5) * 4
        gen = VoxelGenerator([-1, 1, -1, 1, -1, 1], [20, 20, 20])
        data = gen(cloud)
        assert np.all((data.points >= -1) & (data.points <= 1))
        assert np.all((data.coords >= 0) & (data.coords <= 20))
        cell = np.floor((data.points + 1) * 10).astype(np.int64)
        assert np.array_equal(data.coords[data.points_mapping], cell)

    def test_max_voxels_filters(self, rng):
        cloud = (rng.random((2000, 3), dtype=np.float32) - 0.5) * 4
        gen = VoxelGenerator([0, 1, 0, 1, 0, 1], [10, 10, 10], max_voxels=10,
                             max_voxels_filter="trim")
        assert len(gen(cloud).coords) <= 10

        gen = VoxelGenerator([0, 1, 0, 1, 0, 1], [10, 10, 10], max_voxels=10,
                             max_voxels_filter="descending")
        data = gen(cloud)
        assert len(data.coords) <= 10
        # descending filter keeps the most populated voxels, sorted
        assert np.all(np.diff(data.voxel_npoints) <= 0)

    def test_min_max_points(self, rng):
        cloud = (rng.random((2000, 3), dtype=np.float32) - 0.5) * 4
        gen = VoxelGenerator([0, 1, 0, 1, 0, 1], [10, 10, 10], min_points=2,
                             max_points=4, max_points_filter="trim")
        data = gen(cloud)
        assert np.all((data.voxel_npoints >= 2) & (data.voxel_npoints <= 4))

    def test_validation(self):
        with pytest.raises(ValueError):
            VoxelGenerator([0.05, 1, 0, 1, 0, 1], [10, 10, 10])  # misaligned
        with pytest.raises(ValueError):
            VoxelGenerator([0, 1, 0, 1, 0, 1], [10, 10, 10], reduction="mean")
        # farthest_sampling is implemented here (the reference raises
        # NotImplementedError, voxelize.cpp:469-471) — construction succeeds
        VoxelGenerator([0, 1, 0, 1, 0, 1], [10, 10, 10],
                       max_points_filter="farthest_sampling")


class TestFMFewPoints:
    def test_small_cloud_extra_features_correct(self, rng):
        """Fewer points than max_voxels+1: the sentinel padding must not
        poison the extra-column quantization stats (round-2 review
        finding: means came out ~-1e25)."""
        import jax.numpy as jnp

        from d3d_tpu.ops.voxel import voxelize_mean_fm

        n = 1000
        pts = np.stack([
            rng.uniform(0, 10, n), rng.uniform(0, 10, n),
            rng.uniform(0, 4, n), rng.uniform(0, 1, n)],
            axis=0).astype(np.float32)
        bounds = jnp.asarray([0, 10, 0, 10, 0, 4], jnp.float32)
        out = voxelize_mean_fm(jnp.asarray(pts), (10, 10, 4), bounds, 4000)
        nv = int(out.nvoxels)
        assert nv > 0
        agg = np.asarray(out.aggregates)[:, :nv]
        npv = np.asarray(out.voxel_npoints)[:nv]
        assert np.all(npv > 0)
        # intensity means must lie inside the data range
        assert np.all(agg[3] >= -1e-3) and np.all(agg[3] <= 1 + 1e-3), \
            (agg[3].min(), agg[3].max())
        # xyz means inside the grid
        assert np.all(agg[0] >= 0) and np.all(agg[0] <= 10)


class TestFarthestSamplingFilter:
    def test_generator_fps(self, rng):
        """max_points_filter='farthest_sampling': each over-full voxel keeps
        exactly max_points picked by greedy FPS (the filter the reference
        declares but never implemented, voxelize.cpp:469-471)."""
        from d3d_tpu.ops.voxel import VoxelGenerator

        # one crowded cell + scattered singles
        crowded = rng.random((60, 3)).astype(np.float32) * 0.1  # cell (0,0,0)
        single = (rng.random((20, 3)).astype(np.float32) * 0.8 + 0.15)
        pts = np.concatenate([crowded, single])
        gen = VoxelGenerator([0, 1, 0, 1, 0, 1], [8, 8, 8], max_points=5,
                             max_voxels=100,
                             max_points_filter="farthest_sampling")
        out = gen(pts)
        assert out.voxel_npoints.max() <= 5
        # the crowded voxel kept exactly 5, chosen from its members
        cell = np.floor(pts * 8).astype(int)
        key = (cell[:, 0] * 8 + cell[:, 1]) * 8 + cell[:, 2]
        kept_idx = out.points_mask
        kept_in_crowded = [i for i in kept_idx if key[i] == 0]
        assert len(kept_in_crowded) == 5
        # FPS spreads: kept points pairwise-farther than encounter trim
        kept = pts[kept_in_crowded]
        trim = pts[:5]

        def min_pair(a):
            d = np.linalg.norm(a[:, None] - a[None, :], axis=-1)
            return d[np.triu_indices(len(a), 1)].min()

        assert min_pair(kept) >= min_pair(trim) * 0.99

    def test_generator_fps_matches_op(self, rng):
        """The filter's kept set equals farthest_point_sampling run directly
        on the voxel's members."""
        import jax.numpy as jnp
        from d3d_tpu.ops.point import farthest_point_sampling
        from d3d_tpu.ops.voxel import VoxelGenerator

        crowded = rng.random((40, 3)).astype(np.float32) * 0.1
        gen = VoxelGenerator([0, 1, 0, 1, 0, 1], [4, 4, 4], max_points=6,
                             max_voxels=10,
                             max_points_filter="farthest_sampling")
        out = gen(crowded)
        sel = np.asarray(farthest_point_sampling(
            jnp.asarray(crowded)[None], 6))[0]
        np.testing.assert_array_equal(np.sort(out.points_mask),
                                      np.sort(sel))
