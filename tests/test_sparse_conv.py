"""Sparse 3D conv core: sort-join neighbor maps vs brute force, submanifold
conv vs a dense lax.conv oracle, strided downsampling, densification."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from d3d_tpu.ops.sparse_conv import (build_neighbor_map,
                                     build_neighbor_map_strided,
                                     downsample_coords, kernel_offsets,
                                     linearize, match_sorted,
                                     sparse_to_dense, subm_conv_apply)

GRID = (8, 10, 6)


def _active_sites(rng, n_active, n_pad):
    """Unique random coords, padded with garbage rows marked invalid."""
    all_cells = np.stack(np.meshgrid(*[np.arange(g) for g in GRID],
                                     indexing="ij"), -1).reshape(-1, 3)
    pick = rng.choice(len(all_cells), size=n_active, replace=False)
    coords = np.zeros((n_pad, 3), np.int32)
    coords[:n_active] = all_cells[pick]
    coords[n_active:] = 7  # garbage
    valid = np.zeros(n_pad, bool)
    valid[:n_active] = True
    return jnp.asarray(coords), jnp.asarray(valid)


class TestMatchSorted:
    def test_exact_join(self, rng):
        ref = jnp.asarray([3, 9, 14, 27, 50], jnp.int32)
        rv = jnp.asarray([1, 1, 1, 1, 0], bool)
        q = jnp.asarray([9, 4, 50, 3, 27], jnp.int32)
        qv = jnp.asarray([1, 1, 1, 1, 0], bool)
        out = np.asarray(match_sorted(ref, rv, q, qv))
        # 50 is an INVALID ref -> no match; invalid query -> -1
        np.testing.assert_array_equal(out, [1, -1, -1, 0, -1])


class TestNeighborMap:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_vs_brute_force(self, seed):
        rng = np.random.default_rng(seed)
        coords, valid = _active_sites(rng, 40, 64)
        nbr = np.asarray(build_neighbor_map(coords, valid, GRID))
        offs = kernel_offsets(3)
        cs = np.asarray(coords)
        lookup = {tuple(cs[i]): i for i in range(64) if valid[i]}
        for i in range(64):
            for k in range(27):
                want = -1
                if valid[i]:
                    want = lookup.get(tuple(cs[i] + offs[k]), -1)
                assert nbr[i, k] == want, (i, k, nbr[i, k], want)

    def test_strided_vs_brute_force(self, rng):
        coords, valid = _active_sites(rng, 40, 64)
        oc, ov = downsample_coords(coords, valid, GRID, stride=2)
        nbr = np.asarray(build_neighbor_map_strided(
            oc, ov, coords, valid, GRID, stride=2))
        cs, ocs = np.asarray(coords), np.asarray(oc)
        offs = kernel_offsets(3)
        lookup = {tuple(cs[i]): i for i in range(64) if valid[i]}
        for i in range(64):
            for k in range(27):
                want = -1
                if ov[i]:
                    q = ocs[i] * 2 + offs[k]
                    if np.all(q >= 0) and np.all(q < GRID):
                        want = lookup.get(tuple(q), -1)
                assert nbr[i, k] == want


class TestSubmConv:
    def test_matches_dense_conv_oracle(self, rng):
        """On active sites, the sparse submanifold conv must equal a dense
        3D convolution of the densified input, evaluated at active sites
        (the submanifold definition)."""
        c_in, c_out = 5, 7
        coords, valid = _active_sites(rng, 48, 64)
        feats = jnp.asarray(rng.normal(size=(64, c_in)), jnp.float32)
        feats = feats * valid[:, None]
        w = jnp.asarray(rng.normal(size=(27, c_in, c_out)), jnp.float32)

        nbr = build_neighbor_map(coords, valid, GRID)
        sparse_out = np.asarray(subm_conv_apply(feats, nbr, w, valid))

        dense_in = sparse_to_dense(feats, coords, valid, GRID)  # (D,H,W,C)
        # lax conv wants NCHW-ish: (1, C, D, H, W); kernel (O, I, 3, 3, 3)
        x = jnp.transpose(dense_in, (3, 0, 1, 2))[None]
        kern = jnp.transpose(w.reshape(3, 3, 3, c_in, c_out),
                             (4, 3, 0, 1, 2))
        dense_out = jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1, 1), padding="SAME")[0]
        dense_out = jnp.transpose(dense_out, (1, 2, 3, 0))  # (D,H,W,C')

        cs = np.asarray(coords)
        for i in range(64):
            if not valid[i]:
                np.testing.assert_array_equal(sparse_out[i], 0)
                continue
            want = np.asarray(dense_out[cs[i, 0], cs[i, 1], cs[i, 2]])
            np.testing.assert_allclose(sparse_out[i], want, rtol=2e-5,
                                       atol=2e-5, err_msg=str(i))

    def test_strided_conv_matches_dense(self, rng):
        c_in, c_out = 4, 6
        coords, valid = _active_sites(rng, 48, 64)
        feats = jnp.asarray(rng.normal(size=(64, c_in)), jnp.float32)
        feats = feats * valid[:, None]
        w = jnp.asarray(rng.normal(size=(27, c_in, c_out)), jnp.float32)

        oc, ov = downsample_coords(coords, valid, GRID, stride=2)
        nbr = build_neighbor_map_strided(oc, ov, coords, valid, GRID,
                                         stride=2)
        sparse_out = np.asarray(subm_conv_apply(feats, nbr, w, ov))

        dense_in = sparse_to_dense(feats, coords, valid, GRID)
        x = jnp.transpose(dense_in, (3, 0, 1, 2))[None]
        kern = jnp.transpose(w.reshape(3, 3, 3, c_in, c_out),
                             (4, 3, 0, 1, 2))
        # stride-2, padding chosen so out[o] = sum_off W[off] in[2o+off-1]:
        # pad 1 on the low side, enough on the high side
        dense_out = jax.lax.conv_general_dilated(
            x, kern, window_strides=(2, 2, 2),
            padding=[(1, 2)] * 3)[0]
        dense_out = jnp.transpose(dense_out, (1, 2, 3, 0))

        ocs = np.asarray(oc)
        for i in range(64):
            if not ov[i]:
                continue
            want = np.asarray(dense_out[ocs[i, 0], ocs[i, 1], ocs[i, 2]])
            np.testing.assert_allclose(sparse_out[i], want, rtol=2e-5,
                                       atol=2e-5, err_msg=str(i))


class TestDownsample:
    def test_unique_and_complete(self, rng):
        coords, valid = _active_sites(rng, 40, 64)
        oc, ov = downsample_coords(coords, valid, GRID, stride=2)
        got = {tuple(r) for r, v in zip(np.asarray(oc), np.asarray(ov)) if v}
        want = {tuple(r // 2) for r, v in zip(np.asarray(coords),
                                             np.asarray(valid)) if v}
        assert got == want

    def test_densify_roundtrip(self, rng):
        coords, valid = _active_sites(rng, 30, 32)
        feats = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
        dense = np.asarray(sparse_to_dense(feats, coords, valid, GRID))
        cs = np.asarray(coords)
        for i in range(32):
            if valid[i]:
                np.testing.assert_allclose(
                    dense[cs[i, 0], cs[i, 1], cs[i, 2]],
                    np.asarray(feats[i]), rtol=1e-6)
        assert np.count_nonzero(dense.sum(-1)) <= 30


class TestSortJoinFallback:
    """The tagged-sort join (used above _DENSE_CANVAS_MAX_CELLS) must agree
    with the dense-canvas build exactly."""

    def test_strategies_agree(self, rng, monkeypatch):
        import d3d_tpu.ops.sparse_conv as sc

        coords, valid = _active_sites(rng, 40, 64)
        keys = linearize(coords, GRID)
        dense = np.asarray(sc._neighbor_map_impl(
            coords, valid, keys, valid, GRID, 3))
        monkeypatch.setattr(sc, "_DENSE_CANVAS_MAX_CELLS", 0)
        sort_join = np.asarray(sc._neighbor_map_impl(
            coords, valid, keys, valid, GRID, 3))
        np.testing.assert_array_equal(dense, sort_join)

    def test_strided_strategies_agree(self, rng, monkeypatch):
        import d3d_tpu.ops.sparse_conv as sc

        coords, valid = _active_sites(rng, 40, 64)
        oc, ov = downsample_coords(coords, valid, GRID, stride=2)
        keys = linearize(coords, GRID)
        dense = np.asarray(sc._neighbor_map_impl(
            oc, ov, keys, valid, GRID, 3, stride=2))
        monkeypatch.setattr(sc, "_DENSE_CANVAS_MAX_CELLS", 0)
        sort_join = np.asarray(sc._neighbor_map_impl(
            oc, ov, keys, valid, GRID, 3, stride=2))
        np.testing.assert_array_equal(dense, sort_join)


    def test_big_grid_tpu_cap_parity(self, rng, monkeypatch):
        """On TPU the dense-canvas cap is raised to 2^26 cells so the
        VoxelNeXt-nuScenes grid (1080x1080x40 = 46.7M) skips the 27-way
        sort join. Simulate the raised cap here and pin that the canvas
        path at that real grid size agrees with the sort join exactly."""
        import d3d_tpu.ops.sparse_conv as sc

        grid = (1080, 1080, 40)
        n = 64
        coords = np.stack([rng.integers(0, g, n) for g in grid],
                          axis=1).astype(np.int32)
        coords = np.unique(coords, axis=0)
        valid = np.ones(len(coords), bool)
        valid[-3:] = False
        import jax.numpy as jnp
        coords, valid = jnp.asarray(coords), jnp.asarray(valid)
        keys = linearize(coords, grid)
        monkeypatch.setattr(sc, "_DENSE_CANVAS_MAX_CELLS",
                            sc._DENSE_CANVAS_MAX_CELLS_TPU)
        dense = np.asarray(sc._neighbor_map_impl(
            coords, valid, keys, valid, grid, 3))
        monkeypatch.setattr(sc, "_DENSE_CANVAS_MAX_CELLS", 0)
        sort_join = np.asarray(sc._neighbor_map_impl(
            coords, valid, keys, valid, grid, 3))
        np.testing.assert_array_equal(dense, sort_join)


class TestKernel5:
    def test_k5_neighbor_map_vs_brute_force(self, rng):
        coords, valid = _active_sites(rng, 40, 64)
        nbr = np.asarray(build_neighbor_map(coords, valid, GRID,
                                            kernel_size=5))
        offs = kernel_offsets(5)
        assert nbr.shape == (64, 125)
        cs = np.asarray(coords)
        lookup = {tuple(cs[i]): i for i in range(64) if valid[i]}
        for i in range(0, 64, 3):
            for k in range(0, 125, 7):
                want = -1
                if valid[i]:
                    want = lookup.get(tuple(cs[i] + offs[k]), -1)
                assert nbr[i, k] == want
