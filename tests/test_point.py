"""aligned_scatter tests: forward values against manual lattice math and
backward grads against analytic weights (oracle layout mirrors the reference
suite /root/reference/test/test_point.py)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from d3d_tpu.ops.point import aligned_scatter


def _setup(rng):
    coord = np.array(
        [[0, 0.25, 0.25, 0.25], [0, 1.25, 1.25, 1.25], [1, 2.25, 2.25, 2.25]]
    )
    feat = rng.random((2, 10, 3, 3, 3))
    lat = np.array(list(itertools.product([0, 1], repeat=3)))[:, ::-1]  # bit0=dim0
    return coord, feat, lat


def test_drop(rng):
    coord, feat, _ = _setup(rng)
    out = aligned_scatter(coord, feat, "drop")
    ic = coord.astype(int)
    expected = np.stack([feat[ic[i, 0], :, ic[i, 1], ic[i, 2], ic[i, 3]] for i in range(3)])
    assert np.allclose(out, expected)


def test_mean(rng):
    coord, feat, lat = _setup(rng)
    out = aligned_scatter(coord, feat, "mean")
    exp0 = feat[0, :, lat[:, 0], lat[:, 1], lat[:, 2]].mean(axis=0)
    exp1 = feat[0, :, lat[:, 0] + 1, lat[:, 1] + 1, lat[:, 2] + 1].mean(axis=0)
    assert np.allclose(out[0], exp0)
    assert np.allclose(out[1], exp1)
    assert np.allclose(out[2], feat[1, :, 2, 2, 2])  # clamped corner

    g = jax.grad(
        lambda f: jnp.sum(aligned_scatter(jnp.asarray(coord), f, "mean"))
    )(jnp.asarray(feat))
    g = np.asarray(g)
    assert np.allclose(g[0, :, 0, 0, 0], 1 / 8)
    assert np.allclose(g[0, :, 1, 1, 1], 1 / 4)  # shared by both lattices
    assert np.allclose(g[1, :, 2, 2, 2], 1.0)


def test_linear(rng):
    coord, feat, lat = _setup(rng)
    out = aligned_scatter(coord, feat, "linear")
    nhigh = lat.sum(axis=1)
    w = (0.25 ** nhigh) * (0.75 ** (3 - nhigh))
    exp0 = (feat[0, :, lat[:, 0], lat[:, 1], lat[:, 2]] * w[:, None]).sum(axis=0)
    exp1 = (feat[0, :, lat[:, 0] + 1, lat[:, 1] + 1, lat[:, 2] + 1] * w[:, None]).sum(axis=0)
    assert np.allclose(out[0], exp0)
    assert np.allclose(out[1], exp1)
    assert np.allclose(out[2], feat[1, :, 2, 2, 2])  # halved clamp weights sum to 1

    g = jax.grad(
        lambda f: jnp.sum(aligned_scatter(jnp.asarray(coord), f, "linear"))
    )(jnp.asarray(feat))
    g = np.asarray(g)
    assert np.allclose(g[0, :, 0, 0, 0], 0.75 ** 3)
    assert np.allclose(g[0, :, 1, 1, 1], 0.75 ** 3 + 0.25 ** 3)
    assert np.allclose(g[1, :, 2, 2, 2], 1.0)


def test_max(rng):
    coord, feat, lat = _setup(rng)
    out = aligned_scatter(coord, feat, "max")
    exp0 = feat[0, :, lat[:, 0], lat[:, 1], lat[:, 2]].max(axis=0)
    assert np.allclose(out[0], exp0)
    assert np.allclose(out[2], feat[1, :, 2, 2, 2])


def test_nearest(rng):
    coord, feat, _ = _setup(rng)
    out = aligned_scatter(coord, feat, "nearest")
    # 0.25 rounds down, 1.25 rounds down, 2.25 rounds down (within range)
    assert np.allclose(out[0], feat[0, :, 0, 0, 0])
    assert np.allclose(out[1], feat[0, :, 1, 1, 1])
    assert np.allclose(out[2], feat[1, :, 2, 2, 2])


def test_2d(rng):
    feat = rng.random((1, 4, 5, 5))
    coord = np.array([[0, 1.5, 2.25]])
    out = aligned_scatter(coord, feat, "linear")
    expected = (
        0.5 * 0.75 * feat[0, :, 1, 2]
        + 0.5 * 0.75 * feat[0, :, 2, 2]
        + 0.5 * 0.25 * feat[0, :, 1, 3]
        + 0.5 * 0.25 * feat[0, :, 2, 3]
    )
    assert np.allclose(out[0], expected)


def test_2d_integer_coordinate_reference_semantics(rng):
    """At exact integer coordinates the reference's ceil-based weights make
    floor and ceil the same cell with weight 1 each, doubling the feature
    per integer dimension (scatter.cpp:63-76). Kept for parity."""
    feat = rng.random((1, 4, 5, 5))
    coord = np.array([[0, 1.5, 2.0]])
    out = aligned_scatter(coord, feat, "linear")
    expected = feat[0, :, 1, 2] + feat[0, :, 2, 2]
    assert np.allclose(out[0], expected)


def test_nearest_neighbor_vs_kdtree(rng):
    """Device brute-force NN (MXU matmul form) matches scipy's KDTree
    exactly — the op behind the KITTI-360 semantic transfer
    (reference kitti360/loader.py:330-360 uses sklearn KDTree)."""
    from scipy.spatial import cKDTree

    from d3d_tpu.ops.point import nearest_neighbor

    q = rng.normal(size=(503, 3)).astype(np.float32) * 10
    r = rng.normal(size=(1217, 3)).astype(np.float32) * 10
    d, i = nearest_neighbor(q, r)
    dd, ii = cKDTree(r).query(q)
    np.testing.assert_array_equal(i, ii)
    np.testing.assert_allclose(d, dd, atol=1e-3)
    # edge cases: empty query, tiny ref, non-multiple chunk sizes
    d0, i0 = nearest_neighbor(np.zeros((0, 3)), r)
    assert d0.shape == (0,)
    d1, i1 = nearest_neighbor(q[:7], r[:3])
    assert (i1 < 3).all()


class TestNearestNeighborWorldScale:
    def test_km_offset_exact_vs_kdtree(self, rng):
        """World-frame coordinates (km from origin, the KITTI-360 regime):
        the f32 distance expansion would mismatch without the query-centroid
        recentering (round-2 review finding)."""
        from scipy.spatial import cKDTree

        from d3d_tpu.ops.point import nearest_neighbor

        origin = np.array([3200.0, -4100.0, 110.0])
        ref = origin + rng.normal(0, 30, (5000, 3))
        query = origin + rng.normal(0, 30, (800, 3))
        d, i = nearest_neighbor(query, ref)
        kd_d, kd_i = cKDTree(ref).query(query)
        np.testing.assert_array_equal(i, kd_i)
        np.testing.assert_allclose(d, kd_d, rtol=1e-4, atol=1e-3)


class TestFarthestPointSampling:
    def _brute(self, pts, k, valid):
        """Literal greedy FPS: start at first valid, then argmax min-dist;
        selected points can't repeat."""
        import numpy as np
        idx = [int(np.nonzero(valid)[0][0])]
        mind = np.where(valid, ((pts - pts[idx[0]]) ** 2).sum(1), -np.inf)
        mind[idx[0]] = -np.inf
        nv = int(valid.sum())
        for _ in range(1, min(k, nv)):
            nxt = int(np.argmax(mind))
            idx.append(nxt)
            mind = np.minimum(mind, np.where(
                valid, ((pts - pts[nxt]) ** 2).sum(1), -np.inf))
            mind[nxt] = -np.inf
        return idx + [-1] * (k - len(idx))

    def test_vs_brute_force(self, rng):
        import jax.numpy as jnp
        from d3d_tpu.ops.point import farthest_point_sampling

        pts = rng.normal(0, 5, (40, 3)).astype(np.float32)
        valid = np.ones(40, bool)
        valid[33:] = False
        got = np.asarray(farthest_point_sampling(
            jnp.asarray(pts), 8, jnp.asarray(valid)))
        want = self._brute(pts.astype(np.float64), 8, valid)
        np.testing.assert_array_equal(got, want)

    def test_fewer_valid_than_k(self, rng):
        import jax.numpy as jnp
        from d3d_tpu.ops.point import farthest_point_sampling

        pts = rng.normal(0, 1, (10, 3)).astype(np.float32)
        valid = np.zeros(10, bool)
        valid[2:5] = True
        got = np.asarray(farthest_point_sampling(
            jnp.asarray(pts), 6, jnp.asarray(valid)))
        assert (got[:3] >= 2).all() and (got[:3] <= 4).all()
        assert len(set(got[:3].tolist())) == 3
        np.testing.assert_array_equal(got[3:], [-1, -1, -1])

    def test_batched(self, rng):
        import jax.numpy as jnp
        from d3d_tpu.ops.point import farthest_point_sampling

        pts = rng.normal(0, 5, (4, 16, 3)).astype(np.float32)
        got = np.asarray(farthest_point_sampling(jnp.asarray(pts), 5))
        assert got.shape == (4, 5)
        for b in range(4):
            want = self._brute(pts[b].astype(np.float64), 5,
                               np.ones(16, bool))
            np.testing.assert_array_equal(got[b], want)
