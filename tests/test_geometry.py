"""Geometry core tests: closed-form IoU oracles (same fractions as the
reference suite, /root/reference/test/test_box.py:12-100), hull/GIoU/DIoU
sanity, signed distance, and gradient checks against finite differences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3d_tpu.ops import geometry as G

sq2 = np.sqrt(2)
d45 = np.pi / 4
eps = 1e-3


def B(*rows):
    return jnp.asarray(np.array(rows, dtype=np.float64))


class TestIoU:
    def test_aa_boxes(self):
        b1 = B([1, 1, 2, 2, eps], [2, 2, 2, 2, eps], [3, 3, 2, 2, eps])
        b2 = B([3, 1, 2, 2, -eps], [2, 2, 2, 2, -eps], [1, 3, 2, 2, -eps])
        expected = np.array([[0, 1 / 7, 0], [1 / 7, 1, 1 / 7], [0, 1 / 7, 0]])
        got = G.aabox_iou(b1[:, None], b2[None, :])
        assert np.allclose(got, expected, atol=eps)
        got = G.rbox_iou(b1[:, None], b2[None, :])
        assert np.allclose(got, expected, atol=4 * eps)

    def test_rotated_boxes(self):
        b1 = B([0, 0, 2, 2, 0], [-1, 1, 2, 2, 0], [1, 1, 2, 2, 0])
        b2 = B(
            [-1, 1, 2 * sq2 - eps, 2 * sq2 - eps, d45 - eps],
            [1, 1, sq2 + eps, sq2 + eps, d45 + eps],
        )
        aa_expected = np.array([[1 / 4, 1 / 7], [1 / 4, 0], [1 / 9, 1]])
        got = G.aabox_iou(b1[:, None], b2[None, :])
        assert np.allclose(got, aa_expected, atol=2 * eps)

        r_expected = np.array([[1 / 5, 1 / 11], [1 / 2, 0], [1 / 11, 1 / 2]])
        got = G.rbox_iou(b1[:, None], b2[None, :])
        assert np.allclose(got, r_expected, atol=4 * eps)

    def test_apart_boxes(self):
        b = B([1, 2, 3, 3, 0], [-2, 1, 3, 3, 0], [-1, -2, 3, 3, 0], [2, -1, 3, 3, 0])
        got = np.asarray(G.aabox_iou(b[:, None], b[None, :]))
        assert np.allclose(got - np.eye(4), 0, atol=1e-6)

        b = B(
            [0, 0, 2, 2, 0],
            [2, 2, 2 * sq2, 2 * sq2, d45 + eps],
            [-2, 2, 2 * sq2, 2 * sq2, d45 + 2 * eps],
            [2, -2, 2 * sq2, 2 * sq2, d45 + 3 * eps],
            [-2, -2, 2 * sq2, 2 * sq2, d45 + 4 * eps],
        )
        got = np.asarray(G.rbox_iou(b[:, None], b[None, :]))
        diff = got - np.eye(5)
        np.fill_diagonal(diff, 0)
        assert np.allclose(diff, 0, atol=1e-6)

    def test_identical_and_contained(self):
        a = B([3.0, -2.0, 4.0, 2.0, 0.7])
        assert np.allclose(np.asarray(G.rbox_iou(a, a)), 1.0, atol=1e-9)
        # contained box: half the dims, same center/rotation -> iou = 1/4
        b = B([3.0, -2.0, 2.0, 1.0, 0.7])
        assert np.allclose(G.rbox_iou(a, b), 0.25, atol=1e-9)

    def test_fuzz_range(self, rng):
        n = 300
        boxes = np.stack(
            [
                rng.random(n) * 200,
                rng.random(n) * 400,
                rng.random(n) * 20 + 10,
                rng.random(n) * 30 + 5,
                rng.random(n) * 2 - 1,
            ],
            axis=1,
        )
        b = jnp.asarray(boxes)
        for fn in (G.aabox_iou, G.rbox_iou):
            m = np.asarray(fn(b[:, None], b[None, :]))
            assert np.all(m >= -eps) and np.all(m <= 1 + eps)
            assert np.allclose(np.diag(m), 1.0, atol=1e-6)
            assert np.allclose(m, m.T, atol=1e-9)

    def test_rotation_invariance(self, rng):
        """IoU must be invariant under a global rigid transform."""
        b1 = np.array([1.0, 2.0, 3.0, 2.0, 0.3])
        b2 = np.array([2.0, 2.5, 2.0, 4.0, -0.4])

        def rot(b, th):
            c, s = np.cos(th), np.sin(th)
            x, y = c * b[0] - s * b[1], s * b[0] + c * b[1]
            return np.array([x, y, b[2], b[3], b[4] + th])

        base = float(G.rbox_iou(jnp.asarray(b1), jnp.asarray(b2)))
        for th in rng.random(8) * 2 * np.pi:
            got = float(G.rbox_iou(jnp.asarray(rot(b1, th)), jnp.asarray(rot(b2, th))))
            assert abs(got - base) < 1e-9


class TestHullGiouDiou:
    def test_hull_of_squares(self):
        # two unit squares side by side -> hull is the 2x1 rectangle
        p1 = G.box2poly(B([0, 0, 1, 1, 0]))[0]
        p2 = G.box2poly(B([1, 0, 1, 1, 0]))[0]
        area = float(G.convex_hull_area(jnp.concatenate([p1, p2], axis=0)))
        assert abs(area - 2.0) < 1e-9

    def test_hull_rotated(self):
        # square + the same square rotated 45 deg -> regular octagon-ish hull
        p1 = G.box2poly(B([0, 0, 2, 2, 0]))[0]
        p2 = G.box2poly(B([0, 0, 2, 2, d45]))[0]
        area = float(G.convex_hull_area(jnp.concatenate([p1, p2], axis=0)))
        # hull of square corners (+-1, +-1) and diamond tips (+-sqrt2 on the
        # axes) is an octagon of area 4*sqrt(2) (8 center triangles, each
        # with cross product sqrt(2))
        assert abs(area - 4 * sq2) < 1e-9

    def test_giou_identical(self):
        a = B([1.0, 1.0, 2.0, 3.0, 0.2])
        assert np.allclose(G.rbox_giou(a, a), 1.0, atol=1e-9)

    def test_giou_disjoint_aa(self):
        # two unit squares 2 apart on x: iou=0, hull area=3x1, union=2
        a = B([0.0, 0.0, 1.0, 1.0, 0.0])
        b = B([2.0, 0.0, 1.0, 1.0, 0.0])
        giou = float(G.rbox_giou(a, b)[0])
        assert abs(giou - (0.0 - (3.0 - 2.0) / 3.0)) < 1e-9

    def test_giou_range_fuzz(self, rng):
        n = 200
        boxes = np.stack(
            [
                rng.random(n) * 20,
                rng.random(n) * 20,
                rng.random(n) * 5 + 1,
                rng.random(n) * 5 + 1,
                rng.random(n) * 4 - 2,
            ],
            axis=1,
        )
        b = jnp.asarray(boxes)
        m = np.asarray(G.rbox_giou(b[:, None], b[None, :]))
        assert np.all(m >= -1 - 1e-9) and np.all(m <= 1 + 1e-9)
        assert np.allclose(np.diag(m), 1.0, atol=1e-9)

    def test_diou(self):
        a = B([0.0, 0.0, 2.0, 2.0, 0.0])
        b = B([2.0, 0.0, 2.0, 2.0, 0.0])
        # iou=0, d^2=4, enclosing box 4x2 diag^2 = 20
        assert abs(float(G.rbox_diou(a, b)[0]) - (0 - 4 / 20)) < 1e-9
        assert np.allclose(G.rbox_diou(a, a), 1.0, atol=1e-9)


class TestDistance:
    def test_signed_distance_square(self):
        poly = G.box2poly(B([0, 0, 2, 2, 0]))[0]
        pts = jnp.asarray(
            np.array([[0.0, 0.0], [0.5, 0.0], [2.0, 0.0], [1.0, 1.0], [0.9, 0.9]])
        )
        d = np.asarray(G.poly_signed_distance(poly, pts))
        assert abs(d[0] - 1.0) < 1e-9  # center, 1 away from each edge
        assert abs(d[1] - 0.5) < 1e-9
        assert abs(d[2] + 1.0) < 1e-9  # outside
        assert abs(d[3] - 0.0) < 1e-9  # corner
        assert abs(d[4] - 0.1) < 1e-6

    def test_contains(self):
        poly = G.box2poly(B([0, 0, 1, 1, d45]))[0]
        pts = jnp.asarray(np.array([[0.0, 0.0], [0.5, 0.5], [0.6, 0.0], [0.0, -0.7]]))
        inside = np.asarray(G.poly_contains(poly, pts))
        assert list(inside) == [True, False, True, True]


class TestGradients:
    def _fd_grad(self, f, x, h=1e-6):
        x = np.asarray(x, dtype=np.float64)
        g = np.zeros_like(x)
        for i in range(x.size):
            xp = x.copy().ravel()
            xm = x.copy().ravel()
            xp[i] += h
            xm[i] -= h
            g.ravel()[i] = (f(xp.reshape(x.shape)) - f(xm.reshape(x.shape))) / (2 * h)
        return g

    @pytest.mark.parametrize("fn", [G.rbox_iou, G.rbox_giou, G.rbox_diou])
    def test_grads_match_fd(self, fn):
        b1 = np.array([0.1, 0.2, 2.0, 3.0, 0.3])
        b2 = np.array([0.8, -0.3, 2.5, 1.5, -0.5])

        def f1(x):
            return float(fn(jnp.asarray(x), jnp.asarray(b2)))

        def f2(x):
            return float(fn(jnp.asarray(b1), jnp.asarray(x)))

        g1 = jax.grad(lambda x: fn(x, jnp.asarray(b2)))(jnp.asarray(b1))
        g2 = jax.grad(lambda x: fn(jnp.asarray(b1), x))(jnp.asarray(b2))
        assert np.allclose(np.asarray(g1), self._fd_grad(f1, b1), atol=1e-5)
        assert np.allclose(np.asarray(g2), self._fd_grad(f2, b2), atol=1e-5)

    def test_grad_no_nan_fuzz(self, rng):
        n = 64
        boxes1 = np.stack(
            [
                rng.random(n) * 10,
                rng.random(n) * 10,
                rng.random(n) * 4 + 1,
                rng.random(n) * 4 + 1,
                rng.random(n) * 6 - 3,
            ],
            axis=1,
        )
        boxes2 = boxes1[::-1].copy()

        for fn in (G.rbox_iou, G.rbox_giou, G.rbox_diou):
            g = jax.grad(lambda a, b: jnp.sum(fn(a, b)), argnums=(0, 1))(
                jnp.asarray(boxes1), jnp.asarray(boxes2)
            )
            assert np.all(np.isfinite(np.asarray(g[0])))
            assert np.all(np.isfinite(np.asarray(g[1])))

    def test_pdist_grad(self):
        poly_box = np.array([0.0, 0.0, 2.0, 2.0, 0.3])
        pt = np.array([1.5, 0.7])

        def f(b):
            return G.poly_signed_distance(G.box2poly(b), jnp.asarray(pt))

        g = jax.grad(lambda b: jnp.sum(f(b)))(jnp.asarray(poly_box))

        def fs(x):
            return float(f(jnp.asarray(x)))

        assert np.allclose(np.asarray(g), self._fd_grad(fs, poly_box), atol=1e-5)


class TestF32Robustness:
    def test_near_identical_f32_iou_is_one(self, rng):
        """f32 boxes perturbed by 1e-6 must report IoU ~1 — the old fixed
        1e-9 containment tolerance dropped boundary corners and reported
        as low as 0.33 (measured, round-2 review finding)."""
        import jax.numpy as jnp

        from d3d_tpu.ops import geometry as G

        boxes = np.stack([
            rng.uniform(-50, 50, 512), rng.uniform(-50, 50, 512),
            rng.uniform(1, 5, 512), rng.uniform(1, 5, 512),
            rng.uniform(-np.pi, np.pi, 512)], 1).astype(np.float32)
        pert = (boxes + rng.normal(0, 1e-6, boxes.shape)).astype(np.float32)
        iou = np.asarray(G.rbox_iou(jnp.asarray(boxes), jnp.asarray(pert)))
        assert iou.min() > 0.99, iou.min()

    def test_f32_gradients_bounded_near_convergence(self, rng):
        """The rIoU loss gradient for predictions ~1e-6 from their targets
        must stay O(1) — the absolute 1e-14 parallelism cutoff let f32
        rounding-noise denominators through (gradients ~1e9 measured)."""
        import jax
        import jax.numpy as jnp

        from d3d_tpu.ops import geometry as G

        tgt = np.stack([
            rng.uniform(-50, 50, 64), rng.uniform(-50, 50, 64),
            rng.uniform(1, 5, 64), rng.uniform(1, 5, 64),
            rng.uniform(-np.pi, np.pi, 64)], 1).astype(np.float32)
        pred = (tgt + rng.normal(0, 1e-6, tgt.shape)).astype(np.float32)

        g = jax.grad(lambda b: jnp.sum(1.0 - G.rbox_iou(b, jnp.asarray(tgt)))
                     )(jnp.asarray(pred))
        g = np.asarray(g)
        assert np.isfinite(g).all()
        assert np.abs(g).max() < 100.0, np.abs(g).max()  # was ~1e9 pre-fix
