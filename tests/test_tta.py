"""Flip test-time augmentation: mirror geometry inverses, base-detector
identity for the trivial ensemble, and the merged-ensemble NMS
invariant."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from d3d_tpu.models.tta import (FLIP_MODES, _flip_points, _unflip_boxes,
                                make_tta_detector)


def _bev_corners(b):
    """(4, 2) BEV footprint corners of [x,y,z,l,w,h,yaw]."""
    c, s = np.cos(b[6]), np.sin(b[6])
    out = []
    for su in (-0.5, 0.5):
        for sv in (-0.5, 0.5):
            u, v = su * b[3], sv * b[4]
            out.append([b[0] + u * c - v * s, b[1] + u * s + v * c])
    return np.asarray(out)


class TestFlipGeometry:
    @pytest.mark.parametrize("mode", FLIP_MODES)
    def test_flip_points_involution(self, rng, mode):
        pts = jnp.asarray(rng.normal(size=(64, 4)), jnp.float32)
        twice = _flip_points(_flip_points(pts, mode), mode)
        np.testing.assert_array_equal(np.asarray(twice), np.asarray(pts))

    @pytest.mark.parametrize("mode", FLIP_MODES)
    def test_unflip_inverts_world_mirror(self, rng, mode):
        """A box detected in the mirrored world, unflipped, must have the
        ORIGINAL box's footprint (corner sets equal; yaw may differ by a
        symmetry of the rectangle)."""
        boxes = np.stack([
            rng.uniform(-20, 20, 5), rng.uniform(-20, 20, 5),
            rng.uniform(-2, 0, 5), rng.uniform(2, 5, 5),
            rng.uniform(1, 2, 5), rng.uniform(1, 2, 5),
            rng.uniform(-np.pi, np.pi, 5)], axis=1).astype(np.float32)
        sx = -1.0 if mode in ("flip_x", "flip_xy") else 1.0
        sy = -1.0 if mode in ("flip_y", "flip_xy") else 1.0
        # the box as the detector would see it in the mirrored world:
        # mirror the corners and re-fit (same dims; yaw mirrors)
        mirrored = boxes.copy()
        mirrored[:, 0] *= sx
        mirrored[:, 1] *= sy
        if sy < 0:
            mirrored[:, 6] = -mirrored[:, 6]
        if sx < 0:
            mirrored[:, 6] = np.pi - mirrored[:, 6]
        vel = rng.normal(size=(5, 2)).astype(np.float32)
        mv = vel * [sx, sy]
        ub, uv = _unflip_boxes(jnp.asarray(mirrored), jnp.asarray(mv), mode)
        ub = np.asarray(ub)
        for b0, b1 in zip(boxes, ub):
            c0 = _bev_corners(b0)
            c1 = _bev_corners(b1)
            # corner SETS equal (order may permute under the symmetry)
            d = np.linalg.norm(c0[:, None] - c1[None, :], axis=-1)
            assert d.min(axis=1).max() < 1e-4
            np.testing.assert_allclose(b1[2:6], b0[2:6], atol=1e-6)
        np.testing.assert_allclose(np.asarray(uv), vel, atol=1e-6)


class TestEnsemble:
    def _detector(self, rng):
        from d3d_tpu.dataset.kitti.utils import KittiObjectClass
        from d3d_tpu.models import (PointPillars, make_anchors, pillarize,
                                    make_pointpillars_detector)
        from tests.test_model import TINY

        pts = np.stack([rng.random(1024) * 16, rng.random(1024) * 16 - 8,
                        rng.random(1024) * 4 - 3, rng.random(1024)],
                       axis=1).astype(np.float32)
        model = PointPillars(TINY)
        f, c, v = pillarize(jnp.asarray(pts), TINY)
        var = model.init(jax.random.PRNGKey(0), f[None], c[None], v[None])
        det = make_pointpillars_detector(
            model, var, TINY, make_anchors(TINY),
            [KittiObjectClass.Car], score_threshold=0.0, top_k=16)
        return det, pts

    def test_none_only_matches_base(self, rng):
        det, pts = self._detector(rng)
        from d3d_tpu.dataset.kitti.utils import KittiObjectClass

        tta = make_tta_detector(det, [KittiObjectClass.Car],
                                modes=("none",), score_threshold=0.0)
        a = det(pts, frame="velo")
        b = tta(pts, frame="velo")
        assert len(a) == len(b)
        pa = sorted(tuple(np.round(o.position, 4)) for o in a)
        pb = sorted(tuple(np.round(o.position, 4)) for o in b)
        assert pa == pb

    def test_velocity_detector_keeps_velocity(self, rng):
        """A velocity-head detector wrapped in TTA keeps the 5-output
        device contract and emits TrackingTarget3D with the base
        detector's (unflipped) velocities — the ensemble must not
        silently drop the motion cue CenterTracker consumes."""
        from d3d_tpu.abstraction import TrackingTarget3D
        from d3d_tpu.dataset.kitti.utils import KittiObjectClass
        from d3d_tpu.models import pillarize
        from d3d_tpu.models.centerpoint import CenterPoint
        from d3d_tpu.models.inference import make_centerpoint_detector
        from d3d_tpu.models.pointpillars import PointPillarsConfig
        from tests.test_center_tracker import VEL_CFG

        pcfg = PointPillarsConfig(
            bounds=VEL_CFG.bounds, grid=VEL_CFG.grid,
            max_pillars=VEL_CFG.max_pillars,
            max_points_per_pillar=VEL_CFG.max_points_per_pillar,
            pfn_features=VEL_CFG.pfn_features)
        pts = np.stack([rng.random(1024) * 16, rng.random(1024) * 16 - 8,
                        rng.random(1024) * 4 - 3, rng.random(1024)],
                       axis=1).astype(np.float32)
        model = CenterPoint(VEL_CFG)
        f, c, v = pillarize(jnp.asarray(pts), pcfg)
        var = model.init(jax.random.PRNGKey(0), f[None], c[None], v[None])
        det = make_centerpoint_detector(model, var, VEL_CFG, pcfg,
                                        [KittiObjectClass.Car],
                                        score_threshold=0.0)
        tta = make_tta_detector(det, [KittiObjectClass.Car],
                                modes=("none",), score_threshold=0.0)
        assert len(tta.device_fn(jnp.asarray(pts, jnp.float32))) == 5
        base = det(pts, frame="velo")
        out = tta(pts, frame="velo")
        assert len(out) == len(base) >= 1
        assert all(isinstance(o, TrackingTarget3D) for o in out)
        va = sorted(tuple(np.round(np.asarray(o.velocity)[:2], 4))
                    for o in base)
        vb = sorted(tuple(np.round(np.asarray(o.velocity)[:2], 4))
                    for o in out)
        assert va == vb

    def test_full_flip_ensemble(self, rng):
        det, pts = self._detector(rng)
        from d3d_tpu.dataset.kitti.utils import KittiObjectClass
        from d3d_tpu import native

        tta = make_tta_detector(det, [KittiObjectClass.Car],
                                modes=FLIP_MODES, score_threshold=0.0,
                                iou_threshold=0.3)
        out = tta(pts, frame="velo")
        assert len(out) >= 1
        for o in out:
            assert np.isfinite(o.position).all()
        # merged-ensemble NMS invariant on the kept set
        if native.available() and len(out) > 1:
            bev = np.stack([[o.position[0], o.position[1], o.dimension[0],
                             o.dimension[1], o.yaw] for o in out])
            iou = native.rbox_iou_matrix(bev, bev)
            np.fill_diagonal(iou, 0)
            assert iou.max() <= 0.3 + 1e-6
