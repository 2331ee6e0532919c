"""CenterPoint velocity head + velocity-backcast tracker: target/loss
plumbing, decode, the backcast association (incl. why it beats zero
velocity), coasting and pruning."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from scipy.spatial.transform import Rotation

from d3d_tpu.abstraction import ObjectTag, Target3DArray, TrackingTarget3D
from d3d_tpu.dataset.kitti.utils import KittiObjectClass
from d3d_tpu.models.centerpoint import (CenterPoint, CenterPointConfig,
                                        assign_center_targets,
                                        center_loss, decode_centers,
                                        make_train_step)
from d3d_tpu.tracking import CenterTracker

CAR = KittiObjectClass.Car
PED = KittiObjectClass.Pedestrian

VEL_CFG = CenterPointConfig(
    bounds=(0.0, 16.0, -8.0, 8.0, -3.0, 1.0),
    grid=(32, 32), max_pillars=256, max_points_per_pillar=16,
    pfn_features=32, backbone_channels=(32, 64), backbone_blocks=(1, 1),
    upsample_channels=32, head_channels=16, window=9, top_k=8,
    predict_velocity=True)


def _det(x, y, vx=0.0, vy=0.0, score=0.9, cls=CAR):
    return TrackingTarget3D([x, y, 0.0], Rotation.identity(),
                            [4.0, 2.0, 1.6], [vx, vy, 0.0], [0, 0, 0],
                            ObjectTag(cls, scores=score))


def _frame(dets, t_us):
    return Target3DArray(dets, frame="velo", timestamp=t_us)


class TestVelocityHead:
    def test_targets_carry_velocity(self, rng):
        gt = jnp.asarray([[8.0, 0.0, -1.0, 3.9, 1.6, 1.56, 0.3]],
                         jnp.float32)
        gv = jnp.asarray([[4.0, -2.0]], jnp.float32)
        t = assign_center_targets(VEL_CFG, gt, jnp.zeros(1, jnp.int32),
                                  jnp.ones(1, bool), gv)
        assert t["vec"].shape == (32, 32, 10)
        vx, vy, _ = VEL_CFG.voxel_size
        ix = int((8.0 - VEL_CFG.bounds[0]) / vx)
        iy = int((0.0 - VEL_CFG.bounds[2]) / vy)
        np.testing.assert_allclose(np.asarray(t["vec"][ix, iy, 8:]),
                                   [4.0, -2.0], atol=1e-6)

    def test_decode_returns_velocity(self, rng):
        w, h = VEL_CFG.grid
        outputs = dict(
            heatmap=jnp.full((w, h, 1), -8.0).at[10, 12, 0].set(8.0),
            reg=jnp.zeros((w, h, 2)), height=jnp.zeros((w, h, 1)),
            dim=jnp.zeros((w, h, 3)), rot=jnp.zeros((w, h, 2)),
            vel=jnp.full((w, h, 2), 1.5))
        boxes, scores, labels, vel = decode_centers(VEL_CFG, outputs)
        assert vel.shape == (VEL_CFG.top_k, 2)
        np.testing.assert_allclose(np.asarray(vel[0]), [1.5, 1.5],
                                   atol=1e-6)

    def test_train_step_with_velocity(self, rng):
        from d3d_tpu.models import pillarize
        from d3d_tpu.models.pointpillars import PointPillarsConfig

        pcfg = PointPillarsConfig(
            bounds=VEL_CFG.bounds, grid=VEL_CFG.grid,
            max_pillars=VEL_CFG.max_pillars,
            max_points_per_pillar=VEL_CFG.max_points_per_pillar,
            pfn_features=VEL_CFG.pfn_features)
        pts = np.stack([rng.random(512) * 16, rng.random(512) * 16 - 8,
                        rng.random(512) * 4 - 3, rng.random(512)],
                       axis=1).astype(np.float32)[None]
        feats, coords, valid = jax.vmap(
            lambda p: pillarize(p, pcfg))(jnp.asarray(pts))
        batch = dict(
            features=feats, coords=coords, valid=valid,
            gt_boxes=jnp.asarray([[[8.0, 0.0, -1.0, 3.9, 1.6, 1.56, 0.3]]],
                                 jnp.float32),
            gt_labels=jnp.zeros((1, 1), jnp.int32),
            gt_mask=jnp.ones((1, 1), bool),
            gt_velocity=jnp.asarray([[[3.0, -1.0]]], jnp.float32))
        model = CenterPoint(VEL_CFG)
        v = model.init(jax.random.PRNGKey(0), feats, coords, valid)
        assert "vel_out" in str(jax.tree_util.tree_structure(v["params"])) \
            or "vel_conv" in v["params"]
        opt = optax.adam(1e-3)
        step = jax.jit(make_train_step(model, opt, VEL_CFG))
        params, bs, st = v["params"], v["batch_stats"], opt.init(v["params"])
        first = None
        for _ in range(6):
            params, bs, st, aux = step(params, bs, st, batch)
            if first is None:
                first = float(aux["total"])
        assert float(aux["total"]) < first


class TestCenterTracker:
    def test_backcast_keeps_fast_track(self):
        """Object moving 2 m/frame with a 1 m gate: zero-velocity
        association breaks the track, the backcast keeps it."""
        def run(with_vel):
            trk = CenterTracker(distance_threshold=1.0, lost_time=0.05)
            ids = []
            for t in range(4):
                x = 2.0 * t
                v = 20.0 if with_vel else 0.0   # 2 m per 0.1 s frame
                trk.update(_frame([_det(x, 0.0, vx=v)], t * 100_000))
                rep = trk.report()
                ids.append(rep[0].tid if len(rep) else None)
            return ids

        with_vel = run(True)
        assert len(set(with_vel)) == 1, with_vel
        without = run(False)
        assert len(set(without)) > 1, without

    def test_class_gate(self):
        trk = CenterTracker(distance_threshold=2.0, lost_time=10.0)
        trk.update(_frame([_det(5, 0, cls=CAR)], 0))
        tid0 = trk.report()[0].tid
        trk.update(_frame([_det(5, 0, cls=PED)], 100_000))
        rep = trk.report()
        # the ped started a NEW track; the car track coasts
        tids = {o.tid for o in rep}
        labels = {o.tid: o.tag_top for o in rep}
        assert len(rep) == 2 and tid0 in tids
        new = (tids - {tid0}).pop()
        assert labels[new] == PED and labels[tid0] == CAR

    def test_coast_and_reassociate(self):
        trk = CenterTracker(distance_threshold=1.0, lost_time=0.25)
        trk.update(_frame([_det(2, 0, vx=10.0)], 0))
        tid0 = trk.report()[0].tid
        # miss one frame: the track coasts to x=3 on its velocity
        trk.update(_frame([], 100_000))
        assert trk.report()[0].tid == tid0
        np.testing.assert_allclose(trk.report()[0].position[0], 3.0,
                                   atol=1e-6)
        # reappears where the coasted track is
        trk.update(_frame([_det(4, 0, vx=10.0)], 200_000))
        rep = trk.report()
        assert len(rep) == 1 and rep[0].tid == tid0

    def test_prune_after_lost_time(self):
        trk = CenterTracker(distance_threshold=1.0, lost_time=0.15)
        trk.update(_frame([_det(2, 0)], 0))
        trk.update(_frame([], 100_000))
        assert len(trk.report()) == 1
        trk.update(_frame([], 200_000))
        assert len(trk.report()) == 0

    def test_greedy_prefers_higher_score(self):
        trk = CenterTracker(distance_threshold=5.0, lost_time=10.0)
        trk.update(_frame([_det(5, 0)], 0))
        tid0 = trk.report()[0].tid
        # two detections in the gate: the higher-score one claims the track
        trk.update(_frame([_det(5.5, 0, score=0.4),
                           _det(5.2, 0, score=0.9)], 100_000))
        rep = {o.tid: o for o in trk.report()}
        assert len(rep) == 2
        np.testing.assert_allclose(rep[tid0].position[0], 5.2, atol=1e-6)


def test_velocity_detector_emits_tracking_targets(rng):
    from d3d_tpu.models import pillarize
    from d3d_tpu.models.inference import make_centerpoint_detector
    from d3d_tpu.models.pointpillars import PointPillarsConfig

    pcfg = PointPillarsConfig(
        bounds=VEL_CFG.bounds, grid=VEL_CFG.grid,
        max_pillars=VEL_CFG.max_pillars,
        max_points_per_pillar=VEL_CFG.max_points_per_pillar,
        pfn_features=VEL_CFG.pfn_features)
    pts = np.stack([rng.random(1024) * 16, rng.random(1024) * 16 - 8,
                    rng.random(1024) * 4 - 3, rng.random(1024)],
                   axis=1).astype(np.float32)
    model = CenterPoint(VEL_CFG)
    feats, coords, valid = pillarize(jnp.asarray(pts), pcfg)
    v = model.init(jax.random.PRNGKey(0), feats[None], coords[None],
                   valid[None])
    det = make_centerpoint_detector(model, v, VEL_CFG, pcfg, [CAR],
                                    score_threshold=0.0)
    out = det(pts, frame="velo", timestamp=100)
    assert all(isinstance(o, TrackingTarget3D) for o in out)
    assert all(np.isfinite(np.asarray(o.velocity)).all() for o in out)
