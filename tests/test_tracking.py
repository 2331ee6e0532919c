"""Tracking stack tests: matcher fixtures (same as the reference suite),
plus UKF/KF convergence and full VanillaTracker scenarios — the reference
ships no filter/tracker tests (SURVEY.md §4), these close that gap."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from d3d_tpu.abstraction import ObjectTag, ObjectTarget3D, Target3DArray
from d3d_tpu.dataset.kitti.utils import KittiObjectClass
from d3d_tpu.tracking import (
    Box_KF,
    DistanceTypes,
    HungarianMatcher,
    NearestNeighborMatcher,
    Pose_3DOF_UKF_CTRA,
    Pose_3DOF_UKF_CV,
    Pose_3DOF_UKF_CTRV,
    ScoreMatcher,
    VanillaTracker,
    motion_CTRA,
    motion_CV,
    wrap_angle,
)


def _obj(pos, cls, score=1.0, yaw=0.0, dim=(2, 2, 2)):
    return ObjectTarget3D(
        pos, Rotation.from_euler("Z", yaw), dim,
        ObjectTag(cls, KittiObjectClass, scores=score),
    )


@pytest.fixture
def matcher_case():
    dt_boxes = Target3DArray([
        _obj([0, 0, 0], KittiObjectClass.Car, 0.8),
        _obj([1, 1, 0], KittiObjectClass.Van, 0.7),
        _obj([-1, -1, 0], KittiObjectClass.Car, 0.8),
    ], frame="test")
    gt_boxes = Target3DArray([
        _obj([0, 0, 0], KittiObjectClass.Van),
        _obj([-1, 1, 0], KittiObjectClass.Car),
        _obj([1, -1, 0], KittiObjectClass.Van),
    ], frame="test")
    return dt_boxes, gt_boxes


THRESH = {KittiObjectClass.Car.value: 1.5, KittiObjectClass.Van.value: 1.5}


@pytest.mark.parametrize(
    "cls", [NearestNeighborMatcher, ScoreMatcher, HungarianMatcher])
def test_matchers(matcher_case, cls):
    src, dst = matcher_case
    matcher = cls()
    matcher.prepare_boxes(src, dst, DistanceTypes.Position)
    matcher.match(list(range(len(src))), list(range(len(dst))), THRESH)
    assert matcher.num_of_matches() == 2
    assert matcher.query_dst_match(1) in [0, 2]
    assert matcher.query_src_match(1) == 0


def test_matcher_riou(matcher_case):
    src, dst = matcher_case
    matcher = NearestNeighborMatcher()
    matcher.prepare_boxes(src, dst, DistanceTypes.RIoU)
    # identical overlapping boxes have distance 0
    assert matcher._distance_cache[0, 0] < 0.01
    matcher.match(list(range(len(src))), list(range(len(dst))),
                  {KittiObjectClass.Car.value: 0.9,
                   KittiObjectClass.Van.value: 0.9})
    assert matcher.num_of_matches() >= 1


def test_matcher_frame_mismatch(matcher_case):
    src, dst = matcher_case
    dst.frame = "other"
    with pytest.raises(ValueError):
        ScoreMatcher().prepare_boxes(src, dst, DistanceTypes.Position)


class TestMotionModels:
    def test_cv(self):
        s = motion_CV(np.array([0.0, 0, 1, 2]), 0.5)
        assert np.allclose(s, [0.5, 1, 1, 2])

    def test_ctra_zero_turn(self):
        # straight line with acceleration
        s = motion_CTRA(np.array([0.0, 0, 0, 1, 2, 0]), 1.0)
        assert np.allclose(s[:4], [2.0, 0, 0, 3])  # x += (v+nv)/2*dt

    def test_ctra_full_circle(self):
        # constant speed, turning: after half period heading flips
        w = np.pi / 2
        s = motion_CTRA(np.array([0.0, 0, 0, 1, 0, w]), 2.0)
        assert abs(wrap_angle(s[2] - np.pi)) < 1e-9
        # radius = v/w; after half turn y = 2r
        assert abs(s[1] - 2 / w) < 1e-9


class TestFilters:
    def test_box_kf_converges(self, rng):
        init = _obj([0, 0, 0], KittiObjectClass.Car, dim=(4, 2, 2))
        init.dimension_var = np.eye(3)
        f = Box_KF(init, Q=0.01 * np.eye(3))
        for _ in range(30):
            f.predict(0.1)
            obs = _obj([0, 0, 0], KittiObjectClass.Car, dim=(5, 2.5, 1.8))
            obs.dimension_var = 0.1 * np.eye(3)
            f.update(obs)
        assert np.allclose(f.dimension, [5, 2.5, 1.8], atol=0.05)

    def _run_pose_filter(self, factory, rng):
        # ground truth: constant velocity (2, 1) m/s heading 0.4636 rad
        def gt_pos(t):
            return np.array([2 * t, 1 * t, 0.0])

        yaw = np.arctan2(1, 2)
        init = _obj(gt_pos(0), KittiObjectClass.Car, yaw=yaw)
        init.position_var = 0.04 * np.eye(3)
        init.orientation_var = 0.01
        dim = {Pose_3DOF_UKF_CV: 4, Pose_3DOF_UKF_CTRV: 5,
               Pose_3DOF_UKF_CTRA: 6}[factory]
        f = factory(init, Q=0.01 * np.eye(dim))
        for i in range(1, 40):
            t = 0.1 * i
            f.predict(0.1)
            obs = _obj(gt_pos(t) + rng.normal(0, 0.05, 3),
                       KittiObjectClass.Car, yaw=yaw + rng.normal(0, 0.02))
            obs.position_var = 0.04 * np.eye(3)
            obs.orientation_var = 0.01
            f.update(obs)
        return f, gt_pos(0.1 * 39)

    @pytest.mark.parametrize(
        "factory", [Pose_3DOF_UKF_CV, Pose_3DOF_UKF_CTRA, Pose_3DOF_UKF_CTRV])
    def test_pose_filters_track_cv_motion(self, factory, rng):
        f, expected = self._run_pose_filter(factory, rng)
        assert np.allclose(f.position[:2], expected[:2], atol=0.3)
        # velocity estimate should approach (2, 1)
        assert np.allclose(f.velocity[:2], [2, 1], atol=0.5)


class TestVanillaTracker:
    def _frame(self, t_us, positions, cls=KittiObjectClass.Car):
        arr = Target3DArray(frame="ego", timestamp=t_us)
        for p in positions:
            o = _obj(p, cls, 0.9)
            o.position_var = 0.01 * np.eye(3)
            o.orientation_var = 0.01
            arr.append(o)
        return arr

    def test_track_two_objects(self):
        tracker = VanillaTracker(
            pose_tracker_factory=lambda init: Pose_3DOF_UKF_CTRA(
                init, Q=0.01 * np.eye(6)),
            matcher_distance_threshold=2.0, lost_time=0.5)
        # two objects moving apart at 1 m/s for 30 frames @ 10Hz
        ids_seen = []
        for i in range(30):
            t = i * 0.1
            dets = self._frame(int(t * 1e6), [
                [5 + t, 0, 0], [-5 - t, 0, 0],
            ])
            tracker.update(dets)
            rep = tracker.report()
            assert len(rep) == 2
            ids_seen.append(sorted(o.tid for o in rep))
        # ids stay stable across all frames
        assert all(ids == ids_seen[0] for ids in ids_seen)
        rep = tracker.report()
        # velocity approximately +-1 m/s in x
        vels = sorted(o.velocity[0] for o in rep)
        assert abs(vels[0] + 1) < 0.5 and abs(vels[1] - 1) < 0.5
        assert all(o.history > 0 for o in rep)

    def test_lost_track_pruned(self):
        tracker = VanillaTracker(matcher_distance_threshold=2.0, lost_time=0.15)
        tracker.update(self._frame(0, [[0, 0, 0], [8, 0, 0]]))
        assert len(tracker.tracked_ids) == 2
        # object 2 disappears; after lost_time it must be pruned
        tracker.update(self._frame(100_000, [[0, 0, 0]]))
        tracker.update(self._frame(200_000, [[0, 0, 0]]))
        tracker.update(self._frame(300_000, [[0, 0, 0]]))
        assert len(tracker.tracked_ids) == 1

    def test_new_track_gets_new_id(self):
        tracker = VanillaTracker(matcher_distance_threshold=1.0, lost_time=10)
        tracker.update(self._frame(0, [[0, 0, 0]]))
        tracker.update(self._frame(100_000, [[0, 0, 0], [50, 0, 0]]))
        assert len(tracker.tracked_ids) == 2
        assert sorted(tracker.tracked_ids) == [1, 2]


class TestPoseIMM:
    def _target(self, x, y, yaw, pvar=0.04, ovar=0.04):
        from scipy.spatial.transform import Rotation
        from d3d_tpu.abstraction import ObjectTag, ObjectTarget3D
        from d3d_tpu.dataset.kitti.utils import KittiObjectClass

        return ObjectTarget3D(
            [x, y, 0.0], Rotation.from_euler("Z", yaw), [4, 2, 1.5],
            ObjectTag(KittiObjectClass.Car, scores=1.0),
            position_var=np.eye(3) * pvar, orientation_var=ovar)

    def _run(self, xs, ys, yaws, dt=0.5):
        from d3d_tpu.tracking.filter import Pose_IMM

        imm = Pose_IMM(self._target(xs[0], ys[0], yaws[0]),
                       Q_ctrv=np.eye(5) * 0.01, Q_ctra=np.eye(6) * 0.01)
        for x, y, w in zip(xs[1:], ys[1:], yaws[1:]):
            imm.predict(dt)
            imm.update(self._target(x, y, w))
        return imm

    def test_maneuver_raises_ctra_probability(self):
        """A hard-accelerating track favors the maneuvering (CTRA) mode."""
        t = np.arange(12) * 0.5
        xs = 0.5 * 3.0 * t ** 2  # a = 3 m/s^2 from rest
        imm = self._run(xs, np.zeros_like(xs), np.zeros_like(xs))
        mu = imm.model_probabilities
        assert mu.shape == (2,) and abs(mu.sum() - 1) < 1e-12
        assert mu[1] > 0.5  # CTRA dominates
        # combined estimate tracks the motion
        assert abs(imm.position[0] - xs[-1]) < 1.0
        assert np.isfinite(imm.velocity).all()
        assert imm.velocity[0] > 3.0  # v = a*t ~ 16.5 m/s at the end

    def test_straight_track_stays_balanced_and_accurate(self):
        """Constant-velocity motion: both models fit; estimates accurate,
        probabilities remain a proper distribution."""
        t = np.arange(12) * 0.5
        xs = 5.0 * t
        imm = self._run(xs, np.zeros_like(xs), np.zeros_like(xs))
        mu = imm.model_probabilities
        assert abs(mu.sum() - 1) < 1e-12 and (mu > 0).all()
        assert abs(imm.position[0] - xs[-1]) < 0.5
        assert abs(imm.velocity[0] - 5.0) < 1.0
        assert abs(imm.angular_velocity[2]) < 0.3
        # covariance surface is sane
        assert imm.position_var[0, 0] > 0
        assert imm.orientation_var > 0

    def test_turning_track(self):
        """Curved motion (constant turn rate) is tracked through the yaw
        state with wrapped statistics."""
        dt, v, w = 0.5, 6.0, 0.35
        t = np.arange(14) * dt
        yaws = w * t
        xs = (v / w) * np.sin(yaws)
        ys = (v / w) * (1 - np.cos(yaws))
        imm = self._run(xs, ys, yaws, dt=dt)
        assert abs(imm.position[0] - xs[-1]) < 1.0
        assert abs(imm.position[1] - ys[-1]) < 1.0
        assert abs(imm.angular_velocity[2] - w) < 0.15
