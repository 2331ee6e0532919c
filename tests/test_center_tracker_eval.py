"""CenterTracker driven through the TrackingEvaluator: the velocity
backcast keeps ids across a fast crossing that a zero-velocity gate
fumbles — measured as CLEAR-MOT id switches, closing the
detector -> tracker -> evaluator loop on framework components only."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from d3d_tpu.abstraction import ObjectTag, Target3DArray, TrackingTarget3D
from d3d_tpu.benchmarks import TrackingEvaluator
from d3d_tpu.dataset.kitti.utils import KittiObjectClass
from d3d_tpu.tracking import CenterTracker

CAR = KittiObjectClass.Car
DT_S = 0.1  # frame period seconds


def _tt(x, y, vx, vy, tid=0, score=None):
    return TrackingTarget3D([x, y, 0.0], Rotation.identity(),
                            [4.0, 2.0, 1.6], [vx, vy, 0.0], [0, 0, 0],
                            ObjectTag(CAR, scores=score), tid=tid)


def _sequence(n_frames=8, speed=15.0):
    """Two cars driving toward each other at |v|=speed in adjacent lanes;
    they pass around the middle of the sequence."""
    gt, det = [], []
    for t in range(n_frames):
        ts = t * int(DT_S * 1e6)
        x1 = -6.0 + speed * DT_S * t
        x2 = 6.0 - speed * DT_S * t
        g = Target3DArray([
            _tt(x1, 1.0, speed, 0.0, tid=1),
            _tt(x2, -1.0, -speed, 0.0, tid=2),
        ], frame="velo", timestamp=ts)
        d = Target3DArray([
            _tt(x1, 1.0, speed, 0.0, score=0.9),
            _tt(x2, -1.0, -speed, 0.0, score=0.85),
        ], frame="velo", timestamp=ts)
        gt.append(g)
        det.append(d)
    return gt, det


def _run_tracker(det_frames, zero_velocity=False):
    trk = CenterTracker(distance_threshold=1.2, lost_time=0.15)
    out = []
    for d in det_frames:
        if zero_velocity:
            d = Target3DArray([
                _tt(o.position[0], o.position[1], 0.0, 0.0,
                    score=o.tag_top_score) for o in d],
                d.frame, d.timestamp)
        trk.update(d)
        out.append(trk.report())
    return out


def _evaluate(gt_frames, trk_frames):
    ev = TrackingEvaluator([CAR], [0.5])
    for g, d in zip(gt_frames, trk_frames):
        ev.add_stats(ev.calc_stats(g, d))
    return ev


def test_backcast_tracking_is_clean():
    gt, det = _sequence()
    ev = _evaluate(gt, _run_tracker(det))
    assert ev.id_switches()[CAR] == 0
    assert ev.fragments()[CAR] == 0
    assert ev.mota()[CAR] == pytest.approx(1.0, abs=1e-9)


def test_zero_velocity_breaks_the_crossing():
    """Same detections with velocities zeroed: 1.5 m/frame steps against a
    1.2 m gate means associations break — the evaluator sees the damage
    (MOTA < 1 from id churn / misses), demonstrating WHY the velocity
    head matters end to end."""
    gt, det = _sequence()
    ev = _evaluate(gt, _run_tracker(det, zero_velocity=True))
    assert ev.mota()[CAR] < 1.0


def test_track_ids_stable_under_missed_frame():
    gt, det = _sequence(n_frames=6)
    # drop every detection in frame 3: tracks coast and re-associate
    det[3] = Target3DArray([], frame="velo",
                           timestamp=det[3].timestamp)
    trk_frames = _run_tracker(det)
    ev = _evaluate(gt, trk_frames)
    assert ev.id_switches()[CAR] == 0
    # one frame of coasting output still matches GT (positions predicted)
    assert len(trk_frames[3]) == 2


def test_device_tracker_matches_host_through_evaluator():
    """DeviceCenterTracker driven through the SAME crossing sequence
    must produce the same CLEAR-MOT outcome as the host tracker:
    perfect MOTA, zero switches — the device tracker closes the
    detector -> tracker -> evaluator loop too."""
    from d3d_tpu.tracking import DeviceCenterTracker

    gt, det = _sequence()
    trk = DeviceCenterTracker([CAR], distance_threshold=1.2,
                              lost_time=0.15)
    out = []
    for d in det:
        trk.update(d)
        out.append(trk.report())
    ev = _evaluate(gt, out)
    assert ev.id_switches()[CAR] == 0
    assert ev.fragments()[CAR] == 0
    assert ev.mota()[CAR] == pytest.approx(1.0, abs=1e-9)

    # and the whole-sequence device scan gives the same MOTA
    from d3d_tpu.tracking.device_tracker import (tracker_init,
                                                 tracker_report,
                                                 tracker_scan_sequence)
    import jax.numpy as jnp

    F, D = len(det), 2
    boxes = np.zeros((F, D, 7), np.float32)
    vel = np.zeros((F, D, 3), np.float32)
    scores = np.zeros((F, D), np.float32)
    for f, d in enumerate(det):
        for j, o in enumerate(d):
            boxes[f, j, :3] = o.position
            boxes[f, j, 3:6] = o.dimension
            vel[f, j] = np.asarray(o.velocity)
            scores[f, j] = o.tag_top_score
    dts = np.full(F, DT_S, np.float32)
    dts[0] = 0.0
    _, per_frame = tracker_scan_sequence(
        tracker_init(16), jnp.asarray(boxes), jnp.asarray(scores),
        jnp.zeros((F, D), jnp.int32), jnp.asarray(vel),
        jnp.ones((F, D), bool), jnp.asarray(dts),
        jnp.asarray([1.2], jnp.float32), jnp.float32(0.15))
    ev2 = TrackingEvaluator([CAR], [0.5])
    import jax
    pf = jax.tree.map(np.asarray, per_frame)
    for f, g in enumerate(gt):
        snap = jax.tree.map(lambda a: a[f], pf)
        rep = tracker_report(snap, [CAR], frame="velo",
                             timestamp=g.timestamp)
        ev2.add_stats(ev2.calc_stats(g, rep))
    assert ev2.mota()[CAR] == pytest.approx(1.0, abs=1e-9)
    assert ev2.id_switches()[CAR] == 0
