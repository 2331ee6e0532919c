"""Device-resident tracker: trajectory-level parity with the host
CenterTracker on a random multi-object sequence, the coast/prune
scenarios, capacity-overflow behavior, and the fused detect+track
serving step."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from d3d_tpu.abstraction import ObjectTag, Target3DArray, TrackingTarget3D
from d3d_tpu.dataset.kitti.utils import KittiObjectClass
from d3d_tpu.tracking import CenterTracker
from d3d_tpu.tracking.device_tracker import (DeviceCenterTracker,
                                             make_tracking_step,
                                             tracker_init, tracker_report,
                                             tracker_update)

CAR = KittiObjectClass.Car
PED = KittiObjectClass.Pedestrian
CLASSES = [CAR, PED]


def _det(x, y, vx=0.0, vy=0.0, score=0.9, cls=CAR):
    return TrackingTarget3D([x, y, 0.0], Rotation.identity(),
                            [4.0, 2.0, 1.6], [vx, vy, 0.0], [0, 0, 0],
                            ObjectTag(cls, scores=score))


def _frame(dets, t_us):
    return Target3DArray(dets, frame="velo", timestamp=t_us)


def _trajectories(reports):
    """tid -> [(frame_idx, rounded position)] across a report list."""
    out = {}
    for fi, rep in enumerate(reports):
        for o in rep:
            out.setdefault(o.tid, []).append(
                (fi, tuple(np.round(np.asarray(o.position[:2]), 4))))
    return out


class TestHostParity:
    def test_random_sequence_trajectory_isomorphism(self, rng):
        """Same trajectories (same positions grouped into the same tracks
        over time), tid numbering aside."""
        ntr = 6
        pos = rng.uniform(-20, 20, (ntr, 2))
        vel = rng.normal(0, 2.0, (ntr, 2))
        cls = [CAR, CAR, CAR, PED, PED, CAR]
        host = CenterTracker(distance_threshold=2.0, lost_time=0.25)
        dev = DeviceCenterTracker(CLASSES, distance_threshold=2.0,
                                  lost_time=0.25)
        host_reps, dev_reps = [], []
        for f in range(8):
            t_us = f * 100_000
            dets = []
            for i in range(ntr):
                if f >= 3 and i == 2:
                    continue  # track 2 disappears -> coasts, then prunes
                p = pos[i] + 0.1 * f * vel[i]
                dets.append(_det(p[0], p[1], 0.1 * vel[i][0] * 10,
                                 0.1 * vel[i][1] * 10,
                                 score=0.5 + 0.07 * i, cls=cls[i]))
            if f >= 4:  # a newcomer
                dets.append(_det(30.0 + f, -30.0, 1.0, 0.0, score=0.95))
            fr = _frame(dets, t_us)
            host.update(fr)
            dev.update(fr)
            host_reps.append(host.report())
            dev_reps.append(dev.report())

        th = _trajectories(host_reps)
        td = _trajectories(dev_reps)
        assert len(th) == len(td)
        # match trajectories by their full (frame, position) signature
        sig_h = sorted(tuple(v) for v in th.values())
        sig_d = sorted(tuple(v) for v in td.values())
        assert sig_h == sig_d

    def test_report_fields(self, rng):
        dev = DeviceCenterTracker(CLASSES, distance_threshold=2.0)
        dev.update(_frame([_det(1.0, 2.0, 3.0, -1.0, score=0.8),
                           _det(5.0, -4.0, cls=PED, score=0.6)], 0))
        rep = dev.report()
        assert len(rep) == 2 and rep.frame == "velo"
        assert all(isinstance(o, TrackingTarget3D) for o in rep)
        by_cls = {o.tag_top: o for o in rep}
        np.testing.assert_allclose(by_cls[CAR].velocity[:2], [3.0, -1.0],
                                   atol=1e-6)
        assert by_cls[CAR].tag_top_score == pytest.approx(0.8, abs=1e-6)
        assert sorted(o.tid for o in rep) == [1, 2]


class TestScenarios:
    def test_coast_and_prune(self):
        """Mirror of the host tracker's coast test: a missed frame coasts
        the track on its velocity; exceeding lost_time prunes it."""
        dev = DeviceCenterTracker([CAR], distance_threshold=1.5,
                                  lost_time=0.15)
        dev.update(_frame([_det(1.0, 0.0, 10.0, 0.0)], 0))
        tid0 = dev.report()[0].tid
        dev.update(_frame([], 100_000))  # miss: coast to x=2
        rep = dev.report()
        assert len(rep) == 1 and rep[0].tid == tid0
        np.testing.assert_allclose(rep[0].position[0], 2.0, atol=1e-6)
        # re-acquire on the coasted position
        dev.update(_frame([_det(3.0, 0.0, 10.0, 0.0)], 200_000))
        rep = dev.report()
        assert len(rep) == 1 and rep[0].tid == tid0
        # two more misses exceed lost_time -> pruned
        dev.update(_frame([], 300_000))
        dev.update(_frame([], 400_000))
        assert len(dev.report()) == 0

    def test_coast_advances_z_like_host(self):
        """Host CenterTracker coasts the FULL 3D position; the device
        state must carry vz too (review finding: only xy coasted)."""
        host = CenterTracker(distance_threshold=1.5, lost_time=0.5)
        dev = DeviceCenterTracker([CAR], distance_threshold=1.5,
                                  lost_time=0.5)
        d = TrackingTarget3D([1.0, 0.0, -0.5], Rotation.identity(),
                             [4.0, 2.0, 1.6], [2.0, 0.0, 0.8], [0, 0, 0],
                             ObjectTag(CAR, scores=0.9))
        host.update(_frame([d], 0))
        dev.update(_frame([d], 0))
        host.update(_frame([], 100_000))
        dev.update(_frame([], 100_000))
        hz = host.report()[0].position[2]
        dz = dev.report()[0].position[2]
        np.testing.assert_allclose(dz, hz, atol=1e-6)
        np.testing.assert_allclose(dz, -0.5 + 0.1 * 0.8, atol=1e-6)

    def test_unknown_class_ignored(self):
        dev = DeviceCenterTracker([CAR], distance_threshold=1.5)
        dev.update(_frame([_det(0.0, 0.0, cls=CAR),
                           _det(5.0, 5.0, cls=PED)], 0))
        rep = dev.report()
        assert len(rep) == 1 and rep[0].tag_top == CAR

    def test_backcast_beats_zero_velocity(self):
        """An object moving 2 m/frame with a 1 m gate only keeps its id
        because the backcast cancels the motion."""
        dev = DeviceCenterTracker([CAR], distance_threshold=1.0)
        dev.update(_frame([_det(0.0, 0.0, 20.0, 0.0)], 0))
        tid0 = dev.report()[0].tid
        for f in range(1, 4):
            dev.update(_frame([_det(2.0 * f, 0.0, 20.0, 0.0)],
                              f * 100_000))
            rep = dev.report()
            assert len(rep) == 1 and rep[0].tid == tid0

    def test_class_gate(self):
        dev = DeviceCenterTracker(CLASSES, distance_threshold=5.0)
        dev.update(_frame([_det(0.0, 0.0, cls=CAR)], 0))
        dev.update(_frame([_det(0.1, 0.0, cls=PED)], 100_000))
        rep = dev.report()
        # the PED detection may not continue the CAR track
        assert len(rep) == 2
        tids = {o.tag_top: o.tid for o in rep}
        assert tids[CAR] != tids[PED]

    def test_capacity_drops_lowest_scores(self):
        dev = DeviceCenterTracker([CAR], distance_threshold=0.5,
                                  capacity=4)
        dets = [_det(3.0 * i, 0.0, score=0.1 + 0.1 * i) for i in range(6)]
        dev.update(_frame(dets, 0))
        rep = dev.report()
        assert len(rep) == 4
        # the four HIGHEST scores survive
        assert sorted(round(o.tag_top_score, 3) for o in rep) == \
            [0.3, 0.4, 0.5, 0.6]


class TestSequenceScan:
    def test_scan_matches_per_frame_loop(self, rng):
        """tracker_scan_sequence (whole sequence, one dispatch) must be
        array-identical to the per-frame tracker_update loop."""
        from d3d_tpu.tracking.device_tracker import tracker_scan_sequence

        F, D = 12, 16
        boxes = rng.normal(0, 10, (F, D, 7)).astype(np.float32)
        boxes[..., 3:6] = np.abs(boxes[..., 3:6]) + 1
        scores = rng.random((F, D)).astype(np.float32)
        labels = rng.integers(0, 2, (F, D)).astype(np.int32)
        vel = rng.normal(0, 2, (F, D, 3)).astype(np.float32)
        valid = rng.random((F, D)) < 0.8
        dts = np.full(F, 0.1, np.float32)
        dts[0] = 0.0
        thr = jnp.asarray([2.0, 3.0], jnp.float32)
        lt = jnp.float32(0.3)

        st_a = tracker_init(32)
        snaps = []
        for f in range(F):
            st_a = tracker_update(st_a, jnp.asarray(boxes[f]),
                                  jnp.asarray(scores[f]),
                                  jnp.asarray(labels[f]),
                                  jnp.asarray(vel[f]),
                                  jnp.asarray(valid[f]),
                                  jnp.float32(dts[f]), thr, lt)
            snaps.append(jax.tree.map(np.asarray, st_a))

        st_b, per_frame = tracker_scan_sequence(
            tracker_init(32), jnp.asarray(boxes), jnp.asarray(scores),
            jnp.asarray(labels), jnp.asarray(vel), jnp.asarray(valid),
            jnp.asarray(dts), thr, lt)
        for k in snaps[-1]:
            np.testing.assert_array_equal(
                np.asarray(st_b[k]), snaps[-1][k], err_msg=k)
            pf = np.asarray(per_frame[k])
            for f in range(F):
                np.testing.assert_array_equal(pf[f], snaps[f][k],
                                              err_msg=f"{k}@{f}")


class TestFusedStep:
    def test_detect_track_one_program(self, rng):
        from tests.test_center_tracker import VEL_CFG
        from d3d_tpu.models import pillarize
        from d3d_tpu.models.centerpoint import CenterPoint
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
        f, c, v = pillarize(jnp.asarray(pts), pcfg)
        var = model.init(jax.random.PRNGKey(0), f[None], c[None], v[None])
        det = make_centerpoint_detector(model, var, VEL_CFG, pcfg, [CAR],
                                        score_threshold=0.0)
        step = make_tracking_step(det.device_fn, thresholds=[2.0],
                                  capacity=32, score_threshold=0.0)
        state = step.init()
        state, out = step(state, jnp.asarray(pts), jnp.float32(0.0))
        n0 = int(np.asarray(state["active"]).sum())
        assert n0 >= 1
        tids0 = set(np.asarray(state["tid"])[np.asarray(state["active"])])
        # same scene 0.1 s later: ids persist
        state, out = step(state, jnp.asarray(pts), jnp.float32(0.1))
        tids1 = set(np.asarray(state["tid"])[np.asarray(state["active"])])
        assert tids0 & tids1
        rep = tracker_report(state, [CAR], frame="velo",
                             timestamp=100_000)
        assert all(isinstance(o, TrackingTarget3D) for o in rep)

        # the fused step is a serving artifact: StableHLO export + call
        from jax import export as jax_export

        sds = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
            (state, jnp.asarray(pts), jnp.float32(0.1)))
        exp = jax_export.export(step)(*sds)
        re = jax_export.deserialize(exp.serialize())
        state2, out2 = re.call(state, jnp.asarray(pts), jnp.float32(0.1))
        np.testing.assert_array_equal(np.asarray(state2["tid"]),
                                      np.asarray(state["tid"]))


def test_fused_step_score_gate(rng):
    """make_tracking_step's admission gate: low-score NMS survivors must
    NOT allocate tracks (they would saturate the slot table)."""
    boxes = jnp.asarray(rng.normal(0, 10, (8, 7)), jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.2, 0.1, 0.05, 0.4, 0.01, 0.6],
                         jnp.float32)
    labels = jnp.zeros(8, jnp.int32)
    keep = jnp.ones(8, bool)

    def fake_detector(points):
        del points
        return boxes, scores, labels, keep

    step = make_tracking_step(fake_detector, thresholds=[0.5],
                              capacity=16, score_threshold=0.3)
    state, _ = step(step.init(), jnp.zeros((4, 4), jnp.float32),
                    jnp.float32(0.0))
    assert int(np.asarray(state["active"]).sum()) == 4  # 0.9/0.8/0.4/0.6


def test_reset_starts_fresh_sequence():
    dev = DeviceCenterTracker([CAR], distance_threshold=1.5)
    dev.update(_frame([_det(0.0, 0.0), _det(5.0, 0.0)], 0))
    assert len(dev.report()) == 2
    dev.reset()
    assert len(dev.report()) == 0
    dev.update(_frame([_det(1.0, 1.0)], 0))
    rep = dev.report()
    assert len(rep) == 1
    assert rep[0].tid == 3  # tids keep counting across sequences


@pytest.mark.parametrize("seed", [1, 7, 13])
def test_trajectory_isomorphism_seeds(seed):
    """Parity soak across seeds: separated random tracks (no borderline
    distances) must produce identical trajectory signatures."""
    rng = np.random.default_rng(seed)
    ntr = 5
    # centers snapped to a 6 m lattice: every cross-track distance is
    # far from the 2 m gate, so f32-vs-f64 cannot flip a decision
    pos = rng.permutation(36)[:ntr]
    pos = np.stack([pos // 6, pos % 6], axis=1) * 6.0 - 15.0
    vel = rng.normal(0, 1.0, (ntr, 2)).round(1)
    host = CenterTracker(distance_threshold=2.0, lost_time=0.25)
    dev = DeviceCenterTracker([CAR], distance_threshold=2.0,
                              lost_time=0.25)
    hr, dr = [], []
    for f in range(6):
        dets = [_det(pos[i][0] + 0.1 * f * vel[i][0],
                     pos[i][1] + 0.1 * f * vel[i][1],
                     vel[i][0], vel[i][1],
                     score=0.5 + 0.08 * i)
                for i in range(ntr) if not (f == 3 and i == seed % ntr)]
        fr = _frame(dets, f * 100_000)
        host.update(fr)
        dev.update(fr)
        hr.append(host.report())
        dr.append(dev.report())
    th, td = _trajectories(hr), _trajectories(dr)
    assert sorted(map(tuple, th.values())) == \
        sorted(map(tuple, td.values()))


def test_scan_sequence_exports(rng):
    """The whole-sequence tracking scan serializes through jax.export
    (the offline-tracking serving artifact)."""
    from jax import export as jax_export
    from d3d_tpu.tracking.device_tracker import (tracker_init,
                                                 tracker_scan_sequence)

    F, D = 4, 8
    args = (tracker_init(16),
            jnp.asarray(rng.normal(0, 10, (F, D, 7)), jnp.float32),
            jnp.asarray(rng.random((F, D)), jnp.float32),
            jnp.zeros((F, D), jnp.int32),
            jnp.zeros((F, D, 3), jnp.float32),
            jnp.ones((F, D), bool),
            jnp.asarray([0.0, 0.1, 0.1, 0.1], jnp.float32),
            jnp.asarray([2.0], jnp.float32),
            jnp.float32(0.3))
    sds = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                      args)
    exp = jax_export.export(tracker_scan_sequence)(*sds)
    re = jax_export.deserialize(exp.serialize())
    want_final, _ = tracker_scan_sequence(*args)
    got_final, _ = re.call(*args)
    for k in want_final:
        np.testing.assert_array_equal(np.asarray(got_final[k]),
                                      np.asarray(want_final[k]), err_msg=k)
