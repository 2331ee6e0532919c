"""Parity tests: the on-device batched evaluator vs the host
DetectionEvaluator loop — integer counters must be exact, accuracy stats
f32-close, on randomized scenes including score ties, class filtering and
uncertainty (logpdf) entries."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from d3d_tpu.abstraction import ObjectTag, ObjectTarget3D, Target3DArray
from d3d_tpu.benchmarks import DetectionEvaluator
from d3d_tpu.benchmarks_device import device_calc_stats
from d3d_tpu.dataset.kitti.utils import KittiObjectClass

CAR = KittiObjectClass.Car
VAN = KittiObjectClass.Van
PED = KittiObjectClass.Pedestrian  # never evaluated -> must be ignored


def _random_frame(rng, n, classes, with_var=False, frame="test"):
    boxes = []
    for _ in range(n):
        pos = rng.uniform(-10, 10, 3)
        dim = rng.uniform(1, 4, 3)
        rot = Rotation.from_euler("Z", rng.uniform(-np.pi, np.pi))
        tag = ObjectTag(rng.choice(classes),
                        scores=float(rng.choice([0.3, 0.5, 0.7, 0.7, 0.9])))
        kw = {}
        if with_var and rng.random() < 0.5:
            a = rng.uniform(0.1, 0.5, (3, 3))
            kw["position_var"] = a @ a.T + np.eye(3) * 0.2
            b = rng.uniform(0.1, 0.5, (3, 3))
            kw["dimension_var"] = b @ b.T + np.eye(3) * 0.2
            kw["orientation_var"] = float(rng.uniform(0.05, 1.0))
        boxes.append(ObjectTarget3D(pos, rot, dim, tag, **kw))
    return Target3DArray(boxes, frame=frame)


def _perturbed(rng, gt, keep=0.8, extra=3):
    """Detections = jittered subset of gt + spurious boxes."""
    boxes = []
    for b in gt:
        if rng.random() > keep:
            continue
        rot = Rotation.from_euler("Z", b.yaw + rng.normal(0, 0.05))
        tag = ObjectTag(b.tag.labels[0], scores=float(rng.uniform(0.2, 1.0)))
        boxes.append(ObjectTarget3D(
            b.position + rng.normal(0, 0.3, 3), rot,
            b.dimension * rng.uniform(0.9, 1.1, 3), tag,
            position_var=np.eye(3) * 0.3, dimension_var=np.eye(3) * 0.3,
            orientation_var=float(rng.uniform(0.05, 1.0))))
    boxes += list(_random_frame(rng, extra, [CAR, VAN, PED], with_var=True))
    return Target3DArray(boxes, frame=gt.frame)


def _assert_stats_match(host, dev, classes, ctx=""):
    for k in (c.value for c in classes):
        assert host.ngt[k] == dev.ngt[k], ctx
        for fld in ("ndt", "tp", "fp", "fn"):
            np.testing.assert_array_equal(
                getattr(host, fld)[k], getattr(dev, fld)[k],
                err_msg=f"{ctx} field {fld} class {k}")
        for fld in ("acc_iou", "acc_angular", "acc_dist", "acc_box",
                    "acc_var"):
            h = getattr(host, fld)[k]
            d = getattr(dev, fld)[k]
            np.testing.assert_array_equal(np.isnan(h), np.isnan(d),
                                          err_msg=f"{ctx} {fld} nan mask")
            np.testing.assert_array_equal(np.isinf(h), np.isinf(d),
                                          err_msg=f"{ctx} {fld} inf mask")
            m = np.isfinite(h)
            np.testing.assert_allclose(d[m], h[m], rtol=2e-4, atol=2e-4,
                                       err_msg=f"{ctx} field {fld}")


class TestDeviceEvaluatorParity:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_per_frame_parity(self, seed):
        rng = np.random.default_rng(seed)
        classes = [CAR, VAN]
        ev = DetectionEvaluator(classes, [0.3, 0.5], pr_sample_count=10)
        gt = _random_frame(rng, 12, [CAR, VAN, PED])
        dt = _perturbed(rng, gt)
        host = ev.calc_stats(gt, dt)
        dev, = device_calc_stats(ev, [gt], [dt], merge=False)
        _assert_stats_match(host, dev, classes, f"seed={seed}")

    def test_score_ties_match_host(self):
        """All scores equal -> assignment decided purely by the (stable)
        tie-break rules, which the device path must replicate."""
        rng = np.random.default_rng(42)
        classes = [CAR]
        ev = DetectionEvaluator(classes, [0.2], pr_sample_count=5)
        r = Rotation.identity()
        gt = Target3DArray([
            ObjectTarget3D([i * 1.5, 0, 0], r, [2, 2, 2], ObjectTag(CAR))
            for i in range(6)], frame="t")
        dt = Target3DArray([
            ObjectTarget3D([i * 1.5 + 0.3, 0.1, 0], r, [2, 2, 2],
                           ObjectTag(CAR, scores=0.7))
            for i in rng.permutation(6)], frame="t")
        host = ev.calc_stats(gt, dt)
        dev, = device_calc_stats(ev, [gt], [dt], merge=False)
        _assert_stats_match(host, dev, classes, "ties")

    def test_batched_merge_equals_sequential(self):
        rng = np.random.default_rng(7)
        classes = [CAR, VAN]
        ev_host = DetectionEvaluator(classes, [0.3, 0.5], pr_sample_count=8)
        ev_dev = DetectionEvaluator(classes, [0.3, 0.5], pr_sample_count=8)
        gts, dts = [], []
        for _ in range(5):
            gt = _random_frame(rng, int(rng.integers(0, 10)), [CAR, VAN, PED])
            gts.append(gt)
            dts.append(_perturbed(rng, gt))
        for g, d in zip(gts, dts):
            ev_host.add_stats(ev_host.calc_stats(g, d))
        ev_dev.add_stats(device_calc_stats(ev_dev, gts, dts))
        _assert_stats_match(ev_host.get_stats(), ev_dev.get_stats(), classes,
                            "batch")
        # headline metrics agree
        for k, v in ev_host.ap().items():
            assert np.isclose(ev_dev.ap()[k], v, atol=1e-5), k

    def test_empty_frames(self):
        classes = [CAR]
        ev = DetectionEvaluator(classes, [0.3], pr_sample_count=4)
        empty = Target3DArray([], frame="t")
        r = Rotation.identity()
        one = Target3DArray([ObjectTarget3D([0, 0, 0], r, [2, 2, 2],
                                            ObjectTag(CAR, scores=0.9))],
                            frame="t")
        for gt, dt in [(empty, empty), (one, empty), (empty, one)]:
            host = ev.calc_stats(gt, dt)
            dev, = device_calc_stats(ev, [gt], [dt], merge=False)
            _assert_stats_match(host, dev, classes, "empty")


class TestShardedEvaluation:
    def test_dp_sharded_matches_unsharded(self):
        """Frames sharded over the mesh dp axis (with empty-frame padding
        for non-divisible counts) must produce identical merged stats."""
        from d3d_tpu.parallel import make_mesh

        rng = np.random.default_rng(3)
        classes = [CAR, VAN]
        ev = DetectionEvaluator(classes, [0.3, 0.5], pr_sample_count=8)
        gts, dts = [], []
        for _ in range(5):  # 5 frames on dp=4 -> exercises padding
            gt = _random_frame(rng, 8, [CAR, VAN, PED])
            gts.append(gt)
            dts.append(_perturbed(rng, gt))
        plain = device_calc_stats(ev, gts, dts)
        mesh = make_mesh(8)
        sharded = device_calc_stats(ev, gts, dts, mesh=mesh)
        _assert_stats_match(plain, sharded, classes, "dp-sharded")


def test_zero_frames_returns_empty_stats():
    ev = DetectionEvaluator([CAR], [0.3], pr_sample_count=4)
    s = device_calc_stats(ev, [], [])
    assert s.ngt[CAR.value] == 0
    assert s.tp[CAR.value].sum() == 0
    assert device_calc_stats(ev, [], [], merge=False) == []


class TestKittiDifficulty:
    def test_difficulty_thresholds(self):
        from d3d_tpu.benchmarks_kitti import kitti_difficulty

        assert kitti_difficulty(50, 0, 0.1) == 0      # easy
        assert kitti_difficulty(30, 0, 0.1) == 1      # height only moderate
        assert kitti_difficulty(50, 1, 0.1) == 1      # occlusion moderate
        assert kitti_difficulty(50, 2, 0.1) == 2      # occlusion hard
        assert kitti_difficulty(50, 0, 0.4) == 2      # truncation hard
        assert kitti_difficulty(20, 0, 0.0) == -1     # too small: ignored

    def test_evaluate_by_difficulty(self):
        from d3d_tpu.benchmarks_kitti import evaluate_by_difficulty

        r = Rotation.identity()

        def gt_obj(x, difficulty):
            return ObjectTarget3D([x, 0, 0], r, [2, 2, 2], ObjectTag(CAR),
                                  aux=dict(difficulty=difficulty))

        gt = Target3DArray([gt_obj(0, 0), gt_obj(5, 1), gt_obj(10, 2),
                            gt_obj(15, -1)], frame="t")
        dt = Target3DArray([
            ObjectTarget3D([x, 0, 0], r, [2, 2, 2],
                           ObjectTag(CAR, scores=0.9))
            for x in (0, 5, 10, 15)], frame="t")

        evs = evaluate_by_difficulty(
            lambda: DetectionEvaluator([CAR], [0.5], pr_sample_count=6),
            [gt], [dt])
        # cumulative strata: easy keeps 1 gt, moderate 2, hard 3
        assert evs["easy"].gt_count()[CAR.value] == 1
        assert evs["moderate"].gt_count()[CAR.value] == 2
        assert evs["hard"].gt_count()[CAR.value] == 3
        lo = float(evs["hard"].score_thresholds[0])
        assert evs["hard"].tp(lo)[CAR] == 3
        # the ignored gt is not counted anywhere
        assert evs["hard"].gt_count()[CAR.value] == 3

    def test_loader_aux_feeds_difficulty(self, tmp_path):
        import sys
        sys.path.insert(0, "tests")
        import kitti_fixture as fx

        from d3d_tpu.dataset.kitti import KittiObjectLoader

        root = tmp_path / "kitti"
        fx.build_unzipped(root, nframes=3)
        loader = KittiObjectLoader(root, inzip=False, trainval_split=1)
        objs = loader.annotation_3dobject(0)
        for obj in objs:
            assert "truncated" in obj.aux and "occluded" in obj.aux
            assert obj.aux["box_height"] > 0


class TestPositionMetric:
    """Center-distance matching (the nuScenes protocol) through both the
    host evaluator and the batched device path."""

    def _frames(self, rng, n=3):
        gts, dts = [], []
        for _ in range(n):
            gt = _random_frame(rng, 10, [CAR, VAN, PED])
            gts.append(gt)
            dts.append(_perturbed(rng, gt))
        return gts, dts

    def test_host_device_parity(self):
        from d3d_tpu.tracking.matcher import DistanceTypes

        rng = np.random.default_rng(5)
        gts, dts = self._frames(rng)
        mk = lambda: DetectionEvaluator(
            [CAR, VAN], [2.0, 1.0], pr_sample_count=8,
            distance_metric=DistanceTypes.Position)
        host, dev = mk(), mk()
        for g, d in zip(gts, dts):
            host.add_stats(host.calc_stats(g, d))
        dev.add_stats(device_calc_stats(dev, gts, dts))
        _assert_stats_match(host.get_stats(), dev.get_stats(), [CAR, VAN],
                            "position metric")

    def test_threshold_is_meters(self):
        from d3d_tpu.tracking.matcher import DistanceTypes

        r = Rotation.identity()
        gt = Target3DArray([ObjectTarget3D([0, 0, 0], r, [2, 2, 2],
                                           ObjectTag(CAR))], frame="t")
        # detection 1.5 m away, zero IoU
        dt = Target3DArray([ObjectTarget3D([1.5, 3.0, 0], r, [2, 2, 2],
                                           ObjectTag(CAR, scores=0.9))],
                           frame="t")
        near = DetectionEvaluator([CAR], [4.0], pr_sample_count=4,
                                  distance_metric=DistanceTypes.Position)
        far = DetectionEvaluator([CAR], [2.0], pr_sample_count=4,
                                 distance_metric=DistanceTypes.Position)
        s4 = device_calc_stats(near, [gt], [dt])
        s2 = device_calc_stats(far, [gt], [dt])
        assert s4.tp[CAR.value][0] == 1   # within 4 m
        assert s2.tp[CAR.value][0] == 0   # beyond 2 m


def test_nuscenes_protocol_composite():
    from d3d_tpu.benchmarks_nuscenes import evaluate_nuscenes_detection

    rng = np.random.default_rng(9)
    gts, dts = [], []
    for _ in range(3):
        gt = _random_frame(rng, 10, [CAR, VAN])
        gts.append(gt)
        dts.append(_perturbed(rng, gt))
    out = evaluate_nuscenes_detection(gts, dts, [CAR, VAN],
                                      pr_sample_count=8)
    assert set(out["ap"][CAR]) == {0.5, 1.0, 2.0, 4.0}
    # looser thresholds admit at least as many matches -> AP monotone
    for c in (CAR, VAN):
        aps = [out["ap"][c][t] for t in (0.5, 1.0, 2.0, 4.0)]
        assert all(b >= a - 1e-9 for a, b in zip(aps, aps[1:])), aps
    assert 0.0 <= out["mean_ap"] <= 1.0001
    assert 0.0 <= out["nds"] <= 1.0001
    assert out["tp_errors"][CAR]["ate"] >= 0


class TestIgnoreSemantics:
    def test_ignored_gt_absorbs_detection(self):
        """Official KITTI IGNORE: a detection matching an ignored gt is
        neither TP nor FP; the ignored gt is never FN."""
        r = Rotation.identity()
        gt = Target3DArray([
            ObjectTarget3D([0, 0, 0], r, [2, 2, 2], ObjectTag(CAR)),
            ObjectTarget3D([10, 0, 0], r, [2, 2, 2], ObjectTag(CAR)),
        ], frame="t")
        dt = Target3DArray([
            ObjectTarget3D([0.1, 0, 0], r, [2, 2, 2],
                           ObjectTag(CAR, scores=0.9)),
            ObjectTarget3D([10.1, 0, 0], r, [2, 2, 2],
                           ObjectTag(CAR, scores=0.9)),
        ], frame="t")
        ignored = np.array([False, True])

        for use_device in (False, True):
            ev = DetectionEvaluator([CAR], [0.3], pr_sample_count=4)
            if use_device:
                s = device_calc_stats(ev, [gt], [dt], gt_ignored=[ignored])
            else:
                s = ev.calc_stats(gt, dt, gt_ignored=ignored)
            k = CAR.value
            assert s.ngt[k] == 1
            assert s.tp[k][0] == 1
            assert s.fp[k][0] == 0, ("matched-to-ignored must not be FP",
                                     use_device)
            assert s.fn[k][0] == 0

    def test_host_device_ignore_parity(self):
        rng = np.random.default_rng(13)
        classes = [CAR, VAN]
        gts, dts, igs = [], [], []
        for _ in range(3):
            gt = _random_frame(rng, 10, [CAR, VAN, PED])
            gts.append(gt)
            dts.append(_perturbed(rng, gt))
            igs.append(rng.random(len(gt)) < 0.3)
        ev_h = DetectionEvaluator(classes, [0.3, 0.5], pr_sample_count=8)
        ev_d = DetectionEvaluator(classes, [0.3, 0.5], pr_sample_count=8)
        for g, d, ig in zip(gts, dts, igs):
            ev_h.add_stats(ev_h.calc_stats(g, d, gt_ignored=ig))
        ev_d.add_stats(device_calc_stats(ev_d, gts, dts, gt_ignored=igs))
        _assert_stats_match(ev_h.get_stats(), ev_d.get_stats(), classes,
                            "ignore parity")

    def test_difficulty_ignore_protocol(self):
        """A detection on a harder-stratum gt must not be FP in the easier
        stratum (the official protocol the helper now implements)."""
        from d3d_tpu.benchmarks_kitti import evaluate_by_difficulty

        r = Rotation.identity()
        gt = Target3DArray([
            ObjectTarget3D([0, 0, 0], r, [2, 2, 2], ObjectTag(CAR),
                           aux=dict(difficulty=0)),
            ObjectTarget3D([10, 0, 0], r, [2, 2, 2], ObjectTag(CAR),
                           aux=dict(difficulty=2)),
        ], frame="t")
        dt = Target3DArray([
            ObjectTarget3D([x + 0.1, 0, 0], r, [2, 2, 2],
                           ObjectTag(CAR, scores=0.9)) for x in (0, 10)],
            frame="t")
        evs = evaluate_by_difficulty(
            lambda: DetectionEvaluator([CAR], [0.3], pr_sample_count=4),
            [gt], [dt])
        easy = evs["easy"].get_stats()
        assert easy.ngt[CAR.value] == 1
        assert easy.tp[CAR.value][0] == 1
        assert easy.fp[CAR.value][0] == 0  # hard-gt detection is ignored
        hard = evs["hard"].get_stats()
        assert hard.tp[CAR.value][0] == 2


class TestChunkedEval:
    def test_chunked_equals_unchunked(self, rng):
        """chunk_frames slices the stream and merges mergeable stats —
        identical counters and accuracies to one big call."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
        from bench_eval import make_frames

        from d3d_tpu.benchmarks import DetectionEvaluator
        from d3d_tpu.benchmarks_device import device_calc_stats

        classes, gts, dts = make_frames(np.random.default_rng(3), 13,
                                        ngt=6, extra=4)
        ev = DetectionEvaluator(classes, [0.7, 0.5, 0.5])
        whole = device_calc_stats(ev, gts, dts)
        chunked = device_calc_stats(ev, gts, dts, chunk_frames=5)
        for k in ev._classes:
            assert whole.ngt[k] == chunked.ngt[k]
            for fld in ("ndt", "tp", "fp", "fn"):
                np.testing.assert_array_equal(getattr(whole, fld)[k],
                                              getattr(chunked, fld)[k])
            for fld in ("acc_iou", "acc_angular", "acc_dist", "acc_box",
                        "acc_var"):
                np.testing.assert_allclose(getattr(whole, fld)[k],
                                           getattr(chunked, fld)[k],
                                           atol=1e-5, equal_nan=True)
