"""Waymo-style LEVEL/range breakdowns: stratification semantics, bucket
isolation, cloud-derived point counts, and host/device agreement."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from d3d_tpu.abstraction import ObjectTag, ObjectTarget3D, Target3DArray
from d3d_tpu.benchmarks import DetectionEvaluator
from d3d_tpu.benchmarks_waymo import (evaluate_waymo_detection,
                                      gt_num_points, waymo_difficulty,
                                      waymo_summary)
from d3d_tpu.dataset.waymo.constants import WaymoObjectClass

VEH = WaymoObjectClass.Vehicle


def _obj(x, y, score=None, yaw=0.0, num_points=None, difficulty=None):
    aux = {}
    if num_points is not None:
        aux["num_points"] = num_points
    if difficulty is not None:
        aux["difficulty"] = difficulty
    return ObjectTarget3D([x, y, 0.0], Rotation.from_euler("Z", yaw),
                          [4.0, 2.0, 1.6],
                          ObjectTag(VEH, scores=score), aux=aux or None)


def _factory():
    return DetectionEvaluator([VEH], [0.5])


def test_waymo_difficulty_rules():
    assert waymo_difficulty(0) == -1
    assert waymo_difficulty(3) == 2
    assert waymo_difficulty(5) == 2
    assert waymo_difficulty(6) == 1
    assert waymo_difficulty(100, labeler_level=2) == 2


def test_level_stratification():
    """LEVEL_1 ignores (absorbs) LEVEL_2-only GT; LEVEL_2 counts both.
    Zero-point GT is EXCLUDED entirely — a detection on it is a false
    positive (official semantics), not absorbed."""
    gt = Target3DArray([
        _obj(10, 0, num_points=50),           # LEVEL_1
        _obj(20, 0, num_points=3),            # LEVEL_2
        _obj(28, 0, num_points=0),            # excluded
    ], frame="vehicle")
    dt = Target3DArray([
        _obj(10, 0, score=0.9),               # TP on the L1 gt
        _obj(20, 0, score=0.8),               # TP on the L2 gt (L1: absorbed)
        _obj(28, 0, score=0.7),               # on the excluded gt: FP
    ], frame="vehicle")
    res = evaluate_waymo_detection(_factory, [gt], [dt], ranges=False,
                                   device=False)
    s1, s2 = res["LEVEL_1"]._stats, res["LEVEL_2"]._stats
    k = VEH.value
    assert s1.ngt[k] == 1 and s2.ngt[k] == 2
    assert s1.tp[k][0] == 1 and s1.fp[k][0] == 1
    assert s2.tp[k][0] == 2 and s2.fp[k][0] == 1


def test_range_bucket_isolation():
    """Each range bucket sees only its own GT and detections: a FP at
    range 25 hurts the 0-30m bucket only."""
    gt = Target3DArray([
        _obj(10, 0, num_points=50),
        _obj(40, 0, num_points=50),
        _obj(60, 0, num_points=50),
    ], frame="vehicle")
    dt = Target3DArray([
        _obj(10, 0, score=0.9),
        _obj(40, 0, score=0.9),
        _obj(60, 0, score=0.9),
        _obj(25, 3, score=0.8),               # FP, lands in 0-30m only
    ], frame="vehicle")
    res = evaluate_waymo_detection(_factory, [gt], [dt], device=False)
    k = VEH.value
    for bname, want_fp in (("0-30m", 1), ("30-50m", 0), ("50m-inf", 0)):
        s = res[f"LEVEL_2/{bname}"]._stats
        assert s.ngt[k] == 1, bname
        assert s.tp[k][0] == 1 and s.fp[k][0] == want_fp, bname
    # the unbucketed stratum sees everything
    s = res["LEVEL_2"]._stats
    assert s.ngt[k] == 3 and s.tp[k][0] == 3 and s.fp[k][0] == 1


def test_counts_from_clouds_match_aux():
    """Without aux num_points, per-box counts come from the cloud and
    produce identical stratification."""
    rng = np.random.default_rng(0)
    gt_aux = Target3DArray([_obj(10, 0, num_points=8),
                            _obj(20, 0, num_points=4)], frame="vehicle")
    gt_plain = Target3DArray([_obj(10, 0), _obj(20, 0)], frame="vehicle")
    # 8 points inside box 1, 4 inside box 2, noise far away
    inside1 = rng.uniform(-0.5, 0.5, (8, 3)) * [3.8, 1.8, 1.4] + [10, 0, 0]
    inside2 = rng.uniform(-0.5, 0.5, (4, 3)) * [3.8, 1.8, 1.4] + [20, 0, 0]
    noise = rng.uniform(100, 200, (50, 3))
    cloud = np.concatenate([inside1, inside2, noise]).astype(np.float32)
    np.testing.assert_array_equal(gt_num_points(gt_plain, cloud), [8, 4])

    dt = Target3DArray([_obj(10, 0, score=0.9), _obj(20, 0, score=0.8)],
                       frame="vehicle")
    r_aux = evaluate_waymo_detection(_factory, [gt_aux], [dt], ranges=False,
                                     device=False)
    r_cld = evaluate_waymo_detection(_factory, [gt_plain], [dt],
                                     clouds=[cloud], ranges=False,
                                     device=False)
    for name in ("LEVEL_1", "LEVEL_2"):
        a, b = r_aux[name].ap()[VEH], r_cld[name].ap()[VEH]
        assert a == pytest.approx(b, abs=1e-12), name
        sa, sb = r_aux[name]._stats, r_cld[name]._stats
        np.testing.assert_array_equal(sa.tp[VEH.value], sb.tp[VEH.value])
        assert sa.ngt[VEH.value] == sb.ngt[VEH.value]


def test_aph_tracks_heading_error():
    """Perfect headings: APH == AP; a heading-flipped detection lowers
    APH but not AP."""
    gt = Target3DArray([_obj(10, 0, num_points=50),
                        _obj(20, 0, num_points=50)], frame="vehicle")
    dt_good = Target3DArray([_obj(10, 0, score=0.9),
                             _obj(20, 0, score=0.8)], frame="vehicle")
    dt_flip = Target3DArray([_obj(10, 0, score=0.9),
                             _obj(20, 0, score=0.8, yaw=np.pi)],
                            frame="vehicle")
    good = evaluate_waymo_detection(_factory, [gt], [dt_good], ranges=False,
                                    device=False)["LEVEL_2"]
    flip = evaluate_waymo_detection(_factory, [gt], [dt_flip], ranges=False,
                                    device=False)["LEVEL_2"]
    assert good.aph()[VEH] == pytest.approx(good.ap()[VEH], abs=1e-9)
    assert flip.ap()[VEH] == pytest.approx(good.ap()[VEH], abs=1e-9)
    assert flip.aph()[VEH] < good.aph()[VEH] - 0.1


def test_host_device_agreement():
    rng = np.random.default_rng(3)
    gts, dts = [], []
    for _ in range(3):
        gt = Target3DArray([
            _obj(float(rng.uniform(5, 60)), float(rng.uniform(-10, 10)),
                 num_points=int(rng.integers(1, 40)))
            for _ in range(4)], frame="vehicle")
        dt = Target3DArray([
            _obj(g.position[0] + float(rng.uniform(-0.4, 0.4)),
                 g.position[1] + float(rng.uniform(-0.4, 0.4)),
                 score=float(rng.uniform(0.3, 1)))
            for g in gt], frame="vehicle")
        gts.append(gt)
        dts.append(dt)
    host = evaluate_waymo_detection(_factory, gts, dts, device=False)
    dev = evaluate_waymo_detection(_factory, gts, dts, device=True)
    for name in host:
        hs, ds = host[name]._stats, dev[name]._stats
        k = VEH.value
        np.testing.assert_array_equal(hs.tp[k], ds.tp[k])
        np.testing.assert_array_equal(hs.fp[k], ds.fp[k])
        np.testing.assert_array_equal(hs.fn[k], ds.fn[k])
        assert hs.ngt[k] == ds.ngt[k]


def test_summary_renders():
    gt = Target3DArray([_obj(10, 0, num_points=50)], frame="vehicle")
    dt = Target3DArray([_obj(10, 0, score=0.9)], frame="vehicle")
    res = evaluate_waymo_detection(_factory, [gt], [dt], device=False)
    text = waymo_summary(res)
    assert "LEVEL_1" in text and "LEVEL_2/0-30m" in text
    assert "Vehicle" in text
