"""Exact-match validation of the native official nuScenes evaluator.

``evaluate_nuscenes_official`` must reproduce the official nuscenes-devkit
algorithm (detection/algo.py) EXACTLY. Since the devkit is not installed
in this image, the oracle here is an independent, deliberately-naive
transcription of the published algorithm: per-prediction Python loops,
closest-gt scans, list-based curve assembly — structurally unrelated to
the vectorized/device implementation under test, so agreement validates
the reimplementation rather than echoing it.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from d3d_tpu.abstraction import (ObjectTag, ObjectTarget3D,
                                 TrackingTarget3D, Target3DArray)
from d3d_tpu.benchmarks_nuscenes import (evaluate_nuscenes_official,
                                         NUSC_CLASS_RANGE)
from d3d_tpu.dataset.nuscenes.constants import NuscenesDetectionClass


CLASSES = [NuscenesDetectionClass.car, NuscenesDetectionClass.pedestrian,
           NuscenesDetectionClass.barrier,
           NuscenesDetectionClass.traffic_cone]


# ---------------------------------------------------------------------------
# naive oracle: direct transcription of nuscenes-devkit detection/algo.py
# ---------------------------------------------------------------------------

def oracle_accumulate(gt_frames, dt_frames, cls, dist_th):
    """gt_frames/dt_frames: lists of dicts with keys pos(2,), dim(3,),
    yaw, vel(2,), score, cls. Returns the official DetectionMetricData
    fields."""
    npos = sum(1 for f in gt_frames for g in f if g["cls"] is cls)
    if npos == 0:
        return None
    preds = [(f_idx, p) for f_idx, f in enumerate(dt_frames)
             for p in f if p["cls"] is cls]
    preds.sort(key=lambda t: -t[1]["score"])
    taken = set()
    tp, fp, conf = [], [], []
    match_data = {k: [] for k in ("trans_err", "scale_err", "orient_err",
                                  "vel_err", "conf")}
    period = np.pi if cls is NuscenesDetectionClass.barrier else 2 * np.pi
    for f_idx, p in preds:
        min_dist, match_gt = np.inf, None
        for g_idx, g in enumerate(gt_frames[f_idx]):
            if g["cls"] is cls and (f_idx, g_idx) not in taken:
                d = float(np.linalg.norm(p["pos"] - g["pos"]))
                if d < min_dist:
                    min_dist, match_gt = d, g_idx
        if min_dist < dist_th:
            taken.add((f_idx, match_gt))
            g = gt_frames[f_idx][match_gt]
            tp.append(1)
            fp.append(0)
            match_data["trans_err"].append(
                float(np.linalg.norm(p["pos"] - g["pos"])))
            inter = float(np.prod(np.minimum(p["dim"], g["dim"])))
            union = float(np.prod(p["dim"]) + np.prod(g["dim"]) - inter)
            match_data["scale_err"].append(1.0 - inter / union)
            diff = (g["yaw"] - p["yaw"] + period / 2) % period - period / 2
            match_data["orient_err"].append(abs(diff))
            match_data["vel_err"].append(
                float(np.linalg.norm(p["vel"] - g["vel"])))
            match_data["conf"].append(p["score"])
        else:
            tp.append(0)
            fp.append(1)
        conf.append(p["score"])
    if len(match_data["trans_err"]) == 0:
        return None
    tp, fp = np.cumsum(tp).astype(float), np.cumsum(fp).astype(float)
    prec = tp / (fp + tp)
    rec = tp / float(npos)
    rec_interp = np.linspace(0, 1, 101)
    prec_i = np.interp(rec_interp, rec, prec, right=0)
    conf_i = np.interp(rec_interp, rec, conf, right=0)
    out = {"precision": prec_i, "confidence": conf_i}
    for key in match_data:
        if key == "conf":
            continue
        x = np.asarray(match_data[key], float)
        if np.isnan(x).all():  # devkit cummean: all-NaN -> ones
            tmp = np.ones(len(x))
        else:
            cnt = np.cumsum(~np.isnan(x))
            tmp = np.divide(np.nancumsum(x), cnt, out=np.zeros_like(x),
                            where=cnt != 0)
        out[key] = np.interp(conf_i[::-1], match_data["conf"][::-1],
                             tmp[::-1])[::-1]
    return out


def oracle_calc_ap(md, min_recall=0.1, min_precision=0.1):
    if md is None:
        return 0.0
    prec = np.copy(md["precision"])[round(100 * min_recall) + 1:]
    prec -= min_precision
    prec[prec < 0] = 0
    return float(np.mean(prec)) / (1.0 - min_precision)


def oracle_calc_tp(md, metric, min_recall=0.1):
    if md is None:
        return 1.0
    first = round(100 * min_recall) + 1
    nz = np.nonzero(md["confidence"])[0]
    last = int(nz[-1]) if len(nz) else 0
    if last < first:
        return 1.0
    return float(np.mean(md[metric][first:last + 1]))


# ---------------------------------------------------------------------------
# synthetic scenes
# ---------------------------------------------------------------------------

def make_scene(rng, nframes=12, ngt=14, extra=8, tracking=True):
    """Random frames with per-class populations, distinct scores, and a
    spread of distances crossing the official class ranges."""
    gt_arrays, dt_arrays, gt_frames, dt_frames = [], [], [], []
    score_pool = iter(rng.permutation(np.linspace(0.05, 0.99, 4096)))

    def target(pos, dim, yaw, vel, cls, score):
        tag = ObjectTag(cls, NuscenesDetectionClass, float(score))
        if tracking:
            return TrackingTarget3D(pos, Rotation.from_euler("Z", yaw), dim,
                                    [vel[0], vel[1], 0], [0, 0, 0], tag,
                                    tid=1)
        return ObjectTarget3D(pos, Rotation.from_euler("Z", yaw), dim, tag)

    for _ in range(nframes):
        gt_arr = Target3DArray(frame="ego")
        dt_arr = Target3DArray(frame="ego")
        gtf, dtf = [], []
        for _ in range(ngt):
            cls = CLASSES[rng.integers(len(CLASSES))]
            r = rng.uniform(0, 55)
            ang = rng.uniform(0, 2 * np.pi)
            pos = np.array([r * np.cos(ang), r * np.sin(ang),
                            rng.uniform(-1, 1)])
            dim = rng.uniform(0.5, 4, 3)
            yaw = rng.uniform(-np.pi, np.pi)
            vel = rng.normal(0, 2, 2)
            gt_arr.append(target(pos, dim, yaw, vel, cls, 1.0))
            gtf.append(dict(pos=pos[:2].astype(np.float32).astype(float),
                            dim=dim.astype(np.float32).astype(float),
                            yaw=None, vel=vel, cls=cls))
            if rng.random() < 0.8:  # matched-ish detection
                dpos = pos + rng.normal(0, 0.8, 3)
                ddim = dim * rng.uniform(0.8, 1.2, 3)
                dyaw = yaw + rng.normal(0, 0.3)
                dvel = vel + rng.normal(0, 0.5, 2)
                s = float(next(score_pool))
                dt_arr.append(target(dpos, ddim, dyaw, dvel, cls, s))
                dtf.append(dict(pos=dpos[:2].astype(np.float32).astype(float),
                                dim=ddim.astype(np.float32).astype(float),
                                yaw=None, vel=dvel, cls=cls, score=s))
        for _ in range(extra):  # noise detections
            cls = CLASSES[rng.integers(len(CLASSES))]
            r = rng.uniform(0, 55)
            ang = rng.uniform(0, 2 * np.pi)
            pos = np.array([r * np.cos(ang), r * np.sin(ang), 0.0])
            dim = rng.uniform(0.5, 4, 3)
            yaw = rng.uniform(-np.pi, np.pi)
            vel = rng.normal(0, 2, 2)
            s = float(next(score_pool))
            dt_arr.append(target(pos, dim, yaw, vel, cls, s))
            dtf.append(dict(pos=pos[:2].astype(np.float32).astype(float),
                            dim=dim.astype(np.float32).astype(float),
                            yaw=None, vel=vel, cls=cls, score=s))
        # oracle sees the same f32-rounded values the arrays store,
        # including the f32 yaw derived from the stored quaternion
        for lst, arr in ((gtf, gt_arr), (dtf, dt_arr)):
            yaws = arr.columns()["yaw"].astype(float)
            for d, y in zip(lst, yaws):
                d["yaw"] = y
                d["vel"] = np.asarray(d["vel"], np.float32).astype(float)
        gt_arrays.append(gt_arr)
        dt_arrays.append(dt_arr)
        gt_frames.append(gtf)
        dt_frames.append(dtf)
    return gt_arrays, dt_arrays, gt_frames, dt_frames


def oracle_range_filter(gt_frames, dt_frames):
    def flt(frames):
        return [[b for b in f
                 if np.linalg.norm(b["pos"])
                 < NUSC_CLASS_RANGE[b["cls"].name]] for f in frames]
    return flt(gt_frames), flt(dt_frames)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

DIST_THS = (0.5, 1.0, 2.0, 4.0)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_official_ap_and_tp_exact(seed):
    rng = np.random.default_rng(seed)
    gt_arrays, dt_arrays, gt_frames, dt_frames = make_scene(rng)
    gt_frames, dt_frames = oracle_range_filter(gt_frames, dt_frames)

    res = evaluate_nuscenes_official(gt_arrays, dt_arrays, CLASSES,
                                     dist_thresholds=DIST_THS)

    oracle_aps, oracle_errs = {}, {}
    for cls in CLASSES:
        oracle_aps[cls] = {}
        for th in DIST_THS:
            md = oracle_accumulate(gt_frames, dt_frames, cls, th)
            oracle_aps[cls][th] = oracle_calc_ap(md)
        md2 = oracle_accumulate(gt_frames, dt_frames, cls, 2.0)
        errs = {}
        for m in ("trans_err", "scale_err", "orient_err", "vel_err"):
            if cls is NuscenesDetectionClass.traffic_cone and m in (
                    "orient_err", "vel_err"):
                continue
            if cls is NuscenesDetectionClass.barrier and m == "vel_err":
                continue
            errs[m] = oracle_calc_tp(md2, m)
        oracle_errs[cls] = errs

    for cls in CLASSES:
        for th in DIST_THS:
            assert res["ap"][cls][th] == pytest.approx(
                oracle_aps[cls][th], abs=1e-9), (cls, th)
        assert set(res["tp_errors"][cls]) == set(oracle_errs[cls])
        for m, v in oracle_errs[cls].items():
            assert res["tp_errors"][cls][m] == pytest.approx(v, abs=1e-7), \
                (cls, m)

    # composite values are finite and sane
    assert 0.0 <= res["mean_ap"] <= 1.0
    assert 0.0 <= res["nds"] <= 1.0
    assert "vel_err" in res["tp_metrics"]


def test_official_closed_form():
    """Hand-checkable scene: 1 class, 2 gt, 2 dt (one 0.3 m off, one FP far
    away). AP integrates a precision staircase that is exactly computable."""
    cls = NuscenesDetectionClass.car
    gt = Target3DArray([
        ObjectTarget3D([5, 0, 0], Rotation.identity(), [4, 2, 1.5],
                       ObjectTag(cls, NuscenesDetectionClass, 1.0)),
        ObjectTarget3D([-5, 0, 0], Rotation.identity(), [4, 2, 1.5],
                       ObjectTag(cls, NuscenesDetectionClass, 1.0))],
        frame="ego")
    dt = Target3DArray([
        ObjectTarget3D([5, 0.3, 0], Rotation.identity(), [4, 2, 1.5],
                       ObjectTag(cls, NuscenesDetectionClass, 0.9)),
        ObjectTarget3D([20, 20, 0], Rotation.identity(), [4, 2, 1.5],
                       ObjectTag(cls, NuscenesDetectionClass, 0.5))],
        frame="ego")
    res = evaluate_nuscenes_official([gt], [dt], [cls],
                                     dist_thresholds=(1.0,), dist_th_tp=1.0)
    # rec=[0.5, 0.5], prec=[1, 0.5]; np.interp gives prec 1 on r=0.11..0.49
    # (39 points), 0.5 at the duplicated r=0.50 knot, 0 beyond:
    # AP = (39*(1-0.1) + (0.5-0.1)) / 90 / (1-0.1) = 35.5/81
    assert res["ap"][cls][1.0] == pytest.approx(35.5 / 81, abs=1e-9)
    assert res["tp_errors"][cls]["trans_err"] == pytest.approx(0.3, abs=1e-6)
    assert res["tp_errors"][cls]["scale_err"] == pytest.approx(0.0, abs=1e-9)


def test_official_nan_velocity_cummean():
    """NaN velocities (the devkit's marker for annotations without
    prev/next frames) are excluded from the TP velocity error, not
    propagated (official ``cummean`` semantics)."""
    car = NuscenesDetectionClass.car

    def tt(pos, vel, score):
        return TrackingTarget3D(
            pos, Rotation.identity(), [4, 2, 1.5], [vel[0], vel[1], 0],
            [0, 0, 0], ObjectTag(car, NuscenesDetectionClass, score), tid=1)

    gt = Target3DArray([tt([5, 0, 0], [np.nan, np.nan], 1.0),
                        tt([-5, 0, 0], [2.0, 0.0], 1.0)], frame="ego")
    dt = Target3DArray([tt([5, 0.1, 0], [1.0, 0.0], 0.9),
                        tt([-5, 0.1, 0], [3.0, 0.0], 0.8)], frame="ego")
    res = evaluate_nuscenes_official([gt], [dt], [car],
                                     dist_thresholds=(2.0,), dist_th_tp=2.0)

    # independent oracle with the devkit's NaN-aware cummean
    frames = [[dict(pos=np.array([5.0, 0.0]), dim=np.array([4, 2, 1.5]),
                    yaw=0.0, vel=np.array([np.nan, np.nan]), cls=car),
               dict(pos=np.array([-5.0, 0.0]), dim=np.array([4, 2, 1.5]),
                    yaw=0.0, vel=np.array([2.0, 0.0]), cls=car)]]
    dts = [[dict(pos=np.array([5.0, 0.1]), dim=np.array([4, 2, 1.5]),
                 yaw=0.0, vel=np.array([1.0, 0.0]), cls=car, score=0.9),
            dict(pos=np.array([-5.0, 0.1]), dim=np.array([4, 2, 1.5]),
                 yaw=0.0, vel=np.array([3.0, 0.0]), cls=car, score=0.8)]]
    md = oracle_accumulate(frames, dts, car, 2.0)
    want = oracle_calc_tp(md, "vel_err")
    assert res["tp_errors"][car]["vel_err"] == pytest.approx(want, abs=1e-6)
    assert np.isfinite(res["nds"])


def test_official_range_filter_and_empty():
    """Class-range filtering drops far boxes on both sides; empty classes
    follow the official no-data rules (AP 0, TP errors 1)."""
    car = NuscenesDetectionClass.car
    ped = NuscenesDetectionClass.pedestrian
    gt = Target3DArray([
        ObjectTarget3D([49, 0, 0], Rotation.identity(), [4, 2, 1.5],
                       ObjectTag(car, NuscenesDetectionClass, 1.0)),
        ObjectTarget3D([51, 0, 0], Rotation.identity(), [4, 2, 1.5],
                       ObjectTag(car, NuscenesDetectionClass, 1.0))],
        frame="ego")
    dt = Target3DArray([
        ObjectTarget3D([49, 0.1, 0], Rotation.identity(), [4, 2, 1.5],
                       ObjectTag(car, NuscenesDetectionClass, 0.9)),
        ObjectTarget3D([51, 0.1, 0], Rotation.identity(), [4, 2, 1.5],
                       ObjectTag(car, NuscenesDetectionClass, 0.8))],
        frame="ego")
    res = evaluate_nuscenes_official([gt], [dt], [car, ped],
                                     dist_thresholds=(2.0,))
    # only the 49 m pair survives the 50 m car range -> perfect AP
    assert res["ap"][car][2.0] == pytest.approx(1.0, abs=1e-9)
    # pedestrian has no gt: official no-data AP=0, errors=1
    assert res["ap"][ped][2.0] == 0.0
    assert all(v == 1.0 for v in res["tp_errors"][ped].values())
