"""Waymo Open Dataset-style detection breakdowns: LEVEL_1/LEVEL_2
difficulty and range strata with AP / APH.

The reference's Waymo support is loader + converter only
(/root/reference/d3d/dataset/waymo/loader.py, converter.py) — it ships no
Waymo metric at all. This module adds the protocol the Waymo family is
actually judged by (Sun et al., "Scalability in Perception for
Autonomous Driving: Waymo Open Dataset", CVPR 2020):

  * objects are assigned **LEVEL_2** when the labeler marked them hard or
    they contain at most 5 lidar points, **LEVEL_1** otherwise; boxes
    with no lidar points are excluded from evaluation entirely;
  * the LEVEL_1 metric counts only LEVEL_1 ground truth; the LEVEL_2
    metric counts both (cumulative, like the official tooling);
  * breakdowns by center range ``[0, 30) / [30, 50) / [50, inf)`` metres
    restrict ground truth AND detections to the bucket (a detection
    belongs to the bucket its own center lies in);
  * AP integrates the evaluator's PR curve; APH weighs every true
    positive by ``1 - |heading residual| / pi``
    (:meth:`d3d_tpu.benchmarks.DetectionEvaluator.aph`).

Out-of-stratum ground truth is passed to the evaluator as IGNORE, so a
detection matching it is absorbed (neither TP nor FP) — the same
mechanism the KITTI strata use (:mod:`d3d_tpu.benchmarks_kitti`).

The Waymo converter stores ``num_points`` / ``difficulty`` per object in
``aux`` (proto fields ``num_lidar_points_in_box`` /
``detection_difficulty_level``); when evaluating outputs that lack them,
pass per-frame point clouds and the counts are computed on device with
:meth:`Target3DArray.crop_points`.
"""

import numpy as np

from .abstraction import Target3DArray

__all__ = ["waymo_difficulty", "gt_num_points", "evaluate_waymo_detection",
           "waymo_summary", "RANGE_BREAKDOWNS", "LEVEL_NAMES"]

LEVEL_NAMES = ("LEVEL_1", "LEVEL_2")
RANGE_BREAKDOWNS = (("0-30m", 0.0, 30.0), ("30-50m", 30.0, 50.0),
                    ("50m-inf", 50.0, float("inf")))


def waymo_difficulty(num_points, labeler_level=0):
    """Official LEVEL of one ground-truth box.

    :param num_points: lidar points inside the box
    :param labeler_level: ``detection_difficulty_level`` from the label
        proto (2 = labeler-marked LEVEL_2; 0 = unset)
    :returns: 1 or 2, or -1 when the box has no lidar points (excluded
        from evaluation)
    """
    if num_points <= 0:
        return -1
    if labeler_level == 2 or num_points <= 5:
        return 2
    return 1


def gt_num_points(gt_arr, cloud):
    """Lidar points inside each box of one frame (batched device crop)."""
    if len(gt_arr) == 0:
        return np.zeros(0, np.int64)
    return gt_arr.crop_points(cloud).sum(axis=1).astype(np.int64)


def _gt_levels(gt_arrays, clouds):
    levels = []
    for fi, arr in enumerate(gt_arrays):
        counts = None
        out = np.empty(len(arr), np.int64)
        for i, obj in enumerate(arr):
            aux = obj.aux or {}
            if "num_points" in aux:
                n, lab = int(aux["num_points"]), int(aux.get("difficulty", 0))
            elif clouds is not None:
                if counts is None:
                    counts = gt_num_points(arr, clouds[fi])
                n, lab = int(counts[i]), int(aux.get("difficulty", 0))
            elif "difficulty" in aux:
                # difficulty known but counts not: trust the labeler tag,
                # treat untagged boxes as LEVEL_1
                out[i] = 2 if int(aux["difficulty"]) == 2 else 1
                continue
            else:
                raise ValueError(
                    "cannot stratify: object has no aux num_points/"
                    "difficulty and no point clouds were passed")
            out[i] = waymo_difficulty(n, lab)
        levels.append(out)
    return levels


def _ranges(arr):
    if len(arr) == 0:
        return np.zeros(0)
    return np.linalg.norm(arr.columns()["position"][:, :2], axis=1)


def evaluate_waymo_detection(evaluator_factory, gt_arrays, dt_arrays,
                             clouds=None, ranges=True, device=True):
    """Evaluate per Waymo LEVEL (and optionally range) stratum.

    :param evaluator_factory: zero-arg callable returning a fresh
        :class:`~d3d_tpu.benchmarks.DetectionEvaluator`
    :param gt_arrays: list of GT Target3DArray per frame
    :param dt_arrays: list of detection Target3DArray per frame
    :param clouds: optional per-frame (N, >=3) point clouds for computing
        per-box point counts when ``aux`` lacks ``num_points``
    :param ranges: also produce the three range buckets per level
    :param device: evaluate with the batched device evaluator
    :returns: dict stratum-name -> evaluator; names are ``LEVEL_1``,
        ``LEVEL_2`` and (with ``ranges``) ``LEVEL_2/0-30m`` etc.

    .. note:: each stratum runs its own matching pass; with the default
       three range buckets that is 8 evaluation sweeps over the frames.
    """
    levels = _gt_levels(gt_arrays, clouds)

    # official semantics: zero-point boxes are EXCLUDED from the GT set —
    # a detection on one counts as a false positive (only out-of-stratum
    # GT gets the IGNORE absorption)
    gts, lvls = [], []
    for arr, lv in zip(gt_arrays, levels):
        keep = lv >= 1
        if keep.all():
            gts.append(arr)
            lvls.append(lv)
        else:
            gts.append(Target3DArray([b for b, k in zip(arr, keep) if k],
                                     arr.frame, arr.timestamp))
            lvls.append(lv[keep])

    buckets = [(None, None, None)]
    if ranges:
        buckets += [b for b in RANGE_BREAKDOWNS]
        gt_rng = [_ranges(a) for a in gts]
        dt_rng = [_ranges(a) for a in dt_arrays]

    out = {}
    for li, lname in enumerate(LEVEL_NAMES):
        lmax = li + 1
        for bname, lo, hi in buckets:
            ev = evaluator_factory()
            name = lname if bname is None else f"{lname}/{bname}"
            ignored, dts = [], []
            for fi in range(len(gts)):
                ig = lvls[fi] > lmax
                dt = dt_arrays[fi]
                if bname is not None:
                    ig |= ~((gt_rng[fi] >= lo) & (gt_rng[fi] < hi))
                    sel = (dt_rng[fi] >= lo) & (dt_rng[fi] < hi)
                    dt = Target3DArray(
                        [b for b, s in zip(dt, sel) if s],
                        dt.frame, dt.timestamp)
                ignored.append(ig)
                dts.append(dt)
            if device:
                from .benchmarks_device import device_calc_stats

                ev.add_stats(device_calc_stats(ev, list(gts), dts,
                                               gt_ignored=ignored))
            else:
                for g, dt, ig in zip(gts, dts, ignored):
                    ev.add_stats(ev.calc_stats(g, dt, gt_ignored=ig))
            out[name] = ev
    return out


def waymo_summary(results):
    """Text table of AP / APH per stratum from
    :func:`evaluate_waymo_detection`'s result dict."""
    lines = []
    classes = None
    for name, ev in results.items():
        ap, aph = ev.ap(), ev.aph()
        if classes is None:
            classes = list(ap)
            head = "stratum".ljust(18) + "".join(
                f"{getattr(c, 'name', c):>16}" for c in classes)
            lines.append(head)
            lines.append("-" * len(head))
        lines.append(name.ljust(18) + "".join(
            "%8.4f/%7.4f" % (ap[c], aph[c]) for c in classes))
    return "\n".join(lines)
