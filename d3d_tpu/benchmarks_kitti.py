"""KITTI object-benchmark conveniences: official difficulty stratification
on top of the generic evaluators.

The reference devkit ships the generic DetectionEvaluator and leaves the
KITTI protocol (easy/moderate/hard strata by 2D box height, occlusion and
truncation — cvlibs.net object benchmark rules) to downstream scripts;
this module closes that gap:

  * :func:`kitti_difficulty` — per-object difficulty per the official
    thresholds (0 easy / 1 moderate / 2 hard / -1 ignored);
  * :func:`evaluate_by_difficulty` — run a (device-batched) evaluation
    per stratum over a list of frames, where each stratum keeps the GT of
    easier-or-equal difficulty (official cumulative protocol) and returns
    one evaluator per stratum, ready for ``ap()`` / ``summary()``.
"""

import numpy as np

from .abstraction import Target3DArray

__all__ = ["kitti_difficulty", "evaluate_by_difficulty", "DIFFICULTY_NAMES"]

DIFFICULTY_NAMES = ("easy", "moderate", "hard")

# official thresholds: min 2D box height (px), max occlusion state,
# max truncation
_MIN_HEIGHT = (40.0, 25.0, 25.0)
_MAX_OCCLUSION = (0, 1, 2)
_MAX_TRUNCATION = (0.15, 0.30, 0.50)


def kitti_difficulty(box_height, occluded, truncated):
    """Official KITTI difficulty of one ground-truth object.

    :param box_height: 2D bounding-box height in pixels
    :param occluded: occlusion state 0..3
    :param truncated: truncation fraction 0..1
    :returns: 0 easy / 1 moderate / 2 hard, or -1 when the object fails
        even the hard criteria (ignored by the benchmark)
    """
    for level in range(3):
        if (box_height >= _MIN_HEIGHT[level]
                and occluded <= _MAX_OCCLUSION[level]
                and truncated <= _MAX_TRUNCATION[level]):
            return level
    return -1


def _gt_difficulties(gt_arrays, difficulty_fn):
    out = []
    for arr in gt_arrays:
        out.append(np.asarray([difficulty_fn(obj) for obj in arr],
                              dtype=np.int64))
    return out


def evaluate_by_difficulty(evaluator_factory, gt_arrays, dt_arrays,
                           difficulty_fn=None, device=True):
    """Evaluate per KITTI difficulty stratum.

    :param evaluator_factory: zero-arg callable returning a fresh
        DetectionEvaluator (one per stratum)
    :param gt_arrays: list of GT Target3DArray per frame
    :param dt_arrays: list of detection Target3DArray per frame
    :param difficulty_fn: ``obj -> difficulty``; defaults to reading
        ``obj.aux['difficulty']`` if present, else
        :func:`kitti_difficulty` over ``aux`` fields ``box_height`` /
        ``occluded`` / ``truncated`` (KITTI loaders populate aux from the
        label files)
    :param device: evaluate with the batched device evaluator
    :returns: dict difficulty-name -> evaluator (stats accumulated).
        Stratum ``d`` counts every GT with difficulty in [0, d]
        (cumulative); harder and invalid (-1) GT are passed as IGNORE —
        they stay matchable so a detection on one counts neither TP nor
        FP, exactly the official protocol. (DontCare 2D regions are not
        represented: the loader drops boxless DontCare lines.)
    """
    if difficulty_fn is None:
        def difficulty_fn(obj):
            aux = obj.aux or {}
            if "difficulty" in aux:
                return int(aux["difficulty"])
            return kitti_difficulty(aux.get("box_height", np.inf),
                                    aux.get("occluded", 0),
                                    aux.get("truncated", 0.0))

    diffs = _gt_difficulties(gt_arrays, difficulty_fn)
    out = {}
    for level, name in enumerate(DIFFICULTY_NAMES):
        ev = evaluator_factory()
        ignored = [~((d >= 0) & (d <= level)) for d in diffs]
        if device:
            from .benchmarks_device import device_calc_stats

            ev.add_stats(device_calc_stats(ev, list(gt_arrays),
                                           list(dt_arrays),
                                           gt_ignored=ignored))
        else:
            for g, dt, ig in zip(gt_arrays, dt_arrays, ignored):
                ev.add_stats(ev.calc_stats(g, dt, gt_ignored=ig))
        out[name] = ev
    return out
