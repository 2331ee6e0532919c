"""nuScenes-protocol detection evaluation on the native evaluators.

The official nuScenes benchmark matches detections to ground truth by
BEV center distance at four thresholds (0.5/1/2/4 m) and composes the
mean AP with true-positive error metrics into the NDS. The reference
devkit shells out to the official ``nuscenes-devkit`` for this
(:func:`d3d_tpu.dataset.nuscenes.loader.execute_official_evaluator`); this
module evaluates natively — batched on device — using the evaluators'
``distance_metric=Position`` mode.

Metric correspondence — this is a *native approximation* of the official
protocol, not a bit-exact reimplementation:

  * matching: center-distance greedy by descending score, but with the
    reference ScoreMatcher's candidate-row quirk (matcher.pyx:155-158,
    replicated framework-wide for parity) — assignments can differ from
    the official greedy-closest when detections are not score-sorted;
  * AP: trapezoid over the evaluator's log-spaced SCORE thresholds; the
    official AP integrates over recall in [0.1, 1] and clips operating
    points with precision < 10% (no class-range GT filtering here);
  * ATE (m) = mean ``acc_dist``; AOE (rad) = mean ``acc_angular * pi`` —
    equal-weight means over score-threshold bins, where the official
    mATE/mAOE average over recall levels;
  * ASE: the official scale error is ``1 - IoU`` of aligned boxes; here
    approximated by the dimension-vector L2 error squashed via
    ``err / (1 + err)``.

For exact official numbers, dump a submission and call
:func:`d3d_tpu.dataset.nuscenes.loader.execute_official_evaluator`.
"""

import numpy as np

from .benchmarks import DetectionEvaluator
from .tracking.matcher import DistanceTypes

__all__ = ["evaluate_nuscenes_detection"]

NUSC_DIST_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)


def evaluate_nuscenes_detection(gt_arrays, dt_arrays, classes,
                                dist_thresholds=NUSC_DIST_THRESHOLDS,
                                tp_threshold=2.0, pr_sample_count=40,
                                device=True):
    """Evaluate detections under the nuScenes center-distance protocol.

    :param classes: class enum members under evaluation
    :param dist_thresholds: center-distance matching thresholds (m)
    :param tp_threshold: the threshold whose matches feed the TP error
        metrics (officially 2.0 m)
    :returns: dict with

        * ``evaluators``: {threshold: DetectionEvaluator} (accumulated)
        * ``ap``: {class: {threshold: AP}}
        * ``mean_ap``: scalar mAP over classes x thresholds
        * ``tp_errors``: {class: {"ate": m, "aoe": rad, "ase": approx}}
        * ``nds``: NDS-style composite (see module docstring for the ASE
          approximation)
    """
    evaluators = {}
    packed = None
    for thr in dist_thresholds:
        ev = DetectionEvaluator(classes, [thr] * len(classes),
                                pr_sample_count=pr_sample_count,
                                distance_metric=DistanceTypes.Position)
        if device:
            from .benchmarks_device import device_calc_stats, pack_frames

            if packed is None:  # packing is threshold-independent
                packed = pack_frames(list(gt_arrays), list(dt_arrays),
                                     ev._classes)
            ev.add_stats(device_calc_stats(ev, gt_arrays, dt_arrays,
                                           packed=packed))
        else:
            for g, d in zip(gt_arrays, dt_arrays):
                ev.add_stats(ev.calc_stats(g, d))
        evaluators[thr] = ev

    ap = {c: {thr: float(evaluators[thr].ap()[c]) for thr in dist_thresholds}
          for c in classes}
    mean_ap = float(np.mean([[ap[c][t] for t in dist_thresholds]
                             for c in classes]))

    ev_tp = evaluators[min(dist_thresholds,
                           key=lambda t: abs(t - tp_threshold))]
    tp_errors = {}
    for c in classes:
        ate = float(np.nanmean(ev_tp.get_stats().acc_dist[c.value]))
        aoe = float(np.nanmean(ev_tp.get_stats().acc_angular[c.value])) \
            * np.pi
        box = float(np.nanmean(ev_tp.get_stats().acc_box[c.value]))
        tp_errors[c] = dict(ate=ate, aoe=aoe,
                            ase=box / (1.0 + box) if np.isfinite(box)
                            else float("nan"))

    def _score(err, bound=1.0):
        return 0.0 if not np.isfinite(err) else max(0.0, 1.0 - min(
            err / bound, 1.0))

    tp_scores = []
    for c in classes:
        tp_scores += [_score(tp_errors[c]["ate"]),
                      _score(tp_errors[c]["aoe"], np.pi),
                      _score(tp_errors[c]["ase"])]
    nds = (5.0 * mean_ap + 5.0 * float(np.mean(tp_scores))) / 10.0
    return dict(evaluators=evaluators, ap=ap, mean_ap=mean_ap,
                tp_errors=tp_errors, nds=nds)
