"""Deterministic synthetic tracking sequences shared by the tracking
evaluator oracle test and benchmarks.

The generator is seed-stable: the oracle fixture
(``fixtures/tracking_eval_oracle.npz``) stores only evaluator OUTPUTS
recorded from a given implementation; the test regenerates the input
sequence with the same seed and asserts the current implementation still
produces integer-identical counters (id switches, fragments, tp/fp/fn)
and float-identical metrics.
"""

import numpy as np
from scipy.spatial.transform import Rotation


def make_tracking_sequence(seed=0, nframes=24, ntracks=24, extra=10,
                           with_empty_frames=True):
    """Temporally-coherent synthetic sequence: persistent gt tracks with
    constant velocity; dt = perturbed gt (offset tid space) plus noise
    detections with fresh tids. Appends an empty-dt and an empty-gt frame
    to exercise the degenerate paths when ``with_empty_frames``.
    """
    from d3d_tpu.abstraction import ObjectTag, Target3DArray, TrackingTarget3D
    from d3d_tpu.dataset.kitti.utils import KittiObjectClass

    rng = np.random.default_rng(seed)
    classes = [KittiObjectClass.Car, KittiObjectClass.Pedestrian,
               KittiObjectClass.Cyclist]
    pos = rng.uniform(-40, 40, (ntracks, 3))
    vel = rng.normal(0, 0.5, (ntracks, 3))
    dim = rng.uniform(1, 4, (ntracks, 3))
    yaw = rng.uniform(-np.pi, np.pi, ntracks)
    cls = rng.choice(len(classes), ntracks)
    noise_tid = 10_000
    gts, dts = [], []
    for f in range(nframes):
        pos = pos + vel
        gt = Target3DArray(frame="velo", timestamp=f * 100_000)
        dt = Target3DArray(frame="velo", timestamp=f * 100_000)

        def mk(p, d, y, c, tid, score):
            return TrackingTarget3D(
                p, Rotation.from_euler("Z", y), d, vel[tid % ntracks],
                [0, 0, 0], ObjectTag(classes[c], scores=float(score)),
                tid=tid)

        for i in range(ntracks):
            # gt tracks drop out occasionally so trajectories fragment
            if rng.random() < 0.92:
                gt.append(mk(pos[i], dim[i], yaw[i], cls[i], i + 1, 1.0))
            if rng.random() < 0.85:
                dt.append(mk(pos[i] + rng.normal(0, 0.2, 3),
                             dim[i] * rng.uniform(0.95, 1.05, 3),
                             yaw[i] + rng.normal(0, 0.03), cls[i],
                             1000 + i + 1, rng.uniform(0.3, 1)))
        for _ in range(extra):
            noise_tid += 1
            dt.append(mk(rng.uniform(-40, 40, 3), rng.uniform(1, 4, 3),
                         rng.uniform(-np.pi, np.pi),
                         rng.choice(len(classes)), noise_tid,
                         rng.uniform(0.1, 1)))
        gts.append(gt)
        dts.append(dt)
    if with_empty_frames:
        ts = nframes * 100_000
        gts.append(Target3DArray(frame="velo", timestamp=ts))
        dts.append(dts[-1])  # gt empty, dt present
        gt = Target3DArray(frame="velo", timestamp=ts + 100_000)
        for i in range(0, ntracks, 3):
            gt.append(TrackingTarget3D(
                pos[i], Rotation.from_euler("Z", yaw[i]), dim[i], vel[i],
                [0, 0, 0], ObjectTag(classes[cls[i]], scores=1.0),
                tid=i + 1))
        gts.append(gt)
        dts.append(Target3DArray(frame="velo", timestamp=ts + 100_000))
    return classes, gts, dts


def evaluator_fingerprint(ev):
    """Flatten every tracking metric and raw counter of a TrackingEvaluator
    into a dict of numpy arrays suitable for npz storage and exact
    comparison."""
    out = {}
    s = ev._stats
    for k in ev._classes:
        kn = ev._class_type(k).name
        out[f"tp_{kn}"] = np.asarray(s.tp[k])
        out[f"fp_{kn}"] = np.asarray(s.fp[k])
        out[f"fn_{kn}"] = np.asarray(s.fn[k])
        out[f"ndt_{kn}"] = np.asarray(s.ndt[k])
        out[f"ngt_{kn}"] = np.asarray(s.ngt[k])
        out[f"ids_{kn}"] = np.asarray(s.id_switches[k])
        out[f"frag_{kn}"] = np.asarray(s.fragments[k])
        out[f"acc_iou_{kn}"] = np.asarray(s.acc_iou[k])
        out[f"acc_dist_{kn}"] = np.asarray(s.acc_dist[k])
        out[f"acc_box_{kn}"] = np.asarray(s.acc_box[k])
        out[f"acc_angular_{kn}"] = np.asarray(s.acc_angular[k])
        out[f"acc_var_{kn}"] = np.asarray(s.acc_var[k])
        # trajectory tables, canonicalized as sorted (tid, count) rows
        ngt_ids = sorted(s.ngt_ids[k].items())
        out[f"ngt_ids_{kn}"] = np.asarray(ngt_ids, int).reshape(-1, 2)
        tracked = []
        for si in range(ev._pr_nsamples):
            for tid, cnt in sorted(s.ngt_tracked[k][si].items()):
                tracked.append((si, tid, cnt))
        out[f"ngt_tracked_{kn}"] = np.asarray(tracked, int).reshape(-1, 3)
        dt_ids = []
        for si in range(ev._pr_nsamples):
            for tid, cnt in sorted(s.ndt_ids[k][si].items()):
                dt_ids.append((si, tid, cnt))
        out[f"ndt_ids_{kn}"] = np.asarray(dt_ids, int).reshape(-1, 3)
    for name, metric in (("mota", ev.mota()),
                         ("amota", ev.amota()), ("amotp", ev.amotp()),
                         ("ids", ev.id_switches()), ("frag", ev.fragments()),
                         ("mt", ev.tracked_ratio()), ("ml", ev.lost_ratio()),
                         ("gtc", ev.gt_traj_count()), ("ap", ev.ap())):
        for cls_k, v in metric.items():
            out[f"m_{name}_{cls_k.name}"] = np.asarray(float(v))
    for name, metric in (("mt_all", ev.tracked_ratio(return_all=True)),
                         ("ml_all", ev.lost_ratio(return_all=True))):
        for cls_k, v in metric.items():
            out[f"m_{name}_{cls_k.name}"] = np.asarray(v, float)
    return out


def record_oracle(path):
    """Re-record the frozen oracle fixture from the CURRENT implementation.

    Only do this for an intentional, understood change (and say why in the
    commit): the test pins integer counters exactly and float metrics to
    1e-12, so any re-record must be justified against the previous fixture
    first (integer counters must never change)."""
    from d3d_tpu.benchmarks import TrackingEvaluator

    classes, gts, dts = make_tracking_sequence(seed=7, nframes=20)
    ev = TrackingEvaluator(classes, [0.7, 0.5, 0.5])
    for g, d in zip(gts, dts):
        ev.add_stats(ev.calc_stats(g, d))
    np.savez_compressed(path, **evaluator_fingerprint(ev))


if __name__ == "__main__":
    import os
    import sys

    import jax

    jax.config.update("jax_platforms", "cpu")
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "fixtures", "tracking_eval_oracle.npz")
    record_oracle(out)
    print("recorded", out)
