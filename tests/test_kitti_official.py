"""Exact-match validation of the native official KITTI evaluator.

The oracle is an independent, deliberately-naive transcription of the
devkit eval.cpp flow: per-pair overlap via the C++ native library (a
completely separate IoU implementation) where available, else the AoS
geometry path, and direct per-object loops with no matrix caching."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from d3d_tpu.abstraction import ObjectTag, ObjectTarget3D, Target3DArray
from d3d_tpu.benchmarks_kitti import (evaluate_kitti_official,
                                      N_SAMPLE_PTS, _MIN_HEIGHT)
from d3d_tpu.dataset.kitti.utils import KittiObjectClass


def _obj(cls, x, y, yaw, l=4.0, w=2.0, h=1.6, z=0.0, score=None, bbox=None,
         occ=0, trunc=0.0, bh=100.0):
    aux = dict(occluded=occ, truncated=trunc, box_height=bh)
    if bbox is not None:
        aux["bbox"] = list(bbox)
    return ObjectTarget3D([x, y, z], Rotation.from_euler("Z", yaw),
                          [l, w, h], ObjectTag(cls, KittiObjectClass,
                                               score), aux=aux)


# ---------------------------------------------------------------------------
# independent oracle
# ---------------------------------------------------------------------------

def _iou3d_pair(a, b):
    """3D rotated IoU via the native C++ BEV kernel (independent of the
    JAX geometry) composed with the z interval."""
    from d3d_tpu import native

    b1 = np.array([[a.position[0], a.position[1], a.dimension[0],
                    a.dimension[1], a.yaw]], float)
    b2 = np.array([[b.position[0], b.position[1], b.dimension[0],
                    b.dimension[1], b.yaw]], float)
    if native.available():
        iou_bev = float(native.rbox_iou_matrix(b1, b2)[0, 0])
    else:  # pragma: no cover
        from d3d_tpu.ops.geometry import rbox_iou
        import jax.numpy as jnp

        iou_bev = float(rbox_iou(jnp.asarray(b1[0]), jnp.asarray(b2[0])))
    a1 = a.dimension[0] * a.dimension[1]
    a2 = b.dimension[0] * b.dimension[1]
    inter_area = iou_bev * (a1 + a2) / (1.0 + iou_bev) if iou_bev > 0 else 0
    z1 = (a.position[2] - a.dimension[2] / 2, a.position[2] + a.dimension[2] / 2)
    z2 = (b.position[2] - b.dimension[2] / 2, b.position[2] + b.dimension[2] / 2)
    zi = max(0.0, min(z1[1], z2[1]) - max(z1[0], z2[0]))
    vi = inter_area * zi
    v1 = a1 * a.dimension[2]
    v2 = a2 * b.dimension[2]
    return vi / (v1 + v2 - vi) if vi > 0 else 0.0


def oracle_eval(gt_frames, dt_frames, cls, difficulty, min_overlap,
                dontcares):
    """Literal eval.cpp flow with per-pair overlap calls."""
    NEIGH = {"Car": ("Van",), "Pedestrian": ("Person_sitting",)}
    MAXO = (0, 1, 2)
    MAXT = (0.15, 0.30, 0.50)

    def clean(gt, dt):
        ig, n = [], 0
        for o in gt:
            nm = o.tag_top.name
            vc = 1 if nm == cls.name else (0 if nm in NEIGH.get(cls.name, ())
                                           else -1)
            ignore = (o.aux["occluded"] > MAXO[difficulty]
                      or o.aux["truncated"] > MAXT[difficulty]
                      or o.aux["box_height"] <= _MIN_HEIGHT[difficulty])
            if vc == 1 and not ignore:
                ig.append(0)
                n += 1
            elif vc == 0 or (ignore and vc == 1):
                ig.append(1)
            else:
                ig.append(-1)
        idt = []
        for o in dt:
            bb = o.aux.get("bbox")
            hgt = bb[3] - bb[1] if bb else o.aux.get("box_height", np.inf)
            if hgt < _MIN_HEIGHT[difficulty]:
                idt.append(1)
            elif o.tag_top.name == cls.name:
                idt.append(0)
            else:
                idt.append(-1)
        return ig, idt, n

    def stats(gt, dt, ig, idt, dc, compute_fp, thresh):
        nd = len(dt)
        assigned = [False] * nd
        igth = [dt[j].tag.scores[0] < thresh if compute_fp else False
                for j in range(nd)]
        tp = fp = fn = 0
        v = []
        NO = -1e9
        for i in range(len(gt)):
            if ig[i] == -1:
                continue
            det_idx, valid, maxov, aid = -1, NO, 0.0, False
            for j in range(nd):
                if idt[j] == -1 or assigned[j] or igth[j]:
                    continue
                ov = _iou3d_pair(dt[j], gt[i])
                if not compute_fp and ov > min_overlap \
                        and dt[j].tag.scores[0] > valid:
                    det_idx, valid = j, dt[j].tag.scores[0]
                elif compute_fp and ov > min_overlap \
                        and (ov > maxov or aid) and idt[j] == 0:
                    maxov, det_idx, valid, aid = ov, j, 1.0, False
                elif compute_fp and ov > min_overlap and valid == NO \
                        and idt[j] == 1:
                    det_idx, valid, aid = j, 1.0, True
            if valid == NO and ig[i] == 0:
                fn += 1
            elif valid != NO and (ig[i] == 1 or idt[det_idx] == 1):
                assigned[det_idx] = True
            elif valid != NO:
                tp += 1
                v.append(dt[det_idx].tag.scores[0])
                assigned[det_idx] = True
        if compute_fp:
            for j in range(nd):
                if not (assigned[j] or idt[j] in (-1, 1) or igth[j]):
                    fp += 1
            nstuff = 0
            for d in dc:
                for j in range(nd):
                    if assigned[j] or idt[j] in (-1, 1) or igth[j]:
                        continue
                    bb = dt[j].aux.get("bbox")
                    if bb is None:
                        continue
                    x1, y1 = max(bb[0], d[0]), max(bb[1], d[1])
                    x2, y2 = min(bb[2], d[2]), min(bb[3], d[3])
                    if x2 > x1 and y2 > y1:
                        ov = (x2 - x1) * (y2 - y1) / (
                            (bb[2] - bb[0]) * (bb[3] - bb[1]))
                        if ov > min_overlap:
                            assigned[j] = True
                            nstuff += 1
            fp -= nstuff
        return tp, fp, fn, v

    cleaned = [clean(g, d) for g, d in zip(gt_frames, dt_frames)]
    n_gt = sum(c[2] for c in cleaned)
    allv = []
    for (g, d, (ig, idt, _), dc) in zip(gt_frames, dt_frames, cleaned,
                                        dontcares):
        allv += stats(g, d, ig, idt, dc, False, 0.0)[3]
    # thresholds
    vv = sorted(allv, reverse=True)
    ths, cur = [], 0.0
    for i in range(len(vv)):
        lr = (i + 1) / n_gt
        rr = (i + 2) / n_gt if i < len(vv) - 1 else lr
        if (rr - cur) < (cur - lr) and i < len(vv) - 1:
            continue
        ths.append(vv[i])
        cur += 1.0 / (N_SAMPLE_PTS - 1)
    prec = np.zeros(N_SAMPLE_PTS)
    for ti, t in enumerate(ths):
        tp = fp = 0
        for (g, d, (ig, idt, _), dc) in zip(gt_frames, dt_frames, cleaned,
                                            dontcares):
            a, b, _, _ = stats(g, d, ig, idt, dc, True, t)
            tp += a
            fp += b
        prec[ti] = tp / (tp + fp) if tp + fp else 0.0
    for i in range(N_SAMPLE_PTS):
        prec[i] = prec[i:].max()
    return dict(ap_r40=float(prec[1:].mean()),
                ap_r11=float(prec[0::4].mean()), precision=prec)


# ---------------------------------------------------------------------------
# scenes
# ---------------------------------------------------------------------------

def make_scene(rng, nframes=6, ngt=8, extra=5):
    gts, dts = [], []
    score_pool = iter(rng.permutation(np.linspace(0.05, 0.99, 2048)))
    for _ in range(nframes):
        gt = Target3DArray(frame="velo")
        dt = Target3DArray(frame="velo")
        for _ in range(ngt):
            cls = [KittiObjectClass.Car, KittiObjectClass.Van,
                   KittiObjectClass.Pedestrian][rng.integers(3)]
            x, y = rng.uniform(5, 60), rng.uniform(-25, 25)
            z = float(rng.uniform(-1, 1))
            hh = float(rng.uniform(1.2, 2.2))
            yaw = rng.uniform(-np.pi, np.pi)
            occ = int(rng.integers(0, 3))
            trunc = float(rng.uniform(0, 0.4))
            bh = float(rng.uniform(20, 80))
            gt.append(_obj(cls, x, y, yaw, h=hh, z=z, occ=occ, trunc=trunc,
                           bh=bh))
            if rng.random() < 0.8:
                # z/h jitter makes the 3D metric sensitive to the VOLUME
                # IoU formula (a bev-x-z IoU product would differ)
                dt.append(_obj(cls, x + rng.normal(0, 0.3),
                               y + rng.normal(0, 0.3),
                               yaw + rng.normal(0, 0.05),
                               h=hh * float(rng.uniform(0.85, 1.15)),
                               z=z + float(rng.normal(0, 0.2)),
                               score=float(next(score_pool)),
                               bbox=(0, 0, 50, 30 + rng.uniform(0, 60))))
        for _ in range(extra):
            cls = [KittiObjectClass.Car, KittiObjectClass.Pedestrian][
                rng.integers(2)]
            dt.append(_obj(cls, rng.uniform(5, 60), rng.uniform(-25, 25),
                           rng.uniform(-np.pi, np.pi),
                           score=float(next(score_pool)),
                           bbox=(0, 0, 50, 30 + rng.uniform(0, 60))))
        gt.dontcare = np.zeros((0, 4))
        gts.append(gt)
        dts.append(dt)
    return gts, dts


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("difficulty", [0, 2])
def test_official_matches_oracle(seed, difficulty):
    rng = np.random.default_rng(seed)
    gts, dts = make_scene(rng)
    res = evaluate_kitti_official(gts, dts, KittiObjectClass.Car,
                                  difficulty=difficulty, min_overlap=0.5)
    want = oracle_eval(gts, dts, KittiObjectClass.Car, difficulty, 0.5,
                       [g.dontcare for g in gts])
    np.testing.assert_allclose(res["precision"], want["precision"],
                               atol=1e-9)
    assert res["ap_r40"] == pytest.approx(want["ap_r40"], abs=1e-9)
    assert res["ap_r11"] == pytest.approx(want["ap_r11"], abs=1e-9)


def test_self_match_perfect_ap():
    """A perfect detector over enough GT (so the 41 recall sample slots
    fill — with fewer TPs than ~41 the devkit's threshold walk genuinely
    truncates the curve) scores ~1."""
    rng = np.random.default_rng(3)
    gts, dts = [], []
    sid = 0
    for _ in range(4):
        gt = Target3DArray(frame="velo")
        dt = Target3DArray(frame="velo")
        for i in range(50):
            x, y = rng.uniform(5, 500), rng.uniform(-250, 250)
            yaw = rng.uniform(-np.pi, np.pi)
            gt.append(_obj(KittiObjectClass.Car, x, y, yaw))
            dt.append(_obj(KittiObjectClass.Car, x, y, yaw,
                           score=float(0.2 + 0.003 * sid),
                           bbox=(0, 0, 40, 80)))
            sid += 1
        gt.dontcare = np.zeros((0, 4))
        gts.append(gt)
        dts.append(dt)
    res = evaluate_kitti_official(gts, dts, KittiObjectClass.Car,
                                  difficulty=1, min_overlap=0.7)
    assert res["n_gt"] == 200
    assert res["ap_r40"] >= 0.97
    assert res["ap_r11"] >= 0.97
    assert (res["fp"] == 0).all() and res["tp"].max() == 200


def test_dontcare_suppression_and_van_absorption():
    """A detection on a DontCare region is not FP; a Van gt absorbs a Car
    detection (neither TP nor FP); a detection below the height gate is
    invisible."""
    gt = Target3DArray(frame="velo")
    gt.append(_obj(KittiObjectClass.Car, 10, 0, 0))
    gt.append(_obj(KittiObjectClass.Van, 30, 10, 0))
    gt.dontcare = np.array([[100.0, 100.0, 200.0, 200.0]])
    # the TP carries the LOWEST score so the single threshold derived
    # from it admits every detection below
    dt = Target3DArray(frame="velo")
    dt.append(_obj(KittiObjectClass.Car, 10, 0, 0, score=0.4,
                   bbox=(0, 0, 40, 80)))             # TP
    dt.append(_obj(KittiObjectClass.Car, 30, 10, 0, score=0.8,
                   bbox=(0, 0, 40, 80)))             # absorbed by Van gt
    dt.append(_obj(KittiObjectClass.Car, 50, -20, 0, score=0.7,
                   bbox=(110, 110, 190, 190)))       # inside DontCare
    dt.append(_obj(KittiObjectClass.Car, 55, 20, 0, score=0.6,
                   bbox=(0, 0, 40, 10)))             # too small: ignored
    dt.append(_obj(KittiObjectClass.Car, 40, -10, 0, score=0.5,
                   bbox=(0, 0, 40, 80)))             # genuine FP
    res = evaluate_kitti_official([gt], [dt], KittiObjectClass.Car,
                                  difficulty=1, min_overlap=0.5)
    assert res["n_gt"] == 1
    assert res["tp"][0] == 1
    assert res["fp"][0] == 1  # only the genuine FP counts
    assert res["fn"][0] == 0


def test_2d_metric_and_aos():
    """Image-plane 2D AP + average orientation similarity: perfect boxes
    with perfect alphas give AOS == AP; flipping every detection's alpha
    by pi drives AOS to ~0 while AP stays."""
    def frame(alpha_flip):
        gt = Target3DArray(frame="velo")
        dt = Target3DArray(frame="velo")
        rng = np.random.default_rng(11)
        for i in range(50):
            x, y = rng.uniform(5, 400), rng.uniform(-200, 200)
            bb = (10.0 * i, 0.0, 10.0 * i + 8.0, 60.0)
            a = float(rng.uniform(-np.pi, np.pi))
            g = _obj(KittiObjectClass.Car, x, y, 0.0, bbox=bb)
            g.aux["alpha"] = a
            gt.append(g)
            d = _obj(KittiObjectClass.Car, x, y, 0.0, bbox=bb,
                     score=0.2 + 0.01 * i)
            d.aux["alpha"] = a + (np.pi if alpha_flip else 0.0)
            dt.append(d)
        gt.dontcare = np.zeros((0, 4))
        return gt, dt

    gt, dt = frame(False)
    res = evaluate_kitti_official([gt], [dt], KittiObjectClass.Car,
                                  difficulty=1, metric="2d",
                                  min_overlap=0.7, compute_aos=True)
    assert res["ap_r40"] > 0.9
    assert res["aos_r40"] == pytest.approx(res["ap_r40"], abs=1e-9)

    gt2, dt2 = frame(True)
    res2 = evaluate_kitti_official([gt2], [dt2], KittiObjectClass.Car,
                                   difficulty=1, metric="2d",
                                   min_overlap=0.7, compute_aos=True)
    assert res2["ap_r40"] == pytest.approx(res["ap_r40"], abs=1e-9)
    assert res2["aos_r40"] < 1e-9  # cos(pi) similarity is exactly 0


def test_2d_overlap_matrix_values():
    """Axis-aligned 2D IoU oracle check."""
    from d3d_tpu.benchmarks_kitti import _overlap_matrix

    g = _obj(KittiObjectClass.Car, 0, 0, 0, bbox=(0, 0, 10, 10))
    d1 = _obj(KittiObjectClass.Car, 0, 0, 0, bbox=(0, 0, 10, 10), score=1)
    d2 = _obj(KittiObjectClass.Car, 0, 0, 0, bbox=(5, 0, 15, 10), score=1)
    d3 = _obj(KittiObjectClass.Car, 0, 0, 0, score=1)  # no bbox
    gt = Target3DArray([g], frame="velo")
    dt = Target3DArray([d1, d2, d3], frame="velo")
    m = _overlap_matrix(dt, gt, "2d")
    np.testing.assert_allclose(m[:, 0], [1.0, 50 / 150, 0.0], atol=1e-12)


def test_official_summary_table():
    rng = np.random.default_rng(5)
    gts, dts = make_scene(rng, nframes=4)
    from d3d_tpu.benchmarks_kitti import kitti_official_summary

    text, results = kitti_official_summary(
        gts, dts, [KittiObjectClass.Car, KittiObjectClass.Pedestrian],
        metrics=("bev", "3d"))
    assert "Car BEV AP_R40@0.70" in text
    assert "Pedestrian  3D AP_R40@0.50" in text
    for cls in results:
        for metric in ("bev", "3d"):
            for d in range(3):
                r = results[cls][metric][d]
                assert 0.0 <= r["ap_r40"] <= 1.0
    # bev AP >= 3d AP (bev overlap is never smaller than 3d IoU)
    car = results[KittiObjectClass.Car]
    for d in range(3):
        assert car["bev"][d]["ap_r40"] >= car["3d"][d]["ap_r40"] - 1e-9


def test_eval_cli_on_fixture(tmp_path, monkeypatch, capsys):
    """d3d_tpu_kitti_eval end-to-end: GT echoed back as detections (with
    scores) produces a perfect first-threshold precision through the CLI."""
    import sys

    import kitti_fixture as kfx
    from d3d_tpu.dataset.kitti.object import (KittiObjectLoader,
                                              evaluate_detection_results)

    root = tmp_path / "kitti"
    kfx.build_unzipped(root, nframes=3)
    # write GT-as-detections result files (label format + score column)
    results = tmp_path / "results"
    results.mkdir()
    loader = KittiObjectLoader(root, inzip=False, phase="validation",
                               trainval_split=0.0)
    for i in range(len(loader)):
        uidx = loader._parse_idx(i)
        src = root / "training" / "label_2" / ("%06d.txt" % uidx)
        lines = []
        for line in src.read_text().splitlines():
            if line.startswith("DontCare"):
                continue
            lines.append(line + " 0.9")
        (results / ("%06d.txt" % uidx)).write_text("\n".join(lines) + "\n")

    monkeypatch.setattr(sys, "argv", [
        "d3d_tpu_kitti_eval", str(root), str(results),
        "--classes", "Car", "--metrics", "3d", "--split", "0.0"])
    evaluate_detection_results()
    out = capsys.readouterr().out
    assert "Car  3D AP_R40@0.70" in out
