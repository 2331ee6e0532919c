"""Device semantic-confusion counting: integer-exact parity with the host
SegmentationEvaluator, ragged frames, and the dp-sharded mesh path."""

import numpy as np
import pytest

from d3d_tpu.benchmarks import SegmentationEvaluator
from d3d_tpu.benchmarks_device import device_semantic_stats

CLASSES = [1, 2, 3, 7]


def _frames(rng, nframes=5, background=0):
    gts, preds = [], []
    labels = np.asarray([background] + CLASSES + [9])  # 9: out-of-set class
    for _ in range(nframes):
        n = int(rng.integers(50, 400))
        gts.append(labels[rng.integers(0, len(labels), n)].astype(np.uint8))
        # correlated predictions: mostly right, sometimes shuffled
        flip = rng.random(n) < 0.3
        preds.append(np.where(
            flip, labels[rng.integers(0, len(labels), n)],
            gts[-1]).astype(np.uint8))
    return gts, preds


def _host(gts, preds):
    ev = SegmentationEvaluator(CLASSES, background=0)
    for g, p in zip(gts, preds):
        ev.add_stats(ev.calc_stats(g, p))
    return ev


def test_device_matches_host(rng):
    gts, preds = _frames(rng)
    host = _host(gts, preds)
    ev = SegmentationEvaluator(CLASSES, background=0)
    ev.add_stats(device_semantic_stats(ev, gts, preds))
    for k in CLASSES:
        assert ev._stats.tp[k] == host._stats.tp[k], k
        assert ev._stats.fp[k] == host._stats.fp[k], k
        assert ev._stats.fn[k] == host._stats.fn[k], k
    for k, v in ev.iou().items():
        assert v == pytest.approx(host.iou()[k], abs=1e-12, nan_ok=True)


def test_mesh_path_matches_host(rng):
    import jax

    if len(jax.devices()) < 2:  # pragma: no cover
        pytest.skip("needs a multi-device (CPU) mesh")
    from d3d_tpu.parallel import make_mesh

    mesh = make_mesh(len(jax.devices()))
    gts, preds = _frames(rng, nframes=5)  # not a dp multiple: pads
    host = _host(gts, preds)
    ev = SegmentationEvaluator(CLASSES, background=0)
    ev.add_stats(device_semantic_stats(ev, gts, preds, mesh=mesh))
    for k in CLASSES:
        assert ev._stats.tp[k] == host._stats.tp[k], k
        assert ev._stats.fp[k] == host._stats.fp[k], k
        assert ev._stats.fn[k] == host._stats.fn[k], k


def test_empty_and_single_point_frames(rng):
    gts = [np.zeros(0, np.uint8), np.asarray([2], np.uint8)]
    preds = [np.zeros(0, np.uint8), np.asarray([3], np.uint8)]
    host = _host(gts, preds)
    ev = SegmentationEvaluator(CLASSES, background=0)
    ev.add_stats(device_semantic_stats(ev, gts, preds))
    for k in CLASSES:
        assert ev._stats.tp[k] == host._stats.tp[k]
        assert ev._stats.fp[k] == host._stats.fp[k]
        assert ev._stats.fn[k] == host._stats.fn[k]


def _pano_frames(rng, nframes=4, background=0):
    """Random panoptic frames: blobby instances via repeated ids."""
    gts, preds, gids, pids = [], [], [], []
    labels = np.asarray([background] + CLASSES + [9])
    for _ in range(nframes):
        n = int(rng.integers(80, 400))
        # instance structure: points drawn from ~12 (label, id) segments
        segs = []
        for s in range(12):
            lab = labels[rng.integers(0, len(labels))]
            segs.append((lab, s + 1 if lab != background else 0))
        pick = rng.integers(0, len(segs), n)
        gl = np.asarray([segs[i][0] for i in pick], np.uint8)
        gi = np.asarray([segs[i][1] for i in pick], np.uint16)
        # predictions: mostly copy gt segments, some corrupted
        flip = rng.random(n) < 0.25
        alt = rng.integers(0, len(segs), n)
        pl = np.where(flip, [segs[i][0] for i in alt], gl).astype(np.uint8)
        pi = np.where(flip, [segs[i][1] for i in alt], gi).astype(np.uint16)
        # some predictions invent new ids
        inv = rng.random(n) < 0.1
        pi = np.where(inv & (pl != background), pi + 20, pi).astype(np.uint16)
        gts.append(gl)
        preds.append(pl)
        gids.append(gi)
        pids.append(pi)
    return gts, preds, gids, pids


@pytest.mark.parametrize("min_points", [0, 5])
def test_panoptic_device_matches_host(rng, min_points):
    from d3d_tpu.benchmarks_device import device_panoptic_stats

    gts, preds, gids, pids = _pano_frames(rng)
    host = SegmentationEvaluator(CLASSES, background=0,
                                 min_points=min_points)
    for g, p, gi, pi in zip(gts, preds, gids, pids):
        host.add_stats(host.calc_stats(g, p, gi, pi))
    dev = SegmentationEvaluator(CLASSES, background=0,
                                min_points=min_points)
    dev.add_stats(device_panoptic_stats(dev, gts, preds, gids, pids))
    hs, ds = host._stats, dev._stats
    for k in CLASSES:
        assert ds.tp[k] == hs.tp[k], ("tp", k)
        assert ds.fp[k] == hs.fp[k], ("fp", k)
        assert ds.fn[k] == hs.fn[k], ("fn", k)
        assert ds.itp[k] == hs.itp[k], ("itp", k)
        assert ds.ifp[k] == hs.ifp[k], ("ifp", k)
        assert ds.ifn[k] == hs.ifn[k], ("ifn", k)
        assert ds.cumiou[k] == pytest.approx(hs.cumiou[k], abs=1e-12), k
    # derived metrics identical too
    for m in ("pq", "sq", "rq"):
        hv, dv = getattr(host, m)(), getattr(dev, m)()
        for k in hv:
            assert dv[k] == pytest.approx(hv[k], abs=1e-12, nan_ok=True)


def test_panoptic_mesh_matches_host(rng):
    import jax

    if len(jax.devices()) < 2:  # pragma: no cover
        pytest.skip("needs a multi-device (CPU) mesh")
    from d3d_tpu.benchmarks_device import device_panoptic_stats
    from d3d_tpu.parallel import make_mesh

    mesh = make_mesh(len(jax.devices()))
    gts, preds, gids, pids = _pano_frames(rng, nframes=5)
    host = SegmentationEvaluator(CLASSES, background=0)
    for g, p, gi, pi in zip(gts, preds, gids, pids):
        host.add_stats(host.calc_stats(g, p, gi, pi))
    dev = SegmentationEvaluator(CLASSES, background=0)
    dev.add_stats(device_panoptic_stats(dev, gts, preds, gids, pids,
                                        mesh=mesh))
    for k in CLASSES:
        assert dev._stats.itp[k] == host._stats.itp[k]
        assert dev._stats.ifp[k] == host._stats.ifp[k]
        assert dev._stats.ifn[k] == host._stats.ifn[k]
        assert dev._stats.cumiou[k] == pytest.approx(
            host._stats.cumiou[k], abs=1e-12)


def test_panoptic_perfect_prediction(rng):
    from d3d_tpu.benchmarks_device import device_panoptic_stats

    gts, _, gids, _ = _pano_frames(rng, nframes=2)
    ev = SegmentationEvaluator(CLASSES, background=0)
    ev.add_stats(device_panoptic_stats(ev, gts, gts, gids, gids))
    pq = ev.pq()
    for k, v in pq.items():
        if not np.isnan(v):
            assert v == pytest.approx(1.0, abs=1e-12), k
