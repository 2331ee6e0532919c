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
