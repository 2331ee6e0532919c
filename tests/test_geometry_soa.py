"""SoA rotated-IoU kernel: exact agreement with the AoS reference
implementation (values and gradients) across fuzz cases."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from d3d_tpu.ops import geometry as G
from d3d_tpu.ops import geometry_soa as S


def _boxes(rng, n):
    return np.stack([
        rng.random(n) * 20,
        rng.random(n) * 20,
        rng.random(n) * 6 + 1,
        rng.random(n) * 6 + 1,
        rng.random(n) * 6 - 3,
    ], axis=1)


def test_matches_aos_fuzz(rng):
    b = jnp.asarray(_boxes(rng, 64))
    aos = np.asarray(G.rbox_iou(b[:, None], b[None, :]))
    soa = np.asarray(S.rbox_iou(b[:, None], b[None, :]))
    assert np.allclose(aos, soa, atol=1e-9)


def test_oracles(rng):
    eps = 1e-3
    b1 = jnp.asarray(np.array([[0, 0, 2, 2, 0.0], [-1, 1, 2, 2, 0], [1, 1, 2, 2, 0]], float))
    b2 = jnp.asarray(np.array([
        [-1, 1, 2 * np.sqrt(2) - eps, 2 * np.sqrt(2) - eps, np.pi / 4 - eps],
        [1, 1, np.sqrt(2) + eps, np.sqrt(2) + eps, np.pi / 4 + eps],
    ]))
    expected = np.array([[1 / 5, 1 / 11], [1 / 2, 0], [1 / 11, 1 / 2]])
    got = np.asarray(S.rbox_iou(b1[:, None], b2[None, :]))
    assert np.allclose(got, expected, atol=4e-3)


def test_grad_matches_aos(rng):
    b1 = jnp.asarray(np.array([0.1, 0.2, 2.0, 3.0, 0.3]))
    b2 = jnp.asarray(np.array([0.8, -0.3, 2.5, 1.5, -0.5]))
    g_aos = jax.grad(lambda a: G.rbox_iou(a, b2))(b1)
    g_soa = jax.grad(lambda a: S.rbox_iou(a, b2))(b1)
    assert np.allclose(np.asarray(g_aos), np.asarray(g_soa), atol=1e-9)


def test_riou_loss_grad_parity(rng):
    """The training rIoU loss (decode -> BEV -> 1-IoU, the exact shape
    detection_loss builds) must produce identical values and gradients
    wrt the raw box predictions through the AoS and SoA kernels — the
    loss routes to SoA on TPU and AoS on CPU (models/pointpillars.py)."""
    from d3d_tpu.models.pointpillars import decode_boxes

    n = 48
    anchors = jnp.asarray(np.stack([
        rng.uniform(-20, 20, n), rng.uniform(-20, 20, n),
        np.full(n, -1.0), rng.uniform(1.5, 4, n), rng.uniform(1.5, 4, n),
        np.full(n, 1.5), rng.uniform(-np.pi, np.pi, n)], axis=1))
    preds = jnp.asarray(rng.normal(0, 0.2, (n, 7)))
    tgts = jnp.asarray(rng.normal(0, 0.2, (n, 7)))

    def riou_loss(impl, p):
        dec = decode_boxes(anchors, p)
        gt = decode_boxes(anchors, tgts)
        bev_p = jnp.concatenate([dec[..., 0:2], dec[..., 3:5],
                                 dec[..., 6:7]], axis=-1)
        bev_g = jnp.concatenate([gt[..., 0:2], gt[..., 3:5],
                                 gt[..., 6:7]], axis=-1)
        return jnp.sum(1.0 - impl(bev_p, bev_g))

    v_aos, g_aos = jax.value_and_grad(
        lambda p: riou_loss(G.rbox_iou, p))(preds)
    v_soa, g_soa = jax.value_and_grad(
        lambda p: riou_loss(S.rbox_iou, p))(preds)
    assert np.allclose(float(v_aos), float(v_soa), atol=1e-8)
    assert np.allclose(np.asarray(g_aos), np.asarray(g_soa), atol=1e-8)
    assert np.isfinite(np.asarray(g_soa)).all()


def test_pruned_sort_network(rng):
    # the 132-comparator pruned Batcher network must sort any 24 keys
    for _ in range(500):
        a = list(rng.random(24))
        b = list(a)
        for i, j in S._PAIRS24:
            if b[i] > b[j]:
                b[i], b[j] = b[j], b[i]
        assert b == sorted(a)


def test_diamond_angle_monotone():
    # strictly increasing in atan2 over a dense sweep of directions
    ang = np.linspace(-np.pi + 1e-6, np.pi, 4096)
    key = np.asarray(S._diamond_angle(jnp.asarray(np.cos(ang)),
                                      jnp.asarray(np.sin(ang))))
    assert np.all(np.diff(key) > 0)
    assert key.min() > -2 and key.max() <= 2


def test_f32_path(rng):
    b = jnp.asarray(_boxes(rng, 32), jnp.float32)
    m = np.asarray(S.rbox_iou(b[:, None], b[None, :]))
    assert np.allclose(np.diag(m), 1.0, atol=1e-4)
    assert m.min() >= 0 and m.max() <= 1 + 1e-5


def test_pallas_nms_scan_parity(rng):
    from d3d_tpu.ops.nms_pallas import nms_scan

    n = 160
    ov = jnp.asarray(rng.random((n, n)) < 0.07)
    ov = ov | ov.T
    pre = jnp.asarray(rng.random(n) < 0.1)

    def ref_scan(overlap, pre):
        s = np.asarray(pre).copy()
        o = np.asarray(overlap)
        for i in range(n):
            if not s[i]:
                s[i + 1:] |= o[i, i + 1:]
        return s

    got = np.asarray(nms_scan(ov, pre, interpret=True))
    assert np.array_equal(got, ref_scan(ov, pre))


@pytest.mark.parametrize("n", [5, 128, 200, 515])
def test_pallas_nms_blocked_parity(rng, n):
    """The block-parallel cascade (intra-block serial chain on the
    diagonal tile + one full-width apply per 128-box block) produces the
    exact keep-mask of the sequential greedy scan at every size, padded
    or aligned."""
    from d3d_tpu.ops.nms_pallas import nms_scan_blocked

    ov = jnp.asarray(rng.random((n, n)) < 0.07)
    ov = ov | ov.T
    pre = jnp.asarray(rng.random(n) < 0.1)

    def ref_scan(overlap, pre):
        s = np.asarray(pre).copy()
        o = np.asarray(overlap)
        for i in range(n):
            if not s[i]:
                s[i + 1:] |= o[i, i + 1:]
        return s

    got = np.asarray(nms_scan_blocked(ov, pre, interpret=True))
    assert np.array_equal(got, ref_scan(ov, pre))


def test_pallas_soft_nms_parity(rng):
    # the Pallas cascade (interpret mode) matches the XLA fallback loop
    from d3d_tpu.ops import nms as N
    from d3d_tpu.ops.nms_pallas import soft_nms_scan

    n = 96
    boxes = jnp.asarray(_boxes(rng, n), jnp.float32)
    scores = jnp.asarray(rng.random(n), jnp.float32)
    for method, param in (("linear", 0.5), ("gaussian", 0.4)):
        ref = np.asarray(N.soft_nms2d(
            boxes, scores, iou_threshold=0.2, score_threshold=0.1,
            supression_param=param, supression_method=method))
        iou = N._iou_matrix(boxes, "rbox").astype(jnp.float32)
        order = jnp.argsort(-scores, stable=True)
        pre = (scores <= 0.1).at[order[0]].set(False)
        init = jnp.where(pre, -jnp.inf, scores)
        got = np.asarray(soft_nms_scan(iou, init, pre, 0.2, 0.1, param,
                                       method, interpret=True))
        assert np.array_equal(got, ref), method


def test_pallas_matrix_parity(rng):
    # the Pallas tile kernel (interpret mode on CPU) matches the XLA SoA
    # path on non-tile-aligned shapes, including the diag == 1 boxes
    from d3d_tpu.ops import geometry_pallas as P

    b1 = jnp.asarray(_boxes(rng, 37), jnp.float32)
    b2 = jnp.concatenate([b1[:5], jnp.asarray(_boxes(rng, 150), jnp.float32)])
    ref = np.asarray(S.rbox_iou(b1[:, None].astype(jnp.float32),
                                b2[None, :].astype(jnp.float32)))
    got = np.asarray(P.rbox_iou_matrix(b1, b2, interpret=True))
    assert got.shape == (37, 155)
    assert np.allclose(got, ref, atol=2e-5)
    assert np.allclose(got[:5, :5].diagonal(), 1.0, atol=1e-4)
