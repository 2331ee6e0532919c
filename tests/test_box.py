"""Public box-op API tests: NMS keep-masks, soft-NMS invariants, crop vs
analytic membership, pdist sign conventions (oracle values mirror the
reference suite /root/reference/test/test_box.py)."""

import numpy as np
import pytest

from d3d_tpu.ops.box import (
    box2d_iou,
    box2d_nms,
    box2dr_crop,
    box3dp_crop,
    box2dr_pdist,
    box3dr_pdist,
    seg1d_iou,
    seg1d_pdist,
)

sq2 = np.sqrt(2)
d45 = np.pi / 4
eps = 1e-3


class TestIouAPI:
    def test_numpy_in_numpy_out(self):
        b1 = np.array([[0, 0, 2, 2, 0]], dtype=np.float32)
        b2 = np.array([[1, 1, 2, 2, 0]], dtype=np.float32)
        out = box2d_iou(b1, b2, method="rbox")
        assert isinstance(out, np.ndarray)
        assert out.dtype == np.float32
        assert abs(out[0, 0] - 1 / 7) < 1e-6

    def test_all_methods_run(self):
        b = np.random.rand(7, 5) + 0.5
        for m in ("box", "rbox", "grbox", "drbox"):
            out = box2d_iou(b, b, method=m)
            assert out.shape == (7, 7)
            assert np.allclose(np.diag(out), 1.0, atol=1e-6)

    def test_validation(self):
        with pytest.raises(ValueError):
            box2d_iou(np.zeros((3, 4)), np.zeros((3, 5)))
        with pytest.raises(ValueError):
            box2d_iou(np.zeros((3, 5)), np.zeros((3, 5)), method="nope")


class TestNMS:
    def test_nms_oracle(self):
        boxes = np.array(
            [
                [1, 1, 2 - 10 * eps, 2 - 10 * eps, 0],
                [2, 2, 2 - 10 * eps, 2 - 10 * eps, eps],
                [3, 3, 2 - 10 * eps, 2 - 10 * eps, 2 * eps],
                [3, 1, 1, 2, 3 * eps],
                [4, 2, 1, 2, 4 * eps],
                [5, 3, 1, 2, 5 * eps],
            ],
            dtype=np.float64,
        )
        scores = np.array([0.5, 0.3, 0.4, 0.4, 0.2, 0.1])
        expected = np.array([True, False, True, True, False, True])
        for method in ("box", "rbox"):
            mask = box2d_nms(boxes, scores, iou_method=method)
            assert np.array_equal(mask, expected), (method, mask)

    def test_nms_score_threshold_fuzz(self, rng):
        n = 200
        boxes = np.stack(
            [
                rng.random(n) * 200,
                rng.random(n) * 400,
                rng.random(n) * 20 + 10,
                rng.random(n) * 30 + 5,
                rng.random(n) * 2 - 1,
            ],
            axis=1,
        )
        scores = rng.random(n)
        for method in ("box", "rbox"):
            for st in (0, 0.2, 0.5, 0.8):
                mask = box2d_nms(
                    boxes, scores, iou_method=method,
                    iou_threshold=0.3, score_threshold=st,
                )
                assert not np.any(mask[scores <= st])

    def test_softnms_keeps_all_without_threshold(self):
        boxes = np.array(
            [
                [1, 1, 2, 2, 0],
                [2, 2, 2, 2, 0],
                [3, 3, 2, 2, 0],
                [3, 1, 1, 1, 0],
                [4, 2, 1, 1, 0],
                [5, 3, 1, 1, 0],
            ],
            dtype=np.float64,
        )
        scores = np.array([0.5, 0.3, 0.4, 0.4, 0.2, 0.1])
        for method in ("box", "rbox"):
            for sup in ("linear", "gaussian"):
                mask = box2d_nms(
                    boxes, scores, iou_method=method, supression_method=sup,
                    supression_param=0.5,
                )
                assert np.all(mask), (method, sup, mask)

    def test_softnms_suppresses_with_threshold(self):
        # two heavily overlapping boxes: the weaker one should decay below 0.2
        boxes = np.array([[0, 0, 2, 2, 0.0], [0.1, 0, 2, 2, 0.0]])
        scores = np.array([0.9, 0.5])
        mask = box2d_nms(
            boxes, scores, iou_method="rbox", supression_method="linear",
            supression_param=1.0, score_threshold=0.2,
        )
        assert mask[0] and not mask[1]

    def test_empty(self):
        mask = box2d_nms(np.zeros((0, 5)), np.zeros((0,)))
        assert mask.shape == (0,)

    def test_matches_host_reference(self, rng):
        """Greedy hard NMS vs a straightforward numpy implementation."""
        n = 80
        boxes = np.stack(
            [
                rng.random(n) * 20,
                rng.random(n) * 20,
                rng.random(n) * 8 + 2,
                rng.random(n) * 8 + 2,
                rng.random(n) * 2 - 1,
            ],
            axis=1,
        )
        scores = rng.random(n)
        iou = box2d_iou(boxes, boxes, method="rbox")
        thr = 0.25
        order = np.argsort(-scores, kind="stable")
        sup = np.zeros(n, bool)
        for oi, i in enumerate(order):
            if sup[i]:
                continue
            for j in order[oi + 1:]:
                if iou[i, j] > thr:
                    sup[j] = True
        got = box2d_nms(boxes, scores, iou_method="rbox", iou_threshold=thr)
        assert np.array_equal(got, ~sup)


class TestCropAndDist:
    def test_box_crop(self, rng):
        cloud = rng.random((100, 2)) * 2 - 1
        boxes = np.array([[0, 0, 1, 1, 0], [0, 0, 1, 1, d45]], dtype=np.float64)
        result = box2dr_crop(cloud, boxes)
        abs_cloud = np.abs(cloud)
        exp1 = np.where(np.all(abs_cloud < 0.5, axis=1))[0]
        exp2 = np.where(abs_cloud[:, 0] + abs_cloud[:, 1] < sq2 / 2)[0]
        assert len(result) == 2
        assert np.array_equal(result[0], exp1)
        assert np.array_equal(result[1], exp2)

    def test_box3dp_crop(self, rng):
        cloud = rng.random((200, 3)) * 4 - 2
        boxes = np.array([[0, 0, 0, 2, 2, 2, 0.0]])
        mask = box3dp_crop(cloud, boxes, project_axis=2)
        expected = np.all(np.abs(cloud) < 1, axis=1)
        assert np.array_equal(mask[0], expected)

    def test_seg1d(self):
        s1 = np.array([[0.0, 2.0]])
        s2 = np.array([[1.0, 2.0]])
        assert abs(seg1d_iou(s1, s2)[0] - 1 / 3) < 1e-9
        pts = np.array([0.0, 0.5, 2.0])
        d = seg1d_pdist(pts, np.tile(s1, (3, 1)))
        assert np.allclose(d, [1.0, 0.5, -1.0])

    def test_box2dr_pdist_signs(self):
        boxes = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
        pts = np.array([[0.0, 0.0], [0.9, 0.0], [1.5, 0.0]])
        d = box2dr_pdist(pts, boxes)
        assert d.shape == (1, 3)
        assert abs(d[0, 0] - 1.0) < 1e-9
        assert abs(d[0, 1] - 0.1) < 1e-9
        assert abs(d[0, 2] + 0.5) < 1e-9

    def test_box3dr_pdist(self):
        boxes = np.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
        pts = np.array(
            [[0.0, 0.0, 0.0], [0.0, 0.0, 0.9], [0.0, 0.0, 1.5], [1.5, 0.0, 1.5]]
        )
        d = box3dr_pdist(pts, boxes)
        assert abs(d[0, 0] - 1.0) < 1e-9
        assert abs(d[0, 1] - 0.1) < 1e-9
        assert abs(d[0, 2] + 0.5) < 1e-9
        assert abs(d[0, 3] + np.hypot(0.5, 0.5)) < 1e-9


class TestNMSProperties:
    @pytest.mark.parametrize("seed", [2, 9])
    def test_keep_set_is_maximal_independent(self, seed):
        """Greedy-NMS invariants on random inputs: (a) every kept pair
        overlaps below the threshold; (b) every suppressed box overlaps
        SOME kept box with a higher score at/above the threshold."""
        rng = np.random.default_rng(seed)
        n, thr = 96, 0.3
        boxes = np.stack([
            rng.random(n) * 30, rng.random(n) * 30,
            rng.random(n) * 5 + 1, rng.random(n) * 5 + 1,
            rng.random(n) * 6 - 3], axis=1).astype(np.float32)
        scores = rng.random(n).astype(np.float32)
        keep = np.asarray(box2d_nms(boxes, scores, iou_method="rbox",
                                    iou_threshold=thr))  # KEEP mask
        supp = ~keep
        iou = np.asarray(box2d_iou(boxes, boxes, method="rbox"))
        kidx = np.nonzero(keep)[0]
        off = iou[np.ix_(kidx, kidx)].copy()
        np.fill_diagonal(off, 0.0)
        assert off.max() <= thr + 1e-6                       # (a)
        for j in np.nonzero(supp)[0]:                        # (b)
            cover = kidx[(iou[j, kidx] > thr)
                         & (scores[kidx] >= scores[j])]
            assert len(cover) > 0, j
