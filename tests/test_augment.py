"""Augmentation: the joint point/box transform must preserve box-interior
membership (checked with the framework's own crop kernel), and GT sampling
must paste collision-free objects with their interior points."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from d3d_tpu.augment import (build_gt_database, global_augment,
                             sample_ground_truths)
from d3d_tpu.ops.box import box2d_iou, box3dp_crop


def _scene(rng, n=500, m=4):
    boxes = np.stack([
        rng.uniform(-20, 20, m), rng.uniform(-20, 20, m),
        rng.uniform(-1, 0, m), rng.uniform(3, 5, m),
        rng.uniform(1.5, 2, m), rng.uniform(1.4, 1.8, m),
        rng.uniform(-np.pi, np.pi, m)], axis=1).astype(np.float32)
    # half the points inside boxes, half background
    pts = [rng.uniform(-40, 40, (n // 2, 3)).astype(np.float32)]
    per = n // 2 // m
    for b in boxes:
        c, s = np.cos(b[6]), np.sin(b[6])
        local = rng.uniform(-0.45, 0.45, (per, 3)).astype(np.float32) \
            * b[3:6]
        world = local.copy()
        world[:, 0] = c * local[:, 0] - s * local[:, 1] + b[0]
        world[:, 1] = s * local[:, 0] + c * local[:, 1] + b[1]
        world[:, 2] = local[:, 2] + b[2]
        pts.append(world)
    pts = np.concatenate(pts)
    inten = rng.uniform(0, 1, (len(pts), 1)).astype(np.float32)
    return np.concatenate([pts, inten], 1), boxes


class TestGlobalAugment:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_membership_preserved(self, seed):
        """Points inside a GT box before the transform are inside the
        transformed box after — the rigid+scale consistency invariant."""
        rng = np.random.default_rng(seed)
        pts, boxes = _scene(rng)
        before = [set(np.where(np.asarray(c))[0].tolist())
                  for c in box3dp_crop(pts[:, :3], boxes)]
        p2, b2 = global_augment(jax.random.PRNGKey(seed),
                                jnp.asarray(pts), jnp.asarray(boxes))
        p2, b2 = np.asarray(p2), np.asarray(b2)
        after = [set(np.where(np.asarray(c))[0].tolist())
                 for c in box3dp_crop(p2[:, :3], b2)]
        for i in range(len(boxes)):
            # allow boundary jitter of a few points from fp rounding
            sym = before[i] ^ after[i]
            assert len(sym) <= max(2, len(before[i]) // 20), \
                (i, len(before[i]), len(after[i]))

    def test_features_untouched_and_shapes(self, rng):
        pts, boxes = _scene(rng)
        p2, b2 = global_augment(jax.random.PRNGKey(0), jnp.asarray(pts),
                                jnp.asarray(boxes))
        assert p2.shape == pts.shape and b2.shape == boxes.shape
        np.testing.assert_array_equal(np.asarray(p2[:, 3]), pts[:, 3])

    def test_deterministic_in_key(self, rng):
        pts, boxes = _scene(rng)
        a = global_augment(jax.random.PRNGKey(7), jnp.asarray(pts),
                           jnp.asarray(boxes))
        b = global_augment(jax.random.PRNGKey(7), jnp.asarray(pts),
                           jnp.asarray(boxes))
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        c = global_augment(jax.random.PRNGKey(8), jnp.asarray(pts),
                           jnp.asarray(boxes))
        assert not np.allclose(np.asarray(a[0]), np.asarray(c[0]))


class TestGTSampling:
    def test_database_and_paste(self, rng):
        pts, boxes = _scene(rng, n=600, m=4)
        labels = np.array([0, 0, 1, 1])
        db = build_gt_database([(pts, boxes, labels)], min_points=3)
        assert set(db.keys()) <= {0, 1}
        assert sum(len(v) for v in db.values()) >= 2

        # paste into a sparse target frame
        tgt_pts = rng.uniform(-40, 40, (200, 4)).astype(np.float32)
        tgt_boxes = boxes[:1]
        tgt_labels = labels[:1]
        out_pts, out_boxes, out_labels = sample_ground_truths(
            rng, db, tgt_pts, tgt_boxes, tgt_labels, max_per_class=3)
        assert len(out_boxes) >= len(tgt_boxes)
        assert len(out_pts) >= len(tgt_pts)
        assert len(out_labels) == len(out_boxes)
        # no pasted box overlaps another accepted/original box
        def bev(b):
            return np.concatenate([b[..., 0:2], b[..., 3:5], b[..., 6:7]],
                                  axis=-1)
        iou = np.array(box2d_iou(bev(out_boxes), bev(out_boxes),
                                 method="rbox"))
        np.fill_diagonal(iou, 0)
        # original boxes may overlap each other; new ones must not overlap
        # anything
        for i in range(len(tgt_boxes), len(out_boxes)):
            assert iou[i].max() <= 1e-5, (i, iou[i].max())
        # pasted points actually land inside their boxes (boolean mask rows)
        crops = np.asarray(box3dp_crop(out_pts[:, :3],
                                       out_boxes[len(tgt_boxes):]))
        for row in crops:
            assert int(row.sum()) >= 3
