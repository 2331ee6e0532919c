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


class TestPerObjectAugment:
    def _scene(self, rng, m=4, per=40, pad=2):
        """Well-separated boxes on a line, points inside + background."""
        from d3d_tpu.augment import perobject_augment  # noqa: F401

        boxes = np.zeros((m + pad, 7), np.float32)
        for i in range(m):
            boxes[i] = [i * 15.0 - 20, (i % 2) * 10 - 5, -0.5,
                        4.0, 2.0, 1.6, rng.uniform(-np.pi, np.pi)]
        mask = np.zeros(m + pad, bool)
        mask[:m] = True
        pts = [rng.uniform(-60, 60, (200, 3)).astype(np.float32) + [0, 30, 0]]
        locals_ = []
        for b in boxes[:m]:
            c, s = np.cos(b[6]), np.sin(b[6])
            local = rng.uniform(-0.45, 0.45, (per, 3)).astype(np.float32) \
                * b[3:6]
            world = local.copy()
            world[:, 0] = c * local[:, 0] - s * local[:, 1] + b[0]
            world[:, 1] = s * local[:, 0] + c * local[:, 1] + b[1]
            world[:, 2] = local[:, 2] + b[2]
            pts.append(world)
            locals_.append(local)
        pts = np.concatenate(pts)
        feats = rng.uniform(0, 1, (len(pts), 1)).astype(np.float32)
        return (np.concatenate([pts, feats], axis=1), boxes, mask,
                np.concatenate(locals_))

    def test_rigid_membership(self, rng):
        from d3d_tpu.augment import perobject_augment

        pts, boxes, mask, local = self._scene(rng)
        key = jax.random.PRNGKey(3)
        p2, b2 = perobject_augment(key, jnp.asarray(pts),
                                   jnp.asarray(boxes), jnp.asarray(mask))
        p2, b2 = np.asarray(p2), np.asarray(b2)
        # interior points stay at the SAME box-frame coordinates of the
        # (possibly moved) final box
        n_bg = 200
        per = 40
        for i in range(4):
            seg = slice(n_bg + i * per, n_bg + (i + 1) * per)
            b = b2[i]
            c, s = np.cos(b[6]), np.sin(b[6])
            rel = p2[seg, :3] - b[:3]
            lx = c * rel[:, 0] + s * rel[:, 1]
            ly = -s * rel[:, 0] + c * rel[:, 1]
            got = np.stack([lx, ly, rel[:, 2]], axis=1)
            np.testing.assert_allclose(got, local[i * per:(i + 1) * per],
                                       atol=2e-4, err_msg=str(i))
        # background untouched, features untouched
        np.testing.assert_array_equal(p2[:n_bg], pts[:n_bg])
        np.testing.assert_array_equal(p2[:, 3], pts[:, 3])

    def test_boxes_stay_disjoint_and_padding_fixed(self, rng):
        from d3d_tpu.augment import perobject_augment
        from d3d_tpu.ops.box import box2d_iou

        pts, boxes, mask, _ = self._scene(rng)
        for seed in range(4):
            _, b2 = perobject_augment(jax.random.PRNGKey(seed),
                                      jnp.asarray(pts), jnp.asarray(boxes),
                                      jnp.asarray(mask))
            b2 = np.asarray(b2)
            bev = np.concatenate([b2[:4, 0:2], b2[:4, 3:5], b2[:4, 6:7]],
                                 axis=1)
            iou = np.array(box2d_iou(bev, bev, method="rbox"))
            np.fill_diagonal(iou, 0)
            assert iou.max() <= 1e-6, seed
            np.testing.assert_array_equal(b2[4:], boxes[4:])  # padding rows

    def test_zero_noise_identity(self, rng):
        from d3d_tpu.augment import perobject_augment

        pts, boxes, mask, _ = self._scene(rng)
        p2, b2 = perobject_augment(jax.random.PRNGKey(0), jnp.asarray(pts),
                                   jnp.asarray(boxes), jnp.asarray(mask),
                                   rot_range=0.0,
                                   translate_std=(0.0, 0.0, 0.0))
        np.testing.assert_allclose(np.asarray(p2), pts, atol=1e-6)
        np.testing.assert_allclose(np.asarray(b2), boxes, atol=1e-6)

    def test_something_moves(self, rng):
        from d3d_tpu.augment import perobject_augment

        pts, boxes, mask, _ = self._scene(rng)
        _, b2 = perobject_augment(jax.random.PRNGKey(1), jnp.asarray(pts),
                                  jnp.asarray(boxes), jnp.asarray(mask))
        assert np.abs(np.asarray(b2)[:4] - boxes[:4]).max() > 1e-3


class TestCBGS:
    def test_balances_rare_class(self):
        from d3d_tpu.augment import class_balanced_frame_indices

        rng = np.random.default_rng(0)
        # 90 frames with class 1 only, 10 with class 2 (rare), 5 empty
        frames = [[1]] * 90 + [[2]] * 10 + [[]] * 5
        idx = class_balanced_frame_indices(frames, rng)
        assert len(idx) == 2 * 53  # ceil(105 / 2) per group
        picked = [frames[i] for i in idx]
        n1 = sum(1 for c in picked if c == [1])
        n2 = sum(1 for c in picked if c == [2])
        assert n1 == n2 == 53       # even split despite 9:1 imbalance
        assert all(frames[i] != [] for i in idx)  # empties excluded

    def test_multiclass_frames_count_everywhere(self):
        from d3d_tpu.augment import class_balanced_frame_indices

        rng = np.random.default_rng(1)
        frames = [[1, 2], [1], [2]]
        idx = class_balanced_frame_indices(frames, rng,
                                           samples_per_class=8,
                                           shuffle=False)
        assert len(idx) == 16
        # first 8 draws come from class-1's pool {0, 1}
        assert set(idx[:8]) <= {0, 1} and set(idx[8:]) <= {0, 2}

    def test_empty(self):
        from d3d_tpu.augment import class_balanced_frame_indices

        assert len(class_balanced_frame_indices(
            [[], []], np.random.default_rng(0))) == 0
