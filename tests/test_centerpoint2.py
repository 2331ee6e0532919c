"""Two-stage CenterPoint refinement: RoI-grid pooling geometry,
encode/apply residual inverse pair, target quality, refinement training
step, and the refined end-to-end detector."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from d3d_tpu.models.centerpoint import CenterPoint, CenterPointConfig
from d3d_tpu.models.centerpoint2 import (CenterPointRefine, RefineConfig,
                                         apply_refinements,
                                         encode_refinement_targets,
                                         make_refine_train_step,
                                         refine_loss, roi_grid_features)
from d3d_tpu.models import pillarize
from d3d_tpu.models.pointpillars import PointPillarsConfig

TINY = CenterPointConfig(
    bounds=(0.0, 16.0, -8.0, 8.0, -3.0, 1.0),
    grid=(32, 32), max_pillars=256, max_points_per_pillar=16,
    pfn_features=32, backbone_channels=(32, 64), backbone_blocks=(1, 1),
    upsample_channels=32, head_channels=16, window=9, top_k=8)
TINY_PILLARS = PointPillarsConfig(
    bounds=TINY.bounds, grid=TINY.grid, max_pillars=TINY.max_pillars,
    max_points_per_pillar=TINY.max_points_per_pillar,
    pfn_features=TINY.pfn_features)
RCFG = RefineConfig(grid_points=4, hidden=(32,))


def _boxes(rng, k=6):
    return jnp.asarray(np.stack([
        rng.random(k) * 12 + 2,
        rng.random(k) * 12 - 6,
        rng.random(k) * 2 - 2,
        rng.random(k) * 2 + 2.5,
        rng.random(k) * 1 + 1.2,
        np.full(k, 1.56),
        rng.random(k) * np.pi - np.pi / 2,
    ], axis=1).astype(np.float32))


class TestRoiGrid:
    def test_constant_map_pools_constant(self, rng):
        feat = jnp.full((32, 32, 5), 3.25, jnp.float32)
        pooled = roi_grid_features(feat, _boxes(rng), TINY.bounds,
                                   TINY.grid, RCFG.grid_points)
        assert pooled.shape == (6, RCFG.grid_points ** 2 * 5)
        np.testing.assert_allclose(np.asarray(pooled), 3.25, rtol=1e-5)

    def test_linear_ramp_recovers_grid_x(self, rng):
        """A feature that is linear in world x must pool to the grid
        points' exact world x (bilinear interpolation is exact on linear
        functions away from borders)."""
        w, h = TINY.grid
        vx = (TINY.bounds[1] - TINY.bounds[0]) / w
        xs = TINY.bounds[0] + (jnp.arange(w, dtype=jnp.float32) + 0.5) * vx
        feat = jnp.broadcast_to(xs[:, None, None], (w, h, 1))
        boxes = _boxes(rng)
        pooled = roi_grid_features(feat, boxes, TINY.bounds, TINY.grid,
                                   RCFG.grid_points)
        g = RCFG.grid_points
        u = np.linspace(-0.5, 0.5, g, dtype=np.float32)
        gu, gv = np.meshgrid(u, u, indexing="ij")
        b = np.asarray(boxes)
        want = (b[:, 0, None, None]
                + gu[None] * b[:, 3, None, None] * np.cos(b[:, 6])[:, None, None]
                - gv[None] * b[:, 4, None, None] * np.sin(b[:, 6])[:, None, None])
        np.testing.assert_allclose(np.asarray(pooled).reshape(-1, g, g),
                                   want, atol=1e-4)


class TestResiduals:
    def test_encode_apply_inverse(self, rng):
        """encode(rois, gt) then apply(rois, deltas) reconstructs gt
        (modulo the yaw pi-wrap)."""
        rois = _boxes(rng)
        gt = rois + jnp.asarray(
            np.random.default_rng(5).normal(scale=0.2, size=rois.shape)
            .astype(np.float32))
        t = encode_refinement_targets(RCFG, rois, gt, jnp.ones(6, bool))
        # force the intended 1:1 matching for the reconstruction check
        rec = apply_refinements(rois, t["deltas"])
        g = np.asarray(gt)
        r = np.asarray(rec)
        # every roi matched its perturbed self (perturbation << box size)
        np.testing.assert_allclose(r[:, :6], g[:, :6], atol=1e-5)
        dyaw = np.arctan2(np.sin(r[:, 6] - g[:, 6]),
                          np.cos(r[:, 6] - g[:, 6]))
        np.testing.assert_allclose(dyaw, 0, atol=1e-5)

    def test_conf_targets_track_iou(self, rng):
        rois = _boxes(rng)
        t_same = encode_refinement_targets(RCFG, rois, rois,
                                           jnp.ones(6, bool))
        np.testing.assert_allclose(np.asarray(t_same["conf"]), 1.0,
                                   atol=1e-5)
        assert bool(jnp.all(t_same["pos"]))
        far = rois.at[:, 0].add(100.0)
        t_far = encode_refinement_targets(RCFG, rois, far,
                                          jnp.ones(6, bool))
        np.testing.assert_allclose(np.asarray(t_far["conf"]), 0.0,
                                   atol=1e-6)
        assert not bool(jnp.any(t_far["pos"]))

    def test_masked_gt_never_matches(self, rng):
        rois = _boxes(rng)
        t = encode_refinement_targets(RCFG, rois, rois,
                                      jnp.zeros(6, bool))
        np.testing.assert_allclose(np.asarray(t["conf"]), 0.0, atol=1e-6)


def _batch(rng, b=2):
    pts = np.stack([np.stack([
        rng.random(1024) * 16, rng.random(1024) * 16 - 8,
        rng.random(1024) * 4 - 3, rng.random(1024)], axis=1)
        for _ in range(b)]).astype(np.float32)
    feats, coords, valid = jax.vmap(
        lambda p: pillarize(p, TINY_PILLARS))(jnp.asarray(pts))
    m = 3
    gt = np.stack([np.stack([
        rng.random(m) * 12 + 2, rng.random(m) * 12 - 6, np.full(m, -1.0),
        np.full(m, 3.9), np.full(m, 1.6), np.full(m, 1.56),
        rng.random(m) * np.pi - np.pi / 2], axis=1)
        for _ in range(b)]).astype(np.float32)
    return dict(features=feats, coords=coords, valid=valid,
                gt_boxes=jnp.asarray(gt),
                gt_labels=jnp.zeros((b, m), jnp.int32),
                gt_mask=jnp.ones((b, m), bool))


def test_refine_training_step_decreases_loss(rng):
    model = CenterPoint(TINY, return_feat=True)
    batch = _batch(rng)
    v1 = model.init(jax.random.PRNGKey(0), batch["features"],
                    batch["coords"], batch["valid"])
    refine = CenterPointRefine(RCFG)
    k = TINY.top_k
    c = TINY.upsample_channels * len(TINY.backbone_channels)
    pooled0 = jnp.zeros((2, k, RCFG.grid_points ** 2 * c))
    boxes0 = jnp.ones((2, k, 7))
    rparams = refine.init(jax.random.PRNGKey(1), pooled0, boxes0)["params"]

    opt = optax.adam(3e-3)
    step = make_refine_train_step(model, v1, refine, TINY, RCFG, opt)
    state = opt.init(rparams)
    first = None
    for i in range(8):
        rparams, state, aux = step(rparams, state, batch)
        if first is None:
            first = float(aux["total"])
    last = float(aux["total"])
    assert np.isfinite(last)
    assert last < first * 0.9, (first, last)


def test_refined_detector_end_to_end(rng):
    from d3d_tpu.dataset.kitti.utils import KittiObjectClass
    from d3d_tpu.models.inference import make_centerpoint_detector

    model = CenterPoint(TINY, return_feat=True)
    batch = _batch(rng, b=1)
    v1 = model.init(jax.random.PRNGKey(0), batch["features"],
                    batch["coords"], batch["valid"])
    refine = CenterPointRefine(RCFG)
    k = TINY.top_k
    c = TINY.upsample_channels * len(TINY.backbone_channels)
    rvars = refine.init(jax.random.PRNGKey(1),
                        jnp.zeros((k, RCFG.grid_points ** 2 * c)),
                        jnp.ones((k, 7)))

    pts = np.stack([rng.random(1024) * 16, rng.random(1024) * 16 - 8,
                    rng.random(1024) * 4 - 3, rng.random(1024)],
                   axis=1).astype(np.float32)
    plain = make_centerpoint_detector(model, v1, TINY, TINY_PILLARS,
                                      [KittiObjectClass.Car],
                                      score_threshold=0.0)
    refined = make_centerpoint_detector(model, v1, TINY, TINY_PILLARS,
                                        [KittiObjectClass.Car],
                                        score_threshold=0.0,
                                        refine=(refine, rvars, RCFG))
    out_p = plain(pts, frame="velo")
    out_r = refined(pts, frame="velo")
    for arr in (out_p, out_r):
        assert all(np.isfinite(np.asarray(o.position)).all() for o in arr)
    # fused score = s^(1-a) * sigmoid(conf)^a differs from the raw score
    if len(out_p) and len(out_r):
        sp = out_p[0].tag_top_score
        sr = out_r[0].tag_top_score
        assert 0 <= sr <= 1 and 0 <= sp <= 1
