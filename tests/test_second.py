"""SECOND sparse-voxel detector: voxelization shapes, forward pass, train
step convergence, and the dp x tp sharded step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from d3d_tpu.models.second import (SECOND, SECONDConfig, head_config,
                                   make_train_step, second_voxelize)
from d3d_tpu.models.pointpillars import make_anchors

TINY = SECONDConfig(
    bounds=(0.0, 16.0, -8.0, 8.0, -3.0, 1.0),
    grid=(32, 32, 8),
    max_voxels=512,
    stage_channels=(8, 16, 32),
    stage_sites=(512, 256, 128),
    subm_per_stage=1,
    head_channels=16,
)


def _cloud(rng, n=2048):
    return np.stack([
        rng.random(n) * 16, rng.random(n) * 16 - 8,
        rng.random(n) * 4 - 3, rng.random(n)], axis=1).astype(np.float32)


def _gt(rng, m=3):
    return np.stack([
        rng.random(m) * 12 + 2, rng.random(m) * 12 - 6, np.full(m, -1.0),
        np.full(m, 3.9), np.full(m, 1.6), np.full(m, 1.56),
        rng.random(m) * np.pi - np.pi / 2], axis=1).astype(np.float32)


def _batch(rng, b=2):
    pts = jnp.asarray(np.stack([_cloud(rng) for _ in range(b)]))
    feats, coords, valid = jax.vmap(
        lambda p: second_voxelize(p, TINY))(pts)
    return dict(
        features=feats, coords=coords, valid=valid,
        gt_boxes=jnp.asarray(np.stack([_gt(rng) for _ in range(b)])),
        gt_labels=jnp.zeros((b, 3), jnp.int32),
        gt_mask=jnp.ones((b, 3), bool))


class TestVoxelize:
    def test_shapes(self, rng):
        feats, coords, valid = second_voxelize(jnp.asarray(_cloud(rng)),
                                               TINY)
        assert feats.shape == (512, 4)
        assert coords.shape == (512, 3)
        nv = int(valid.sum())
        assert 0 < nv <= 512
        c = np.asarray(coords)[:nv]
        assert np.all((c >= 0) & (c < [32, 32, 8]))
        # mean features stay inside the scene bounds
        f = np.asarray(feats)[:nv]
        assert np.all(f[:, 0] >= 0) and np.all(f[:, 0] <= 16)


class TestForward:
    def test_shapes_and_grad(self, rng):
        batch = _batch(rng)
        model = SECOND(TINY)
        variables = model.init(jax.random.PRNGKey(0), batch["features"],
                               batch["coords"], batch["valid"])
        cls_logits, box_preds, dir_logits = model.apply(
            variables, batch["features"], batch["coords"], batch["valid"])
        bev = TINY.bev_grid
        a = 2  # one size x two rotations
        n_anchors = bev[0] * bev[1] * a
        assert cls_logits.shape == (2, n_anchors, 1)
        assert box_preds.shape == (2, n_anchors, 7)
        assert dir_logits.shape == (2, n_anchors, 2)
        assert np.all(np.isfinite(np.asarray(cls_logits)))

        anchors = make_anchors(head_config(TINY))
        assert anchors.shape == (n_anchors, 7)


class TestTraining:
    def test_loss_decreases(self, rng):
        batch = _batch(rng)
        model = SECOND(TINY)
        variables = model.init(jax.random.PRNGKey(0), batch["features"],
                               batch["coords"], batch["valid"])
        anchors = make_anchors(head_config(TINY))
        opt = optax.adam(1e-3)
        opt_state = opt.init(variables["params"])
        step = jax.jit(make_train_step(model, opt, TINY, anchors,
                                       riou_weight=0.1))
        params, bs = variables["params"], variables["batch_stats"]
        losses = []
        for _ in range(5):
            params, bs, opt_state, aux = step(params, bs, opt_state, batch)
            losses.append(float(aux["total"]))
        assert all(np.isfinite(losses)), losses
        assert losses[-1] < losses[0], losses

    def test_sharded_train_step(self, rng):
        from d3d_tpu.parallel import make_mesh, shard_train_step

        batch = _batch(rng, b=4)
        model = SECOND(TINY)
        variables = model.init(jax.random.PRNGKey(0), batch["features"],
                               batch["coords"], batch["valid"])
        anchors = make_anchors(head_config(TINY))
        opt = optax.adam(1e-3)
        opt_state = opt.init(variables["params"])
        step = make_train_step(model, opt, TINY, anchors)
        mesh = make_mesh(8)
        sharded = shard_train_step(step, mesh, donate=False)
        params, _, _, aux = sharded(variables["params"],
                                    variables["batch_stats"], opt_state,
                                    batch)
        assert np.isfinite(float(aux["total"]))


class TestInference:
    def test_detector_end_to_end(self, rng):
        from d3d_tpu.dataset.kitti.utils import KittiObjectClass
        from d3d_tpu.models import make_second_detector

        pts = _cloud(rng)
        model = SECOND(TINY)
        f, c, v = second_voxelize(jnp.asarray(pts), TINY)
        var = model.init(jax.random.PRNGKey(0), f[None], c[None], v[None])
        det = make_second_detector(
            model, var, TINY, make_anchors(head_config(TINY)),
            (KittiObjectClass.Car,), score_threshold=0.0, top_k=16)
        out = det(pts, frame="velo", timestamp=3)
        assert out.frame == "velo" and out.timestamp == 3
        assert len(out) <= 16
        for obj in out:
            assert obj.tag_top == KittiObjectClass.Car
            assert np.all(np.isfinite(obj.position))


class TestOddGrid:
    def test_odd_dims_do_not_alias(self, rng):
        """Grid dims not divisible by the total stride: the per-stage ceil
        chain must match final_grid or densification aliases sites into
        wrong cells (round-2 review finding)."""
        cfg = SECONDConfig(
            bounds=(0.0, 16.5, -8.0, 8.5, -3.0, 1.2),
            grid=(33, 33, 7), max_voxels=256,
            stage_channels=(8, 16, 32), stage_sites=(256, 128, 64),
            subm_per_stage=1, head_channels=8)
        g = cfg.grid
        for _ in range(cfg.n_stages - 1):
            g = tuple(-(-x // 2) for x in g)
        assert cfg.final_grid == g  # (9, 9, 2)
        assert cfg.bev_grid == g[:2]

        pts = np.stack([
            rng.random(1024) * 16.5, rng.random(1024) * 16.5 - 8,
            rng.random(1024) * 4.2 - 3, rng.random(1024)],
            axis=1).astype(np.float32)
        feats, coords, valid = second_voxelize(jnp.asarray(pts), cfg)
        model = SECOND(cfg)
        variables = model.init(jax.random.PRNGKey(0), feats[None],
                               coords[None], valid[None])
        out = model.apply(variables, feats[None], coords[None], valid[None])
        a = 2
        assert out[0].shape == (1, g[0] * g[1] * a, 1)
        assert np.all(np.isfinite(np.asarray(out[0])))
