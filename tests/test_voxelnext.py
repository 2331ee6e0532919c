"""VoxelNeXt (fully-sparse) family: height-compression oracle, sparse
target assignment oracle (nearest-active-site positives), forward
contract, decode round-trip, overfit smoke, detector factory, and the
dp-sharded step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from d3d_tpu.models import (VoxelNeXt, VoxelNeXtConfig,
                            make_voxelnext_detector, voxelnext_voxelize)
from d3d_tpu.models.voxelnext import (assign_voxelnext_targets,
                                      compress_height, decode_voxelnext,
                                      make_train_step, voxelnext_loss)

TINY = VoxelNeXtConfig(
    bounds=(0.0, 16.0, -8.0, 8.0, -3.0, 1.0),
    grid=(32, 32, 8),
    max_voxels=512,
    stage_channels=(8, 16, 32),
    stage_sites=(512, 256, 128),
    subm_per_stage=1,
    bev_sites=128,
    head_channels=16,
    num_classes=2,
    top_k=16,
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


def _batch(rng, b=2, m=3):
    pts = np.stack([_cloud(rng) for _ in range(b)])
    feats, coords, valid = jax.vmap(
        lambda p: voxelnext_voxelize(p, TINY))(jnp.asarray(pts))
    gt = np.stack([_gt(rng, m) for _ in range(b)])
    return dict(features=feats, coords=coords, valid=valid,
                gt_boxes=jnp.asarray(gt),
                gt_labels=jnp.asarray(
                    rng.integers(0, 2, (b, m)), jnp.int32),
                gt_mask=jnp.ones((b, m), bool))


class TestCompressHeight:
    def test_matches_dict_oracle(self, rng):
        n, c = 96, 5
        grid = (16, 16)
        coords = rng.integers(0, 12, (n, 3)).astype(np.int32)
        feats = rng.normal(size=(n, c)).astype(np.float32)
        valid = rng.random(n) < 0.8
        bf, bxy, bv = compress_height(
            jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid),
            grid, 64)
        bf, bxy, bv = np.asarray(bf), np.asarray(bxy), np.asarray(bv)

        want = {}
        for i in range(n):
            if not valid[i]:
                continue
            want.setdefault((coords[i, 0], coords[i, 1]),
                            np.zeros(c, np.float64))
            want[(coords[i, 0], coords[i, 1])] += feats[i]
        assert bv.sum() == len(want)
        got = {tuple(bxy[j]): bf[j] for j in range(64) if bv[j]}
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=0, atol=1e-5)
        # padded rows zeroed
        assert np.all(bf[~bv] == 0)

    def test_overflow_drops_not_aliases(self, rng):
        coords = np.stack([np.arange(32), np.zeros(32), np.zeros(32)],
                          axis=1).astype(np.int32)
        feats = np.ones((32, 2), np.float32)
        bf, bxy, bv = compress_height(
            jnp.asarray(feats), jnp.asarray(coords),
            jnp.ones(32, bool), (40, 4), 16)
        assert np.asarray(bv).sum() == 16
        # every kept site has exactly its own single-voxel sum
        np.testing.assert_array_equal(np.asarray(bf)[np.asarray(bv)],
                                      np.ones((16, 2), np.float32))


class TestTargets:
    def test_nearest_active_site_oracle(self, rng):
        site_xy = rng.integers(0, 8, (24, 2)).astype(np.int32)
        site_valid = rng.random(24) < 0.8
        site_valid[:2] = True
        gt = _gt(rng, 4)
        labels = rng.integers(0, 2, 4).astype(np.int32)
        t = assign_voxelnext_targets(
            TINY, jnp.asarray(site_xy), jnp.asarray(site_valid),
            jnp.asarray(gt), jnp.asarray(labels), jnp.ones(4, bool))
        w, h = TINY.bev_grid
        vx, vy = TINY.bev_voxel
        for m in range(4):
            cx = (gt[m, 0] - TINY.bounds[0]) / vx
            cy = (gt[m, 1] - TINY.bounds[2]) / vy
            if not (0 <= cx < w and 0 <= cy < h):
                assert int(t["pos_site"][m]) == -1
                continue
            d2 = np.where(site_valid,
                          (site_xy[:, 0] - np.floor(cx)) ** 2
                          + (site_xy[:, 1] - np.floor(cy)) ** 2, np.inf)
            assert int(t["pos_site"][m]) == int(np.argmin(d2))
            # positive pinned to 1.0 at (site, class)
            assert float(t["heat"][int(np.argmin(d2)),
                                   labels[m]]) == 1.0
            # offset measured from the assigned site
            np.testing.assert_allclose(
                float(t["vec"][m, 0]),
                cx - site_xy[int(np.argmin(d2)), 0], atol=1e-5)
        # heat zero on invalid sites
        assert np.all(np.asarray(t["heat"])[~site_valid] == 0)

    def test_decode_roundtrip(self, rng):
        """A hand-built output at one site decodes to the exact box."""
        m2 = TINY.bev_sites
        site_xy = np.zeros((m2, 2), np.int32)
        site_xy[0] = [3, 5]
        heat = np.full((m2, 2), -10.0, np.float32)
        heat[0, 1] = 6.0
        reg = np.zeros((m2, 8), np.float32)
        box = [0.4, 0.6, -1.2, 3.9, 1.6, 1.56, 0.7]
        vx, vy = TINY.bev_voxel
        reg[0] = [(box[0] - TINY.bounds[0]) / vx - 3,
                  (box[1] - TINY.bounds[2]) / vy - 5,
                  box[2], np.log(box[3]), np.log(box[4]), np.log(box[5]),
                  np.sin(box[6]), np.cos(box[6])]
        out = dict(heatmap=jnp.asarray(heat), reg=jnp.asarray(reg),
                   site_xy=jnp.asarray(site_xy),
                   site_valid=jnp.ones(m2, bool))
        boxes, scores, labels = decode_voxelnext(TINY, out)
        assert int(labels[0]) == 1
        np.testing.assert_allclose(np.asarray(boxes)[0], box, atol=1e-5)
        assert float(scores[0]) == pytest.approx(
            1 / (1 + np.exp(-6.0)), abs=1e-6)


class TestModel:
    def test_forward_contract(self, rng):
        batch = _batch(rng, b=1)
        model = VoxelNeXt(TINY)
        var = model.init(jax.random.PRNGKey(0), batch["features"],
                         batch["coords"], batch["valid"])
        out = model.apply(var, batch["features"], batch["coords"],
                          batch["valid"], train=False)
        assert out["heatmap"].shape == (1, TINY.bev_sites, 2)
        assert out["reg"].shape == (1, TINY.bev_sites, 8)
        assert np.isfinite(np.asarray(out["heatmap"])).all()
        assert np.asarray(out["site_valid"]).sum() > 0

    def test_train_step_overfits_one_batch(self, rng):
        batch = _batch(rng)
        model = VoxelNeXt(TINY)
        var = model.init(jax.random.PRNGKey(0), batch["features"],
                         batch["coords"], batch["valid"])
        opt = optax.adam(3e-3)
        step = jax.jit(make_train_step(model, opt, TINY))
        params, bstats = var["params"], var["batch_stats"]
        opt_state = opt.init(params)
        first = None
        for i in range(12):
            params, bstats, opt_state, aux = step(params, bstats,
                                                  opt_state, batch)
            if first is None:
                first = float(aux["total"])
        last = float(aux["total"])
        assert np.isfinite(last)
        assert last < 0.6 * first, (first, last)

    def test_detector_factory(self, rng):
        batch = _batch(rng, b=1)
        model = VoxelNeXt(TINY)
        var = model.init(jax.random.PRNGKey(0), batch["features"],
                         batch["coords"], batch["valid"])
        from d3d_tpu.dataset.kitti.utils import KittiObjectClass

        detect = make_voxelnext_detector(
            model, var, TINY,
            [KittiObjectClass.Car, KittiObjectClass.Pedestrian],
            score_threshold=0.0)
        out = detect(_cloud(rng), frame="velo")
        assert out.frame == "velo"
        for obj in out:
            assert np.isfinite(obj.position).all()

    def test_velocity_variant_tracks(self, rng):
        """predict_velocity: train step consumes gt_velocity, the
        detector emits TrackingTarget3D, and the fused device tracking
        step accepts the 5-output device_fn."""
        import dataclasses

        from d3d_tpu.abstraction import TrackingTarget3D
        from d3d_tpu.dataset.kitti.utils import KittiObjectClass
        from d3d_tpu.tracking.device_tracker import make_tracking_step

        cfg = dataclasses.replace(TINY, predict_velocity=True)
        batch = _batch(rng, b=1)
        batch["gt_velocity"] = jnp.asarray(
            rng.normal(0, 2, (1, 3, 2)), jnp.float32)
        model = VoxelNeXt(cfg)
        var = model.init(jax.random.PRNGKey(0), batch["features"],
                         batch["coords"], batch["valid"])
        assert var["params"]["head_reg"]["kernel"].shape[-1] == 10
        opt = optax.adam(1e-3)
        step = jax.jit(make_train_step(model, opt, cfg))
        params, bstats, opt_state, aux = step(
            var["params"], var["batch_stats"], opt.init(var["params"]),
            batch)
        assert np.isfinite(float(aux["total"]))

        detect = make_voxelnext_detector(
            model, dict(params=params, batch_stats=bstats), cfg,
            [KittiObjectClass.Car, KittiObjectClass.Pedestrian],
            score_threshold=0.0)
        pts = _cloud(rng)
        out = detect(pts, frame="velo")
        assert all(isinstance(o, TrackingTarget3D) for o in out)
        tstep = make_tracking_step(detect.device_fn,
                                   thresholds=[2.0, 2.0], capacity=32,
                                   score_threshold=0.0)
        state, _ = tstep(tstep.init(), jnp.asarray(pts), jnp.float32(0.0))
        assert int(np.asarray(state["active"]).sum()) >= 0

    def test_dp_sharded_step(self, rng):
        from d3d_tpu.parallel import make_mesh, shard_train_step

        mesh = make_mesh(8, dp=4, tp=2)
        batch = _batch(rng, b=4)
        model = VoxelNeXt(TINY)
        var = model.init(jax.random.PRNGKey(0), batch["features"],
                         batch["coords"], batch["valid"])
        opt = optax.adam(1e-3)
        step = shard_train_step(make_train_step(model, opt, TINY),
                                mesh, donate=False)
        params, bstats, opt_state, aux = step(
            var["params"], var["batch_stats"], opt.init(var["params"]),
            batch)
        assert np.isfinite(float(aux["total"]))

    def test_dp_sharded_inference(self, rng):
        """shard_inference batches the fully-sparse pipeline over dp."""
        from d3d_tpu.parallel import make_mesh
        from d3d_tpu.parallel.mesh import shard_inference
        from d3d_tpu.dataset.kitti.utils import KittiObjectClass

        batch = _batch(rng, b=1)
        model = VoxelNeXt(TINY)
        var = model.init(jax.random.PRNGKey(0), batch["features"],
                         batch["coords"], batch["valid"])
        detect = make_voxelnext_detector(
            model, var, TINY,
            [KittiObjectClass.Car, KittiObjectClass.Pedestrian])
        mesh = make_mesh(8, dp=8, tp=1)
        clouds = np.stack([_cloud(rng) for _ in range(8)])
        boxes, scores, labels, keep = shard_inference(detect.device_fn,
                                                      mesh)(clouds)
        assert boxes.shape == (8, TINY.top_k, 7)
        assert np.isfinite(np.asarray(scores)).all()
        # per-row outputs match the unsharded pipeline
        b0 = detect.device_fn(jnp.asarray(clouds[3]))
        np.testing.assert_allclose(np.asarray(boxes)[3],
                                   np.asarray(b0[0]), atol=1e-5)

    def test_bfloat16_forward(self, rng):
        """The preset default dtype: bf16 compute stays finite and the
        f32 decode contract holds."""
        import dataclasses

        cfg = dataclasses.replace(TINY, dtype="bfloat16")
        batch = _batch(rng, b=1)
        model = VoxelNeXt(cfg)
        var = model.init(jax.random.PRNGKey(0), batch["features"],
                         batch["coords"], batch["valid"])
        out = model.apply(var, batch["features"], batch["coords"],
                          batch["valid"], train=False)
        assert out["heatmap"].dtype == jnp.float32
        assert np.isfinite(np.asarray(out["heatmap"])).all()
        boxes, scores, labels = decode_voxelnext(
            cfg, jax.tree.map(lambda x: x[0], out))
        assert np.isfinite(np.asarray(boxes)).all()
