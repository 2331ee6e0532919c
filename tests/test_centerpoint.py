"""CenterPoint head tests: gaussian target assignment, loss gradients,
peak decoding roundtrip, one training step."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from d3d_tpu.models.centerpoint import (CenterPoint, CenterPointConfig,
                                        assign_center_targets, center_loss,
                                        decode_centers, make_train_step)
from d3d_tpu.models import pillarize
from d3d_tpu.models.pointpillars import PointPillarsConfig

TINY = CenterPointConfig(
    bounds=(0.0, 16.0, -8.0, 8.0, -3.0, 1.0),
    grid=(32, 32),
    max_pillars=256,
    max_points_per_pillar=16,
    pfn_features=32,
    backbone_channels=(32, 64),
    backbone_blocks=(1, 1),
    upsample_channels=32,
    head_channels=16,
    window=9,
    top_k=8,
)
# pillarize-compatible config with the same grid/pillar geometry
TINY_PILLARS = PointPillarsConfig(
    bounds=TINY.bounds, grid=TINY.grid, max_pillars=TINY.max_pillars,
    max_points_per_pillar=TINY.max_points_per_pillar,
    pfn_features=TINY.pfn_features)


def _cloud(rng, n=2048):
    return np.stack([
        rng.random(n) * 16,
        rng.random(n) * 16 - 8,
        rng.random(n) * 4 - 3,
        rng.random(n),
    ], axis=1).astype(np.float32)


def _gt(rng, m=3):
    return np.stack([
        rng.random(m) * 12 + 2,
        rng.random(m) * 12 - 6,
        np.full(m, -1.0),
        np.full(m, 3.9),
        np.full(m, 1.6),
        np.full(m, 1.56),
        rng.random(m) * np.pi - np.pi / 2,
    ], axis=1).astype(np.float32)


class TestTargets:
    def test_gaussian_peaks(self, rng):
        gt = jnp.asarray(_gt(rng))
        t = assign_center_targets(TINY, gt, jnp.zeros(3, jnp.int32),
                                  jnp.ones(3, bool))
        hm = np.asarray(t["heatmap"])
        assert hm.shape == (32, 32, 1)
        assert hm.max() <= 1.0 + 1e-6
        vx, vy, _ = TINY.voxel_size
        for b in np.asarray(gt):
            ix = int((b[0] - TINY.bounds[0]) / vx)
            iy = int((b[1] - TINY.bounds[2]) / vy)
            assert hm[ix, iy, 0] >= 1.0 - 1e-6   # peak at the center cell
            assert t["mask"][ix, iy]
            # regression vector encodes the box
            v = np.asarray(t["vec"][ix, iy])
            assert np.allclose(v[2], b[2])
            assert np.allclose(np.exp(v[3:6]), b[3:6], rtol=1e-4)
            assert np.allclose(np.arctan2(v[6], v[7]), b[6], atol=1e-5)
        # gaussian decays away from peaks
        assert (hm > 0.99).sum() <= 3
        assert ((hm > 0) & (hm < 0.9)).sum() > 3

    def test_masked_gt_ignored(self, rng):
        gt = jnp.asarray(_gt(rng))
        t = assign_center_targets(TINY, gt, jnp.zeros(3, jnp.int32),
                                  jnp.zeros(3, bool))
        assert float(t["heatmap"].sum()) == 0
        assert not bool(t["mask"].any())


class TestDecode:
    def test_roundtrip_from_ideal_outputs(self, rng):
        gt = _gt(rng, 3)
        # well-separated boxes so peaks don't merge
        gt[:, 0] = [4.0, 8.0, 12.0]
        gt[:, 1] = [-4.0, 0.0, 4.0]
        t = assign_center_targets(TINY, jnp.asarray(gt),
                                  jnp.zeros(3, jnp.int32), jnp.ones(3, bool))
        # build ideal head outputs from the targets
        logit = jnp.log(jnp.clip(t["heatmap"], 1e-6, 1 - 1e-6) /
                        (1 - jnp.clip(t["heatmap"], 1e-6, 1 - 1e-6)))
        outputs = dict(heatmap=logit, reg=t["vec"][..., 0:2],
                       height=t["vec"][..., 2:3], dim=t["vec"][..., 3:6],
                       rot=t["vec"][..., 6:8])
        boxes, scores, labels = decode_centers(TINY, outputs)
        top = np.asarray(boxes[:3])
        got = top[np.lexsort((top[:, 1], top[:, 0]))]
        ref = gt[np.lexsort((gt[:, 1], gt[:, 0]))]
        vx = float(TINY.voxel_size[0])
        assert np.allclose(got[:, :2], ref[:, :2], atol=0.51 * vx)
        assert np.allclose(got[:, 2:6], ref[:, 2:6], atol=1e-3)
        assert np.allclose(np.sin(got[:, 6] - ref[:, 6]), 0, atol=1e-4)
        assert np.all(np.asarray(scores[:3]) > 0.9)
        assert np.all(np.asarray(scores[3:]) < 0.9)


class TestTraining:
    def test_loss_decreases(self, rng):
        b = 2
        pts = jnp.asarray(np.stack([_cloud(rng) for _ in range(b)]))
        feats, coords, valid = jax.vmap(
            lambda p: pillarize(p, TINY_PILLARS))(pts)
        batch = dict(
            features=feats, coords=coords, valid=valid,
            gt_boxes=jnp.asarray(np.stack([_gt(rng) for _ in range(b)])),
            gt_labels=jnp.zeros((b, 3), jnp.int32),
            gt_mask=jnp.ones((b, 3), bool),
        )
        model = CenterPoint(TINY)
        variables = model.init(jax.random.PRNGKey(0), feats, coords, valid)
        opt = optax.adam(1e-3)
        opt_state = opt.init(variables["params"])
        step = jax.jit(make_train_step(model, opt, TINY))
        params, bs = variables["params"], variables["batch_stats"]
        losses = []
        for _ in range(3):
            params, bs, opt_state, aux = step(params, bs, opt_state, batch)
            losses.append(float(aux["total"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]


class TestInference:
    def test_detectors_end_to_end(self, rng):
        """Both detector factories produce valid Target3DArrays from raw
        points through pillarize -> forward -> decode -> rotated NMS."""
        from d3d_tpu.models import PointPillars, make_anchors
        from d3d_tpu.models.inference import (make_centerpoint_detector,
                                              make_pointpillars_detector)
        from d3d_tpu.dataset.kitti.utils import KittiObjectClass
        from tests.test_model import TINY as PP_TINY

        pts = _cloud(rng)
        classes = (KittiObjectClass.Car,)

        pp = PointPillars(PP_TINY)
        f, c, v = pillarize(jnp.asarray(pts), PP_TINY)
        var_pp = pp.init(jax.random.PRNGKey(0), f[None], c[None], v[None])
        det_pp = make_pointpillars_detector(
            pp, var_pp, PP_TINY, make_anchors(PP_TINY), classes,
            score_threshold=0.0, top_k=16)
        out = det_pp(pts, frame="velo", timestamp=7)
        assert out.frame == "velo" and out.timestamp == 7
        assert len(out) <= 16
        for obj in out:
            assert obj.tag_top == KittiObjectClass.Car
            assert np.all(np.isfinite(obj.position))

        cp = CenterPoint(TINY)
        f, c, v = pillarize(jnp.asarray(pts), TINY_PILLARS)
        var_cp = cp.init(jax.random.PRNGKey(0), f[None], c[None], v[None])
        det_cp = make_centerpoint_detector(cp, var_cp, TINY, TINY_PILLARS,
                                           classes, score_threshold=0.0)
        out = det_cp(pts)
        assert len(out) <= TINY.top_k
        for obj in out:
            assert np.all(np.isfinite(obj.dimension))

    def test_sharded_train_step(self, rng):
        """CenterPoint training on the 8-device CPU mesh (dp x tp)."""
        from d3d_tpu.parallel import make_mesh, shard_train_step

        b = 4
        pts = jnp.asarray(np.stack([_cloud(rng) for _ in range(b)]))
        feats, coords, valid = jax.vmap(
            lambda p: pillarize(p, TINY_PILLARS))(pts)
        batch = dict(
            features=feats, coords=coords, valid=valid,
            gt_boxes=jnp.asarray(np.stack([_gt(rng) for _ in range(b)])),
            gt_labels=jnp.zeros((b, 3), jnp.int32),
            gt_mask=jnp.ones((b, 3), bool),
        )
        model = CenterPoint(TINY)
        variables = model.init(jax.random.PRNGKey(0), feats, coords, valid)
        opt = optax.adam(1e-3)
        opt_state = opt.init(variables["params"])
        step = make_train_step(model, opt, TINY)
        mesh = make_mesh(8)
        sharded = shard_train_step(step, mesh, donate=False)
        params, bs, opt_state, aux = sharded(
            variables["params"], variables["batch_stats"], opt_state, batch)
        assert np.isfinite(float(aux["total"]))
        delta = jax.tree.leaves(jax.tree.map(
            lambda a, b_: float(jnp.max(jnp.abs(a - b_))),
            params, variables["params"]))
        assert max(delta) > 0


def test_external_targets_match_in_step(rng):
    from d3d_tpu.models.centerpoint import (make_train_step,
                                            prepare_center_targets)
    b = 2
    pts = jnp.asarray(np.stack([_cloud(rng) for _ in range(b)]))
    feats, coords, valid = jax.vmap(
        lambda p: pillarize(p, TINY_PILLARS))(pts)
    batch = dict(
        features=feats, coords=coords, valid=valid,
        gt_boxes=jnp.asarray(np.stack([_gt(rng) for _ in range(b)])),
        gt_labels=jnp.zeros((b, 3), jnp.int32),
        gt_mask=jnp.ones((b, 3), bool),
    )
    model = CenterPoint(TINY)
    variables = model.init(jax.random.PRNGKey(0), batch["features"],
                           batch["coords"], batch["valid"])
    opt = optax.adam(1e-3)
    opt_state = opt.init(variables["params"])
    s_in = jax.jit(make_train_step(model, opt, TINY))
    s_ext = jax.jit(make_train_step(model, opt, TINY, external_targets=True))
    prepped = prepare_center_targets(TINY, batch)
    _, _, _, a1 = s_in(variables["params"], variables["batch_stats"],
                       opt_state, batch)
    _, _, _, a2 = s_ext(variables["params"], variables["batch_stats"],
                        opt_state, prepped)
    assert np.isclose(float(a1["total"]), float(a2["total"]), rtol=1e-6)


def test_multiclass_heads_and_targets(rng):
    """num_classes=3: per-class heatmap channels, class-indexed gaussian
    targets and decode."""
    from dataclasses import replace

    from d3d_tpu.models.centerpoint import (assign_center_targets,
                                            decode_centers)

    cfg = replace(TINY, num_classes=3)
    pts = _cloud(rng)
    feats, coords, valid = pillarize(jnp.asarray(pts), TINY_PILLARS)
    model = CenterPoint(cfg)
    variables = model.init(jax.random.PRNGKey(0), feats[None], coords[None],
                           valid[None])
    outputs = model.apply(variables, feats[None], coords[None], valid[None])
    assert np.asarray(outputs["heatmap"]).shape[-1] == 3

    gt = jnp.asarray(_gt(rng))
    labels = jnp.asarray([0, 1, 2], jnp.int32)
    targets = assign_center_targets(cfg, gt, labels, jnp.ones(3, bool))
    hm = np.asarray(targets["heatmap"])
    assert hm.shape[-1] == 3
    # each class channel has exactly one peak == 1
    for c in range(3):
        assert np.isclose(hm[..., c].max(), 1.0)

    out1 = jax.tree.map(lambda x: x[0], outputs)
    boxes, scores, labs = decode_centers(cfg, out1)
    assert set(np.unique(np.asarray(labs))) <= {0, 1, 2}


def test_gaussian_radius_property():
    """Translating a box by the radius must keep axis-aligned IoU >= the
    requested overlap (the quadratic-root denominators were wrong in
    round 2's first cut)."""
    from d3d_tpu.models.centerpoint import _gaussian_radius

    for (l, w) in [(24.0, 10.0), (6.0, 6.0), (40.0, 4.0)]:
        for o in (0.1, 0.3, 0.7):
            r = float(_gaussian_radius(l, w, o))
            assert r > 0
            # case-1 style displacement: both boxes translated apart by r
            inter = max(l - r, 0) * max(w - r, 0)
            union = 2 * l * w - inter
            assert inter / union >= o - 1e-6, (l, w, o, r)
