"""Flagship model tests: pillarization shapes, forward pass, anchor
assignment, loss gradients, one training step on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from d3d_tpu.models import (PointPillars, PointPillarsConfig, assign_targets,
                            decode_boxes, detection_loss, make_anchors,
                            make_train_step, pillarize)
from d3d_tpu.models.pointpillars import encode_boxes
from d3d_tpu.parallel import make_mesh, shard_train_step

TINY = PointPillarsConfig(
    bounds=(0.0, 16.0, -8.0, 8.0, -3.0, 1.0),
    grid=(32, 32),
    max_pillars=256,
    max_points_per_pillar=16,
    pfn_features=32,
    backbone_channels=(32, 64),
    backbone_blocks=(1, 1),
    upsample_channels=32,
)


def _cloud(rng, n=2048):
    pts = np.stack([
        rng.random(n) * 16,
        rng.random(n) * 16 - 8,
        rng.random(n) * 4 - 3,
        rng.random(n),
    ], axis=1).astype(np.float32)
    return pts


def _gt(rng, m=3):
    boxes = np.stack([
        rng.random(m) * 12 + 2,
        rng.random(m) * 12 - 6,
        np.full(m, -1.0),
        np.full(m, 3.9),
        np.full(m, 1.6),
        np.full(m, 1.56),
        rng.random(m) * np.pi - np.pi / 2,
    ], axis=1).astype(np.float32)
    return boxes


class TestPillarize:
    def test_shapes_and_masks(self, rng):
        pts = _cloud(rng)
        feats, coords, valid = pillarize(jnp.asarray(pts), TINY)
        assert feats.shape == (256, 16, 9)
        assert coords.shape == (256, 2)
        assert valid.shape == (256,)
        nv = int(valid.sum())
        assert 0 < nv <= 256
        c = np.asarray(coords)[:nv]
        assert np.all((c >= 0) & (c < 32))
        # decoration sanity: offsets from centroid are zero-mean over points
        f = np.asarray(feats)[:nv]
        filled = np.abs(f).sum(axis=2) > 0
        assert np.all(np.abs((f[..., 4:7] * filled[..., None]).sum(axis=1))
                      < 1e-2)


class TestForward:
    def test_init_and_apply(self, rng):
        pts = jnp.asarray(np.stack([_cloud(rng), _cloud(rng)]))
        feats, coords, valid = jax.vmap(lambda p: pillarize(p, TINY))(pts)
        model = PointPillars(TINY)
        variables = model.init(jax.random.PRNGKey(0), feats, coords, valid)
        cls_logits, box_preds, dir_logits = model.apply(
            variables, feats, coords, valid)
        n_anchors = 32 * 32 * TINY.num_anchors_per_cell
        assert cls_logits.shape == (2, n_anchors, 1)
        assert box_preds.shape == (2, n_anchors, 7)
        assert dir_logits.shape == (2, n_anchors, 2)
        assert np.all(np.isfinite(np.asarray(cls_logits)))


class TestTargets:
    def test_encode_decode_roundtrip(self, rng):
        anchors = make_anchors(TINY)
        gt = jnp.asarray(_gt(rng, anchors.shape[0] // 64)[: anchors.shape[0]])
        a = anchors[: gt.shape[0]]
        dec = decode_boxes(a, encode_boxes(a, gt))
        assert np.allclose(np.asarray(dec[:, :6]), np.asarray(gt[:, :6]),
                           atol=1e-4)
        # yaw recovered up to sin ambiguity
        assert np.allclose(np.sin(np.asarray(dec[:, 6]) - np.asarray(a[:, 6])),
                           np.sin(np.asarray(gt[:, 6]) - np.asarray(a[:, 6])),
                           atol=1e-4)

    def test_assignment(self, rng):
        anchors = make_anchors(TINY)
        gt = jnp.asarray(_gt(rng))
        labels = jnp.zeros(3, jnp.int32)
        mask = jnp.ones(3, bool)
        t = assign_targets(anchors, gt, labels, mask, 0.6, 0.45)
        # every gt is force-matched to at least one anchor
        assert int(t["pos"].sum()) >= 3
        assert not bool(jnp.any(t["pos"] & t["neg"]))
        # padded gt is ignored
        mask0 = jnp.zeros(3, bool)
        t0 = assign_targets(anchors, gt, labels, mask0, 0.6, 0.45)
        assert int(t0["pos"].sum()) == 0


class TestTraining:
    def _batch(self, rng, b=2):
        pts = jnp.asarray(np.stack([_cloud(rng) for _ in range(b)]))
        feats, coords, valid = jax.vmap(lambda p: pillarize(p, TINY))(pts)
        gt = np.stack([_gt(rng) for _ in range(b)])
        return dict(
            features=feats, coords=coords, valid=valid,
            gt_boxes=jnp.asarray(gt),
            gt_labels=jnp.zeros((b, 3), jnp.int32),
            gt_mask=jnp.ones((b, 3), bool),
        )

    def test_loss_and_grad(self, rng):
        batch = self._batch(rng)
        model = PointPillars(TINY)
        variables = model.init(jax.random.PRNGKey(0), batch["features"],
                               batch["coords"], batch["valid"])
        anchors = make_anchors(TINY)

        def loss_fn(params):
            out = model.apply({"params": params,
                               "batch_stats": variables["batch_stats"]},
                              batch["features"], batch["coords"],
                              batch["valid"])
            targets = jax.vmap(lambda b_, l, m: assign_targets(
                anchors, b_, l, m))(batch["gt_boxes"], batch["gt_labels"],
                                    batch["gt_mask"])
            loss, aux = detection_loss(out, targets, TINY, anchors,
                                       riou_weight=0.1)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        assert np.isfinite(float(loss)) and float(loss) > 0
        flat = jax.tree.leaves(jax.tree.map(
            lambda g: jnp.sum(jnp.abs(g)), grads))
        assert all(np.isfinite(float(g)) for g in flat)
        assert sum(float(g) for g in flat) > 0

    def test_sharded_train_step(self, rng):
        """One real training step on the 8-device CPU mesh with dp x tp
        shardings — the multi-chip path the driver dry-runs."""
        batch = self._batch(rng, b=4)
        model = PointPillars(TINY)
        variables = model.init(jax.random.PRNGKey(0), batch["features"],
                               batch["coords"], batch["valid"])
        anchors = make_anchors(TINY)
        opt = optax.adam(1e-3)
        opt_state = opt.init(variables["params"])
        step = make_train_step(model, opt, TINY, anchors, riou_weight=0.1)
        mesh = make_mesh(8)  # 4 dp x 2 tp on the virtual CPU devices
        sharded = shard_train_step(step, mesh, donate=False)
        params, bs, opt_state, aux = sharded(
            variables["params"], variables["batch_stats"], opt_state, batch)
        assert np.isfinite(float(aux["total"]))
        # params actually changed
        delta = jax.tree.leaves(jax.tree.map(
            lambda a, b_: float(jnp.max(jnp.abs(a - b_))),
            params, variables["params"]))
        assert max(delta) > 0


class TestBfloat16:
    def test_forward_bf16(self, rng):
        """The network runs in bfloat16 (the MXU-native dtype) end-to-end,
        returning finite f32 head outputs."""
        from dataclasses import replace
        cfg = replace(TINY, dtype="bfloat16")
        pts = jnp.asarray(np.stack([_cloud(rng)]))
        feats, coords, valid = jax.vmap(lambda p: pillarize(p, cfg))(pts)
        model = PointPillars(cfg)
        variables = model.init(jax.random.PRNGKey(0), feats, coords, valid)
        cls_logits, box_preds, dir_logits = model.apply(
            variables, feats, coords, valid)
        assert cls_logits.dtype == jnp.float32
        for out in (cls_logits, box_preds, dir_logits):
            assert np.all(np.isfinite(np.asarray(out)))


class TestExternalTargets:
    def test_external_targets_match_in_step(self, rng):
        """prepare_targets + external_targets=True must produce the exact
        same loss and updates as in-step assignment."""
        from d3d_tpu.models.pointpillars import prepare_targets

        batch = TestTraining._batch(self, rng, b=2)
        model = PointPillars(TINY)
        variables = model.init(jax.random.PRNGKey(0), batch["features"],
                               batch["coords"], batch["valid"])
        anchors = make_anchors(TINY)
        opt = optax.adam(1e-3)
        opt_state = opt.init(variables["params"])
        s_in = jax.jit(make_train_step(model, opt, TINY, anchors))
        s_ext = jax.jit(make_train_step(model, opt, TINY, anchors,
                                        external_targets=True))
        prepped = prepare_targets(jnp.asarray(anchors), batch,
                                  TINY.pos_iou, TINY.neg_iou)
        p1, _, _, a1 = s_in(variables["params"], variables["batch_stats"],
                            opt_state, batch)
        p2, _, _, a2 = s_ext(variables["params"], variables["batch_stats"],
                             opt_state, prepped)
        # separate jits fuse differently -> equality only to fp tolerance
        assert np.isclose(float(a1["total"]), float(a2["total"]),
                          rtol=1e-6), (a1["total"], a2["total"])
        for l1, l2 in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                       rtol=1e-5, atol=1e-7)

    def test_dense_targets_match_in_step(self, rng):
        """The all-f32 dense target path must compute the same loss."""
        from d3d_tpu.models.pointpillars import prepare_targets

        batch = TestTraining._batch(self, rng, b=2)
        model = PointPillars(TINY)
        variables = model.init(jax.random.PRNGKey(0), batch["features"],
                               batch["coords"], batch["valid"])
        anchors = make_anchors(TINY)
        opt = optax.adam(1e-3)
        opt_state = opt.init(variables["params"])
        s_in = jax.jit(make_train_step(model, opt, TINY, anchors))
        s_ext = jax.jit(make_train_step(model, opt, TINY, anchors,
                                        external_targets=True))
        prepped = prepare_targets(jnp.asarray(anchors), batch,
                                  TINY.pos_iou, TINY.neg_iou,
                                  num_classes=TINY.num_classes, dense=True)
        _, _, _, a1 = s_in(variables["params"], variables["batch_stats"],
                           opt_state, batch)
        _, _, _, a2 = s_ext(variables["params"], variables["batch_stats"],
                            opt_state, prepped)
        assert np.isclose(float(a1["total"]), float(a2["total"]),
                          rtol=1e-6), (a1["total"], a2["total"])


class TestMultiClass:
    """Three classes with per-class anchors — exercises the class-indexed
    paths (anchor grid, per-class assignment, focal one-hot, decode) the
    single-class tests leave untouched."""

    CFG = PointPillarsConfig(
        bounds=(0.0, 16.0, -8.0, 8.0, -3.0, 1.0), grid=(32, 32),
        max_pillars=256, max_points_per_pillar=16, pfn_features=32,
        backbone_channels=(32, 64), backbone_blocks=(1, 1),
        upsample_channels=32, num_classes=3,
        anchor_sizes=((3.9, 1.6, 1.56), (0.8, 0.6, 1.73), (1.76, 0.6, 1.73)))

    def test_forward_and_train(self, rng):
        cfg = self.CFG
        pts = jnp.asarray(np.stack([_cloud(rng) for _ in range(2)]))
        feats, coords, valid = jax.vmap(lambda p: pillarize(p, cfg))(pts)
        gt = np.stack([_gt(rng) for _ in range(2)])
        batch = dict(features=feats, coords=coords, valid=valid,
                     gt_boxes=jnp.asarray(gt),
                     gt_labels=jnp.asarray(
                         np.tile([0, 1, 2], (2, 1)), jnp.int32),
                     gt_mask=jnp.ones((2, 3), bool))
        model = PointPillars(cfg)
        variables = model.init(jax.random.PRNGKey(0), feats, coords, valid)
        cls_logits, box_preds, dir_logits = model.apply(
            variables, feats, coords, valid)
        a = cfg.num_anchors_per_cell
        assert a == 6  # 3 sizes x 2 rotations
        assert cls_logits.shape == (2, 32 * 32 * a, 3)
        anchors = make_anchors(cfg)
        assert anchors.shape == (32 * 32 * a, 7)

        opt = optax.adam(1e-3)
        step = jax.jit(make_train_step(model, opt, cfg, anchors))
        params, bs = variables["params"], variables["batch_stats"]
        opt_state = opt.init(params)
        losses = []
        for _ in range(4):
            params, bs, opt_state, aux = step(params, bs, opt_state, batch)
            losses.append(float(aux["total"]))
        assert all(np.isfinite(losses)) and losses[-1] < losses[0]

    def test_per_class_assignment(self, rng):
        """Each gt matches only anchors of its own class."""
        from d3d_tpu.models.pointpillars import assign_targets

        cfg = self.CFG
        anchors = make_anchors(cfg)
        gt = jnp.asarray(_gt(rng))
        labels = jnp.asarray([0, 1, 2], jnp.int32)
        mask = jnp.ones(3, bool)
        t = assign_targets(anchors, gt, labels, mask, 0.6, 0.45)
        pos = np.asarray(t["pos"])
        cls_t = np.asarray(t["cls_target"])
        assert pos.sum() >= 3
        assert set(np.unique(cls_t[pos])) <= {0, 1, 2}

    def test_multiclass_detector_inference(self, rng):
        from d3d_tpu.dataset.kitti.utils import KittiObjectClass
        from d3d_tpu.models import make_pointpillars_detector

        cfg = self.CFG
        classes = (KittiObjectClass.Car, KittiObjectClass.Pedestrian,
                   KittiObjectClass.Cyclist)
        pts = _cloud(rng)
        model = PointPillars(cfg)
        f, c, v = pillarize(jnp.asarray(pts), cfg)
        var = model.init(jax.random.PRNGKey(0), f[None], c[None], v[None])
        det = make_pointpillars_detector(
            model, var, cfg, make_anchors(cfg), classes,
            score_threshold=0.0, top_k=16)
        out = det(pts)
        assert len(out) <= 16
        seen = {obj.tag_top for obj in out}
        assert seen <= set(classes)


class TestPresets:
    def test_presets_construct_and_are_hashable(self):
        from d3d_tpu.models import presets

        for fn in (presets.pointpillars_kitti,
                   presets.pointpillars_kitti_3class,
                   presets.centerpoint_nuscenes, presets.centerpoint_waymo,
                   presets.sst_kitti, presets.second_kitti,
                   presets.voxelnext_nuscenes, presets.mono3d_kitti,
                   presets.bevseg_semantickitti):
            cfg = fn()
            hash(cfg)  # jit-static usable
            assert cfg.dtype == "bfloat16"
            cfg32 = fn(dtype="float32")
            assert cfg32.dtype == "float32"
        assert presets.pointpillars_kitti_3class().num_anchors_per_cell == 6

    def test_preset_anchor_grid(self):
        from d3d_tpu.models import presets

        anchors = make_anchors(presets.pointpillars_kitti(dtype="float32"))
        assert anchors.shape == (432 * 496 * 2, 7)
        assert np.isfinite(np.asarray(anchors)).all()


class TestForceMatchGuards:
    def test_padded_and_out_of_range_gt_do_not_pollute(self, rng):
        """Padded gts (mask False) and valid gts with zero anchor overlap
        must not force-match anchor 0 (round-2 review finding)."""
        anchors = make_anchors(TINY)
        # one in-range gt + one far outside the grid + padding
        gt = jnp.asarray([
            [8.0, 0.0, -1.0, 3.9, 1.6, 1.56, 0.0],
            [500.0, 500.0, -1.0, 3.9, 1.6, 1.56, 0.0],
            [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        ], jnp.float32)
        labels = jnp.zeros(3, jnp.int32)
        mask = jnp.asarray([True, True, False])
        t = assign_targets(anchors, gt, labels, mask, 0.6, 0.45)
        pos = np.asarray(t["pos"])
        best_gt = np.asarray(t["cls_target"])
        # anchor 0 (grid corner, far from the only real gt) must not be
        # positive
        assert not pos[0]
        # the real gt still force-matched somewhere
        assert pos.sum() >= 1
        # no positive anchor points at the out-of-range or padded gt:
        # every positive anchor's reg target must decode near the real gt
        from d3d_tpu.models.pointpillars import decode_boxes
        dec = np.asarray(decode_boxes(anchors[pos],
                                      t["reg_target"][pos]))
        assert np.all(np.abs(dec[:, 0] - 8.0) < 2.0)


def test_remat_step_matches_plain(rng):
    """jax.checkpoint remat changes memory, not math: one train step must
    produce the same loss and parameters as the plain step."""
    batch = TestTraining._batch(None, rng, b=2)
    model = PointPillars(TINY)
    variables = model.init(jax.random.PRNGKey(0), batch["features"],
                           batch["coords"], batch["valid"])
    anchors = make_anchors(TINY)
    opt = optax.adam(1e-3)
    opt_state = opt.init(variables["params"])
    plain = jax.jit(make_train_step(model, opt, TINY, anchors))
    remat = jax.jit(make_train_step(model, opt, TINY, anchors, remat=True))
    p1, _, _, a1 = plain(variables["params"], variables["batch_stats"],
                         opt_state, batch)
    p2, _, _, a2 = remat(variables["params"], variables["batch_stats"],
                         opt_state, batch)
    assert np.isclose(float(a1["total"]), float(a2["total"]), rtol=1e-6)
    # gradients recompute with different fusion under remat; adam's
    # 1/sqrt(v) normalization amplifies the f32 difference for
    # near-zero-gradient params — compare updates loosely
    for l1, l2 in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=0.05, atol=1e-3)


class TestBatchNormFold:
    def test_fold_preserves_inference(self, rng):
        """fold_batchnorm must leave train=False outputs unchanged (up to
        float rounding) while making every BN denominator exactly 1 and
        rescaling the kernels."""
        from d3d_tpu.models.fold import fold_batchnorm

        model = PointPillars(TINY)
        pts = jnp.asarray(_cloud(rng))
        feats, coords, valid = pillarize(pts, TINY)
        variables = model.init(jax.random.PRNGKey(0), feats[None],
                               coords[None], valid[None], train=False)
        # non-trivial running stats (fresh init has mean 0 / var 1)
        variables = jax.tree.map(lambda x: x, variables)
        variables["batch_stats"] = jax.tree.map(
            lambda x: x + jnp.asarray(
                np.abs(np.random.default_rng(1).normal(
                    0.3, 0.2, x.shape)), x.dtype),
            variables["batch_stats"])

        ref = model.apply(variables, feats[None], coords[None], valid[None],
                          train=False)
        folded = fold_batchnorm(variables, eps=1e-3)
        out = model.apply(folded, feats[None], coords[None], valid[None],
                          train=False)
        for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=2e-4)

        # every BN in the folded tree is a pure add: unit denominator
        # (var = 1 - eps) with the residual riding the negated mean
        def check(path, stats):
            for k, v in stats.items():
                if isinstance(v, dict):
                    check(path + (k,), v)
            if "mean" in stats:
                assert np.allclose(np.asarray(stats["var"]) + 1e-3, 1.0)

        check((), folded["batch_stats"])
        # kernels actually changed (the fold did something)
        k0 = variables["params"]["_ConvBlock_0"]["Conv_0"]["kernel"]
        k1 = folded["params"]["_ConvBlock_0"]["Conv_0"]["kernel"]
        assert not np.allclose(np.asarray(k0), np.asarray(k1))


class TestBatchNormFoldNoBias:
    def test_fold_biasless_bn(self, rng):
        """A BatchNorm without scale/bias params still folds exactly: the
        residual rides the negated running mean."""
        import flax.linen as nn
        from d3d_tpu.models.fold import fold_batchnorm

        class M(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                x = nn.Dense(8, use_bias=False)(x)
                x = nn.BatchNorm(use_running_average=not train,
                                 use_bias=False, use_scale=False,
                                 epsilon=1e-3)(x)
                return x

        m = M()
        x = jnp.asarray(rng.normal(0, 1, (4, 6)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        v = jax.tree.map(lambda a: a, v)
        v["batch_stats"] = jax.tree.map(
            lambda a: a + jnp.asarray(np.abs(np.random.default_rng(2)
                                             .normal(0.5, 0.2, a.shape)),
                                      a.dtype), v["batch_stats"])
        ref = m.apply(v, x)
        out = m.apply(fold_batchnorm(v, eps=1e-3), x)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   atol=1e-5, rtol=1e-5)


class TestScatterToBev:
    def test_matches_scatter_add_and_grads(self, rng):
        """The gather-formulated BEV densify must equal the plain
        scatter-add on unique coords, with exact gather-mirror grads."""
        from d3d_tpu.models.pointpillars import scatter_to_bev

        b, p, nf, w, h = 2, 64, 5, 8, 10
        cells = rng.choice(w * h, size=p, replace=False)
        coords = np.stack([cells // h, cells % h], 1).astype(np.int32)
        coords = np.broadcast_to(coords, (b, p, 2))
        pf = rng.normal(0, 1, (b, p, nf)).astype(np.float32)
        valid = np.ones((b, p), bool)
        valid[:, 50:] = False

        out = np.asarray(scatter_to_bev(
            jnp.asarray(pf), jnp.asarray(coords), jnp.asarray(valid),
            (w, h)))
        # oracle: dense scatter-add
        want = np.zeros((b, w, h, nf), np.float32)
        for bi in range(b):
            for pi in range(p):
                if valid[bi, pi]:
                    want[bi, coords[bi, pi, 0], coords[bi, pi, 1]] += \
                        pf[bi, pi]
        np.testing.assert_allclose(out, want, atol=1e-6)

        # gradient: d/dpf of a weighted sum == weight at the pillar's cell
        wts = rng.normal(0, 1, (b, w, h, nf)).astype(np.float32)

        def loss(x):
            return jnp.sum(scatter_to_bev(
                x, jnp.asarray(coords), jnp.asarray(valid), (w, h))
                * jnp.asarray(wts))

        g = np.asarray(jax.grad(loss)(jnp.asarray(pf)))
        for bi in range(b):
            for pi in range(p):
                expect = (wts[bi, coords[bi, pi, 0], coords[bi, pi, 1]]
                          if valid[bi, pi] else np.zeros(nf))
                np.testing.assert_allclose(g[bi, pi], expect, atol=1e-6)
