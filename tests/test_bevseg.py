"""BEV segmentation model family: shapes, gradients, end-to-end training to
a SegmentationEvaluator mIoU (closing the loop the verdict flagged as the
least-covered: aligned_scatter linear gather + SegmentationEvaluator), and
the dp x tp sharded train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from d3d_tpu.benchmarks import SegmentationEvaluator
from d3d_tpu.models.bevseg import (BEVSeg, BEVSegConfig, bevseg_pillarize,
                                   make_predictor, make_train_step,
                                   point_cell_coords, segmentation_loss)

TINY = BEVSegConfig(
    bounds=(0.0, 16.0, -8.0, 8.0, -3.0, 1.0),
    grid=(32, 32),
    max_pillars=256,
    max_points_per_pillar=16,
    pfn_features=16,
    enc_channels=(16, 32),
    enc_blocks=(1, 1),
    dec_channels=16,
    num_classes=4,
    ignore_index=0,
)


def _labeled_cloud(rng, n=2048):
    """Two spatial clusters with distinct classes + scattered background."""
    n1 = n // 2
    pts = np.zeros((n, 4), np.float32)
    labels = np.zeros(n, np.int32)
    # class 1: x in [2, 7]; class 2: x in [9, 14]
    pts[:n1, 0] = rng.random(n1) * 5 + 2
    labels[:n1] = 1
    pts[n1:, 0] = rng.random(n - n1) * 5 + 9
    labels[n1:] = 2
    pts[:, 1] = rng.random(n) * 16 - 8
    pts[:, 2] = rng.random(n) * 4 - 3
    pts[:, 3] = rng.random(n)
    # a few ignore-labeled points
    labels[rng.random(n) < 0.05] = 0
    return pts, labels


def _batch(rng, b=2):
    pts = np.stack([_labeled_cloud(rng)[0] for _ in range(b)])
    labels = []
    ptsl = []
    for _ in range(b):
        p, l = _labeled_cloud(rng)
        ptsl.append(p)
        labels.append(l)
    pts = jnp.asarray(np.stack(ptsl))
    feats, coords, valid = jax.vmap(
        lambda p: bevseg_pillarize(p, TINY))(pts)
    pc = jax.vmap(lambda p: point_cell_coords(p, TINY))(pts)
    return dict(features=feats, coords=coords, valid=valid,
                point_coords=pc, labels=jnp.asarray(np.stack(labels)))


class TestForward:
    def test_shapes_and_grad(self, rng):
        batch = _batch(rng)
        model = BEVSeg(TINY)
        variables = model.init(jax.random.PRNGKey(0), batch["features"],
                               batch["coords"], batch["valid"],
                               batch["point_coords"])
        logits = model.apply(variables, batch["features"], batch["coords"],
                             batch["valid"], batch["point_coords"])
        assert logits.shape == (2, 2048, 4)
        assert logits.dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(logits)))

        def loss(params):
            lg = model.apply({"params": params,
                              "batch_stats": variables["batch_stats"]},
                             batch["features"], batch["coords"],
                             batch["valid"], batch["point_coords"])
            return segmentation_loss(lg, batch["labels"], TINY)[0]

        g = jax.grad(loss)(variables["params"])
        total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
        assert np.isfinite(total) and total > 0

    def test_ignore_mask(self, rng):
        logits = jnp.asarray(rng.normal(size=(1, 16, 4)), jnp.float32)
        labels = jnp.zeros((1, 16), jnp.int32)  # all ignored
        loss, aux = segmentation_loss(logits, labels, TINY)
        assert float(loss) == 0.0


class TestEndToEnd:
    def test_train_to_miou(self, rng):
        """A few steps on the separable scene must push mIoU (computed by
        the framework's own SegmentationEvaluator) far above chance."""
        batch = _batch(rng)
        model = BEVSeg(TINY)
        variables = model.init(jax.random.PRNGKey(0), batch["features"],
                               batch["coords"], batch["valid"],
                               batch["point_coords"])
        opt = optax.adam(3e-3)
        opt_state = opt.init(variables["params"])
        step = jax.jit(make_train_step(model, opt, TINY))
        params, bs = variables["params"], variables["batch_stats"]
        first = None
        for _ in range(30):
            params, bs, opt_state, aux = step(params, bs, opt_state, batch)
            first = first if first is not None else float(aux["total"])
        assert float(aux["total"]) < first

        predict = make_predictor(model, TINY)
        pts, labels = _labeled_cloud(rng)
        pred = np.asarray(predict({"params": params, "batch_stats": bs},
                                  jnp.asarray(pts)))
        ev = SegmentationEvaluator([1, 2], background=0)
        ev.add_stats(ev.calc_stats(labels.astype(np.uint8),
                                   pred.astype(np.uint8)))
        ious = ev.iou()
        miou = np.mean([ious[1], ious[2]])
        assert miou > 0.7, (miou, ious)

    def test_sharded_train_step(self, rng):
        from d3d_tpu.parallel import make_mesh, shard_train_step

        batch = _batch(rng, b=4)
        model = BEVSeg(TINY)
        variables = model.init(jax.random.PRNGKey(0), batch["features"],
                               batch["coords"], batch["valid"],
                               batch["point_coords"])
        opt = optax.adam(1e-3)
        opt_state = opt.init(variables["params"])
        step = make_train_step(model, opt, TINY)
        mesh = make_mesh(8)  # 4 dp x 2 tp
        sharded = shard_train_step(step, mesh, donate=False)
        params, _, _, aux = sharded(variables["params"],
                                    variables["batch_stats"], opt_state,
                                    batch)
        assert np.isfinite(float(aux["total"]))
        # at least one kernel physically partitioned over tp
        assert any(
            any(ax == "tp" for ax in getattr(l.sharding, "spec", ()) or ())
            for l in jax.tree.leaves(params))


PANO = BEVSegConfig(
    bounds=(0.0, 16.0, -8.0, 8.0, -3.0, 1.0), grid=(32, 32),
    max_pillars=256, max_points_per_pillar=16, pfn_features=16,
    enc_channels=(16, 32), enc_blocks=(1, 1), dec_channels=16,
    num_classes=4, ignore_index=0, panoptic=True, thing_classes=(1, 2),
    max_instances=8, center_sigma=1.0, center_radius=2.0)


def _instance_cloud(rng, n=512):
    """Three compact instances (two of class 1, one of class 2) + stuff."""
    centers = np.asarray([[4.0, -4.0], [4.0, 4.0], [12.0, 0.0]])
    cls = np.asarray([1, 1, 2])
    per = n // 4
    pts = np.zeros((n, 4), np.float32)
    labels = np.zeros(n, np.int32)
    ids = np.zeros(n, np.int32)
    for i in range(3):
        s = slice(i * per, (i + 1) * per)
        pts[s, :2] = centers[i] + rng.normal(0, 0.3, (per, 2))
        labels[s] = cls[i]
        ids[s] = i + 1
    s = slice(3 * per, n)
    pts[s, 0] = rng.random(n - 3 * per) * 16
    pts[s, 1] = rng.random(n - 3 * per) * 16 - 8
    labels[s] = 3  # stuff class
    pts[:, 2] = rng.random(n) * 4 - 3
    pts[:, 3] = rng.random(n)
    return pts, labels, ids, centers


class TestPanopticTargets:
    def test_centers_offsets(self, rng):
        from d3d_tpu.models.bevseg import panoptic_targets

        pts, labels, ids, _ = _instance_cloud(rng)
        t = panoptic_targets(PANO, jnp.asarray(pts), jnp.asarray(labels),
                             jnp.asarray(ids))
        hm = np.asarray(t["heatmap"])
        off = np.asarray(t["offset"])
        om = np.asarray(t["offset_mask"])
        assert hm.shape == (32, 32) and hm.max() > 0.8
        # thing points carry offsets to their instance's point-mean center
        for i in range(3):
            sel = np.asarray(ids) == i + 1
            assert om[sel].all()
            c = pts[sel, :2].mean(0)
            np.testing.assert_allclose(pts[sel, :2] + off[sel], 
                                       np.broadcast_to(c, (sel.sum(), 2)),
                                       atol=2e-3)
        assert not om[np.asarray(labels) == 3].any()

    def test_grouping_recovers_instances(self, rng):
        from d3d_tpu.models.bevseg import group_instances, panoptic_targets

        pts, labels, ids, _ = _instance_cloud(rng)
        t = panoptic_targets(PANO, jnp.asarray(pts), jnp.asarray(labels),
                             jnp.asarray(ids))
        # ideal heads: targets as predictions (heatmap pre-sigmoid logits)
        hm_logit = jnp.log(jnp.clip(t["heatmap"], 1e-6, 1 - 1e-6)) \
            - jnp.log1p(-jnp.clip(t["heatmap"], 1e-6, 1 - 1e-6))
        got = np.asarray(group_instances(PANO, jnp.asarray(labels),
                                         jnp.asarray(pts), t["offset"],
                                         hm_logit))
        # same partition as gt ids (names may differ)
        for i in range(3):
            sel = np.asarray(ids) == i + 1
            vals = got[sel]
            assert (vals > 0).all(), i
            assert len(set(vals.tolist())) == 1, i
        a, b, c = (got[np.asarray(ids) == k][0] for k in (1, 2, 3))
        assert len({int(a), int(b), int(c)}) == 3
        assert (got[np.asarray(labels) == 3] == 0).all()


def test_panoptic_train_and_eval_loop(rng):
    """Loss decreases with the panoptic heads on, and the predictor's
    (sem, ids) feed the device panoptic evaluator."""
    import optax

    from d3d_tpu.benchmarks_device import device_panoptic_stats
    from d3d_tpu.models.bevseg import (BEVSeg, make_panoptic_predictor,
                                       make_train_step)

    pts_list, lab_list, id_list = [], [], []
    for _ in range(2):
        p, l, i, _ = _instance_cloud(rng)
        pts_list.append(p)
        lab_list.append(l)
        id_list.append(i)
    pts = jnp.asarray(np.stack(pts_list))
    feats, coords, valid = jax.vmap(
        lambda p: bevseg_pillarize(p, PANO))(pts)
    pc = jax.vmap(lambda p: point_cell_coords(p, PANO))(pts)
    batch = dict(features=feats, coords=coords, valid=valid,
                 point_coords=pc, points=pts,
                 labels=jnp.asarray(np.stack(lab_list)),
                 inst_ids=jnp.asarray(np.stack(id_list)))

    model = BEVSeg(PANO)
    v = model.init(jax.random.PRNGKey(0), feats, coords, valid, pc)
    opt = optax.adam(3e-3)
    step = jax.jit(make_train_step(model, opt, PANO))
    params, bs, st = v["params"], v["batch_stats"], opt.init(v["params"])
    first = None
    for _ in range(6):
        params, bs, st, aux = step(params, bs, st, batch)
        if first is None:
            first = float(aux["total"])
    assert float(aux["total"]) < first

    predict = make_panoptic_predictor(model, PANO, top_k=8)
    sem, ids = predict({"params": params, "batch_stats": bs}, pts[0])
    assert sem.shape == (512,) and ids.shape == (512,)
    assert ids.dtype == jnp.uint16
    ev = SegmentationEvaluator([1, 2, 3], background=0)
    ev.add_stats(device_panoptic_stats(
        ev, [np.asarray(lab_list[0], np.uint8)],
        [np.asarray(sem, np.uint8)],
        [np.asarray(id_list[0], np.uint16)], [np.asarray(ids)]))
    pq = ev.pq()
    assert set(pq) == {1, 2, 3}  # finite or nan per class, computed fine
