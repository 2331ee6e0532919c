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
