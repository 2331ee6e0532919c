"""Seg2D (camera segmentation for PointPainting): shape contract,
overfit smoke on synthetic masks, and the full camera->painted-cloud
pipeline."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from d3d_tpu.models import Seg2D, Seg2DConfig, make_segmenter
from d3d_tpu.models.seg2d import make_seg2d_train_step

TINY = Seg2DConfig(image_size=(48, 64), channels=(8, 16, 32),
                   num_classes=3)


def _scene(rng):
    """Image with a colored rectangle per class on background 0."""
    h, w = TINY.image_size
    img = rng.random((h, w, 3)).astype(np.float32) * 0.1
    lab = np.zeros((h, w), np.int32)
    for cls, color in ((1, [1.0, 0.1, 0.1]), (2, [0.1, 0.1, 1.0])):
        x0, y0 = rng.integers(0, w - 16), rng.integers(0, h - 16)
        img[y0:y0 + 12, x0:x0 + 14] = color
        lab[y0:y0 + 12, x0:x0 + 14] = cls
    return img, lab


class TestSeg2D:
    def test_forward_contract(self, rng):
        model = Seg2D(TINY)
        img = jnp.asarray(rng.random((2, 48, 64, 3)), jnp.float32)
        var = model.init(jax.random.PRNGKey(0), img)
        out = model.apply(var, img, train=False)
        assert out.shape == (2, 48, 64, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_overfit_smoke(self, rng):
        imgs, labs = zip(*[_scene(rng) for _ in range(2)])
        batch = dict(images=jnp.asarray(np.stack(imgs)),
                     labels=jnp.asarray(np.stack(labs)))
        model = Seg2D(TINY)
        var = model.init(jax.random.PRNGKey(0), batch["images"])
        opt = optax.adam(3e-3)
        step = jax.jit(make_seg2d_train_step(model, opt, TINY))
        params, bstats = var["params"], var["batch_stats"]
        ostate = opt.init(params)
        first = None
        for _ in range(50):
            params, bstats, ostate, aux = step(params, bstats, ostate,
                                               batch)
            if first is None:
                first = float(aux["total"])
        assert float(aux["total"]) < 0.5 * first
        assert float(aux["acc"]) > 0.8

    def test_segment_and_paint_pipeline(self, rng):
        """Camera semantics -> paint -> pillar features, in-framework."""
        from d3d_tpu.ops.painting import paint_points

        model = Seg2D(TINY)
        img = rng.random((48, 64, 3)).astype(np.float32)
        var = model.init(jax.random.PRNGKey(0),
                         jnp.asarray(img)[None])
        segment = make_segmenter(model, var)
        scores = segment(jnp.asarray(img))
        assert scores.shape == (48, 64, 3)
        np.testing.assert_allclose(np.asarray(scores).sum(-1), 1.0,
                                   atol=1e-5)
        K = np.array([[50.0, 0, 32.0], [0, 50.0, 24.0], [0, 0, 1.0]],
                     np.float32)
        pts = np.stack([rng.uniform(-5, 5, 128),
                        rng.uniform(-4, 4, 128),
                        rng.uniform(2, 30, 128),
                        rng.random(128)], axis=1).astype(np.float32)
        painted = paint_points(jnp.asarray(pts), scores, jnp.asarray(K))
        assert painted.shape == (128, 7)
        # in-image points carry a probability simplex
        feat = np.asarray(painted[:, 4:])
        nz = feat.sum(-1) > 0
        assert nz.any()
        np.testing.assert_allclose(feat[nz].sum(-1), 1.0, atol=1e-4)
