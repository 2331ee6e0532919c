"""Trainer loop: runs a real sharded PointPillars train over an iterator
with device-side prep, logs, checkpoints, and resumes identically."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from d3d_tpu.checkpoint import TrainCheckpointer
from d3d_tpu.models.pointpillars import (PointPillars, PointPillarsConfig,
                                         make_anchors, make_train_step,
                                         pillarize, prepare_targets)
from d3d_tpu.parallel import make_mesh, shard_train_step
from d3d_tpu.train import Trainer

TINY = PointPillarsConfig(
    bounds=(0.0, 16.0, -8.0, 8.0, -3.0, 1.0), grid=(32, 32),
    max_pillars=256, max_points_per_pillar=16, pfn_features=32,
    backbone_channels=(32, 64), backbone_blocks=(1, 1),
    upsample_channels=32)


def _batches(rng, n, b=4):
    for _ in range(n):
        pts = jnp.asarray(np.stack([np.stack([
            rng.random(2048) * 16, rng.random(2048) * 16 - 8,
            rng.random(2048) * 4 - 3, rng.random(2048)], axis=1)
            for _ in range(b)]).astype(np.float32))
        feats, coords, valid = jax.vmap(
            lambda p: pillarize(p, TINY))(pts)
        gt = np.stack([np.stack([
            rng.random(3) * 12 + 2, rng.random(3) * 12 - 6,
            np.full(3, -1.0), np.full(3, 3.9), np.full(3, 1.6),
            np.full(3, 1.56), rng.random(3) * np.pi - np.pi / 2], axis=1)
            for _ in range(b)]).astype(np.float32)
        yield dict(features=feats, coords=coords, valid=valid,
                   gt_boxes=jnp.asarray(gt),
                   gt_labels=jnp.zeros((b, 3), jnp.int32),
                   gt_mask=jnp.ones((b, 3), bool))


def test_trainer_end_to_end(tmp_path, rng):
    model = PointPillars(TINY)
    first = next(_batches(rng, 1))
    variables = model.init(jax.random.PRNGKey(0), first["features"],
                           first["coords"], first["valid"])
    anchors = make_anchors(TINY)
    opt = optax.adam(1e-3)
    opt_state = opt.init(variables["params"])

    mesh = make_mesh(8)
    step = shard_train_step(
        make_train_step(model, opt, TINY, anchors, external_targets=True),
        mesh, donate=False)
    prep = jax.jit(lambda b: prepare_targets(
        jnp.asarray(anchors), b, TINY.pos_iou, TINY.neg_iou,
        num_classes=TINY.num_classes, dense=True))

    logs = []
    ckpt = TrainCheckpointer(tmp_path / "run", keep=2)
    tr = Trainer(step, prep_fn=prep, checkpointer=ckpt, log_every=3,
                 ckpt_every=5, log_fn=logs.append)

    rng_data = np.random.default_rng(1)
    s, params, bs, opt_state = tr.run(
        variables["params"], variables["batch_stats"], opt_state,
        _batches(rng_data, 8))
    assert s == 8
    assert len(logs) == 2 and "total=" in logs[0]
    assert len(tr.history) == 2
    assert all(np.isfinite(h["total"]) for h in tr.history)
    ckpt.wait()
    assert ckpt.latest_step == 8

    # resume: restore_or picks up step 8 and continues with the same math
    tr2 = Trainer(step, prep_fn=prep, checkpointer=ckpt, log_every=0,
                  ckpt_every=0)
    fresh_opt = opt.init(variables["params"])  # consistent placement
    start, p2, b2, o2 = tr2.restore_or(variables["params"],
                                       variables["batch_stats"], fresh_opt)
    assert start == 8
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(p2)[0]),
        np.asarray(jax.tree.leaves(params)[0]))
    s2, *_ = tr2.run(p2, b2, o2, _batches(np.random.default_rng(2), 2),
                     start_step=start)
    assert s2 == 10


class TestHostPipeline:
    def test_prefetch_order_and_exceptions(self):
        from d3d_tpu.train import prefetch

        assert list(prefetch(range(10), depth=3)) == list(range(10))

        def boom():
            yield 1
            raise RuntimeError("loader died")

        it = prefetch(boom(), depth=2)
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="loader died"):
            list(it)

    def test_prefetch_overlaps(self):
        import time as _t

        from d3d_tpu.train import prefetch

        def slow_frames():
            for i in range(4):
                _t.sleep(0.05)
                yield i

        t0 = _t.perf_counter()
        for _ in prefetch(slow_frames(), depth=2):
            _t.sleep(0.05)  # consumer work overlapping producer work
        overlapped = _t.perf_counter() - t0
        # serial would be ~0.4s; overlap should stay well under
        assert overlapped < 0.35, overlapped

    def test_batch_frames(self):
        from d3d_tpu.train import batch_frames

        frames = [dict(a=np.full(3, i), b=i * np.ones((2, 2)))
                  for i in range(5)]
        batches = list(batch_frames(frames, 2))
        assert len(batches) == 2  # drop_last
        assert batches[0]["a"].shape == (2, 3)
        np.testing.assert_array_equal(batches[1]["a"][0], np.full(3, 2))
        batches = list(batch_frames(frames, 2, drop_last=False))
        assert len(batches) == 3 and batches[2]["a"].shape == (1, 3)

    def test_shard_frames_across_hosts(self):
        from d3d_tpu.train import shard_frames_across_hosts

        frames = list(range(10))
        shards = [list(shard_frames_across_hosts(frames, index=i, count=3))
                  for i in range(3)]
        assert shards[0] == [0, 3, 6, 9]
        assert shards[1] == [1, 4, 7]
        assert shards[2] == [2, 5, 8]
        # union is a partition of the stream
        assert sorted(sum(shards, [])) == frames
        # single-process defaults degrade to identity
        assert list(shard_frames_across_hosts(frames)) == frames

    def test_prefetch_early_exit_releases_worker(self):
        import gc
        import threading
        import time as _t

        from d3d_tpu.train import prefetch

        closed = []

        def frames():
            try:
                for i in range(1000):
                    yield i
            finally:
                closed.append(True)

        before = threading.active_count()
        it = prefetch(frames(), depth=1)
        assert next(it) == 0
        it.close()  # consumer abandons the stream
        gc.collect()
        deadline = _t.time() + 3
        while threading.active_count() > before and _t.time() < deadline:
            _t.sleep(0.05)
        assert threading.active_count() <= before, "worker thread stuck"


def test_trainer_eval_hook(rng):
    from d3d_tpu.train import Trainer

    def step(p, bs, o, batch):
        return p, bs, o, {"total": np.float32(1.0)}

    evals = []

    def eval_fn(step_n, params, bs):
        evals.append(step_n)
        return {"metric": 0.5}

    tr = Trainer(step, log_every=0, eval_fn=eval_fn, eval_every=2)
    batches = iter([{"x": np.zeros(1)}] * 5)
    s, *_ = tr.run({}, {}, {}, batches)
    assert s == 5
    assert evals == [2, 4]
    assert any("eval" in h for h in tr.history)


def test_pfn_grad_jit_matches_eager_odd_batch(rng):
    """Regression: the PFN's masked max formerly used jnp.max, whose VJP
    routes cotangents through a float ``x == max`` equality. XLA:CPU's
    fused backward recomputed the operand with different arithmetic than
    the stored max and the whole PFN gradient came out 8-30% wrong at
    every non-power-of-two batch (b=3/5/6/7; b=1/2/4/8 exact). The
    integer argmax+take formulation has no equality to break — pin
    jit == eager at an affected batch size."""
    from d3d_tpu.models.pointpillars import _PFN

    b = 3
    pts = jnp.asarray(np.stack([np.stack([
        rng.random(2048) * 16, rng.random(2048) * 16 - 8,
        rng.random(2048) * 4 - 3, rng.random(2048)], axis=1)
        for _ in range(b)]).astype(np.float32))
    feats, _, _ = jax.vmap(lambda p: pillarize(p, TINY))(pts)
    feats = feats.astype(jnp.float64)
    pmask = jnp.any(feats != 0, axis=-1)
    mod = _PFN(32, "float64")
    variables = mod.init(jax.random.PRNGKey(0), feats, pmask, True)

    def loss(params, x, m):
        out, _ = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, m, True, mutable=["batch_stats"])
        return jnp.sum(out ** 2) / x.shape[0]

    g_eager = jax.grad(loss)(variables["params"], feats, pmask)
    g_jit = jax.jit(jax.grad(loss))(variables["params"], feats, pmask)
    for a, b_ in zip(jax.tree.leaves(g_eager), jax.tree.leaves(g_jit)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-10, atol=1e-12)


def test_repeat_batch_step_is_exact(rng):
    """Tiling the batch inside the step (the v5e sub-sublane-batch
    workaround, train.repeat_batch_step) must produce the SAME update:
    sum/npos losses and BatchNorm batch stats are invariant under exact
    batch duplication, so only float reduction order can differ."""
    from d3d_tpu.train import repeat_batch_step

    model = PointPillars(TINY)
    batch = next(_batches(rng, 1, b=2))
    variables = model.init(jax.random.PRNGKey(0), batch["features"],
                           batch["coords"], batch["valid"])
    anchors = make_anchors(TINY)
    # sgd: the update is linear in the gradient, so the only admissible
    # difference (float reduction order over the tiled batch) stays tiny;
    # adam's g/sqrt(v) would amplify reduction noise on ~zero gradients
    opt = optax.sgd(1e-3)
    opt_state = opt.init(variables["params"])

    base = jax.jit(make_train_step(model, opt, TINY, anchors))
    rep = jax.jit(repeat_batch_step(
        make_train_step(model, opt, TINY, anchors), 2))

    p1, bs1, _, aux1 = base(variables["params"], variables["batch_stats"],
                            opt_state, batch)
    p2, bs2, _, aux2 = rep(variables["params"], variables["batch_stats"],
                           opt_state, batch)
    np.testing.assert_allclose(float(aux1["total"]), float(aux2["total"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
    for a, b in zip(jax.tree.leaves(bs1), jax.tree.leaves(bs2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_training_converges_on_fixed_batch(rng):
    """Overfitting one fixed batch must drive the total loss down
    substantially — the ML sanity check that gradients, target
    assignment, BEV densification and the optimizer actually cooperate."""
    model = PointPillars(TINY)
    batch = next(_batches(np.random.default_rng(7), 1, b=2))
    variables = model.init(jax.random.PRNGKey(0), batch["features"],
                           batch["coords"], batch["valid"])
    anchors = make_anchors(TINY)
    opt = optax.adam(3e-3)
    opt_state = opt.init(variables["params"])
    step = make_train_step(model, opt, TINY, anchors, riou_weight=0.2)

    params, bs = variables["params"], variables["batch_stats"]
    losses = []
    for _ in range(30):
        params, bs, opt_state, m = step(params, bs, opt_state, batch)
        losses.append(float(m["total"]))
    assert np.isfinite(losses).all()
    start = np.mean(losses[:3])
    end = np.mean(losses[-3:])
    assert end < 0.5 * start, (start, end)
    assert losses[-1] < losses[0]


class TestEMA:
    def test_converges_to_constant(self):
        import jax.numpy as jnp

        from d3d_tpu.train import ema_init, ema_update

        p = {"w": jnp.full((4,), 2.0), "b": jnp.zeros(3)}
        ema = ema_init({"w": jnp.zeros(4), "b": jnp.ones(3)})
        for i in range(400):
            ema = ema_update(ema, p, decay=0.97)
        np.testing.assert_allclose(np.asarray(ema["w"]), 2.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ema["b"]), 0.0, atol=1e-4)

    def test_warmup_tracks_early(self):
        import jax.numpy as jnp

        from d3d_tpu.train import ema_init, ema_update

        p = {"w": jnp.full((2,), 5.0)}
        ema = ema_init({"w": jnp.zeros(2)})
        # step 0: d = min(0.999, 1/10) = 0.1 -> ema jumps 90% of the way
        ema = ema_update(ema, p, decay=0.999, step=0)
        np.testing.assert_allclose(np.asarray(ema["w"]), 4.5, atol=1e-6)
        # without warmup the same update would move only 0.1%
        ema2 = ema_update(ema_init({"w": jnp.zeros(2)}), p, decay=0.999)
        np.testing.assert_allclose(np.asarray(ema2["w"]), 0.005, atol=1e-6)


class TestMakeOptimizer:
    def test_onecycle_shape(self):
        from d3d_tpu.train import make_optimizer

        _, lr = make_optimizer(100, base_lr=1e-2, warmup_frac=0.4)
        vals = [float(lr(s)) for s in range(100)]
        peak = int(np.argmax(vals))
        assert abs(peak - 40) <= 2
        assert vals[peak] == pytest.approx(1e-2, rel=1e-6)
        assert vals[0] == pytest.approx(1e-3, rel=1e-6)    # div_factor 10
        assert vals[-1] < 1e-3                              # decayed

    def test_accumulation_matches_full_batch(self, rng):
        """k accumulation microsteps over batch slices == one step on
        the full batch (same grads by linearity of the mean loss)."""
        import optax
        from d3d_tpu.train import make_optimizer

        w0 = jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
        yt = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)

        def loss(w, xb, yb):
            return jnp.mean((xb @ w - yb) ** 2)

        # full batch, no accumulation
        tx, _ = make_optimizer(10, base_lr=1e-2, schedule="constant")
        st = tx.init(w0)
        g = jax.grad(loss)(w0, x, yt)
        up, _ = tx.update(g, st, w0)
        w_full = optax.apply_updates(w0, up)

        # two half-batch microsteps with accumulate=2
        tx2, _ = make_optimizer(10, base_lr=1e-2, schedule="constant",
                                accumulate=2)
        st2 = tx2.init(w0)
        w = w0
        for lo in (0, 4):
            g = jax.grad(loss)(w, x[lo:lo + 4], yt[lo:lo + 4])
            up, st2 = tx2.update(g, st2, w)
            w = optax.apply_updates(w, up)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w_full),
                                   rtol=0, atol=1e-6)

    def test_accumulated_schedule_completes(self):
        """With accumulate=k the one-cycle must still complete over
        total_steps TRAINING steps (MultiSteps advances the inner
        schedule only on applied updates)."""
        from d3d_tpu.train import make_optimizer

        _, lr = make_optimizer(100, base_lr=1e-2, warmup_frac=0.4,
                               accumulate=4)
        vals = [float(lr(s)) for s in range(100)]
        peak = int(np.argmax(vals))
        assert abs(peak - 40) <= 4
        assert max(vals) == pytest.approx(1e-2, rel=1e-6)
        assert vals[-1] < 2e-3  # decayed by the END of training
