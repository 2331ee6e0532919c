"""SST (single-stride sparse window transformer) family tests: window-slot
routing vs a python oracle, attention-mask invariance, forward contract,
training convergence smoke, detector factory, and the shared sharded train
step on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from d3d_tpu.models import (SST, SSTConfig, make_anchors, make_sst_detector,
                            make_train_step, pillarize, window_slots)

TINY = SSTConfig(
    bounds=(0.0, 16.0, -8.0, 8.0, -3.0, 1.0),
    grid=(32, 32),
    max_pillars=256,
    max_points_per_pillar=16,
    pfn_features=32,
    window=8,
    capacity=16,
    depth=2,
    num_heads=2,
    neck_channels=32,
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
    pts = np.stack([_cloud(rng) for _ in range(b)])
    feats, coords, valid = jax.vmap(
        lambda p: pillarize(p, TINY))(jnp.asarray(pts))
    m = 3
    gt = np.stack([_gt(rng, m) for _ in range(b)])
    return dict(features=feats, coords=coords, valid=valid,
                gt_boxes=jnp.asarray(gt),
                gt_labels=jnp.zeros((b, m), jnp.int32),
                gt_mask=jnp.ones((b, m), bool))


class TestWindowSlots:
    @pytest.mark.parametrize("shift", [False, True])
    def test_matches_python_oracle(self, rng, shift):
        grid, window, cap = (32, 32), 8, 5
        p = 64
        coords = rng.integers(0, 32, (p, 2)).astype(np.int32)
        valid = rng.random(p) < 0.8
        slot, inv = window_slots(jnp.asarray(coords), jnp.asarray(valid),
                                 grid, window, cap, shift)
        slot, inv = np.asarray(slot), np.asarray(inv)

        off = window // 2 if shift else 0
        nwy = (32 + off + window - 1) // window
        n_windows = ((32 + off + window - 1) // window) * nwy
        trash = n_windows * cap
        counts = {}
        for i in range(p):
            if not valid[i]:
                assert slot[i] == trash, i
                continue
            wid = ((coords[i, 0] + off) // window) * nwy \
                + (coords[i, 1] + off) // window
            rank = counts.get(wid, 0)
            counts[wid] = rank + 1
            if rank < cap:
                assert slot[i] == wid * cap + rank, i
                assert inv[slot[i]] == i
            else:
                assert slot[i] == trash, i
        # every non-empty slot points back at a pillar routed to it
        for s in range(n_windows * cap):
            if inv[s] < p:
                assert slot[inv[s]] == s

    def test_capacity_overflow_goes_to_trash(self, rng):
        # all pillars in ONE cell: only `cap` of them get slots
        p, cap = 32, 4
        coords = jnp.zeros((p, 2), jnp.int32)
        valid = jnp.ones(p, bool)
        slot, inv = window_slots(coords, valid, (16, 16), 8, cap, False)
        slot = np.asarray(slot)
        routed = slot < slot.max()
        assert routed.sum() == cap
        # the routed ones hold ranks 0..cap-1 of the single window
        assert sorted(slot[routed] % cap) == list(range(cap))


class TestSSTModel:
    def test_forward_contract(self, rng):
        batch = _batch(rng)
        model = SST(TINY)
        variables = model.init(jax.random.PRNGKey(0), batch["features"],
                               batch["coords"], batch["valid"])
        cls, box, dirs = model.apply(variables, batch["features"],
                                     batch["coords"], batch["valid"])
        a = TINY.num_anchors_per_cell
        n = 32 * 32 * a
        assert cls.shape == (2, n, TINY.num_classes)
        assert box.shape == (2, n, 7)
        assert dirs.shape == (2, n, 2)
        assert np.isfinite(np.asarray(cls)).all()
        # transformer params exist alongside PFN batch stats
        assert "block0" in variables["params"]
        assert "batch_stats" in variables

    def test_padded_tokens_do_not_leak(self, rng):
        """Perturbing the features of an INVALID pillar must not change
        the outputs — the attention mask and routing must isolate it."""
        # sparse cloud so padding pillars exist (256 slots, <=160 filled)
        pts = _cloud(rng, n=160)[None]
        feats, coords, valid_ = jax.vmap(
            lambda p: pillarize(p, TINY))(jnp.asarray(pts))
        batch = dict(features=feats, coords=coords, valid=valid_)
        model = SST(TINY)
        variables = model.init(jax.random.PRNGKey(0), batch["features"],
                               batch["coords"], batch["valid"])
        valid = np.asarray(batch["valid"])[0]
        dead = int(np.nonzero(~valid)[0][0])
        ref = model.apply(variables, batch["features"], batch["coords"],
                          batch["valid"])
        feats2 = batch["features"].at[0, dead].set(123.0)
        got = model.apply(variables, feats2, batch["coords"],
                          batch["valid"])
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(r), np.asarray(g),
                                       atol=1e-5)

    def test_train_step_overfits_one_batch(self, rng):
        batch = _batch(rng)
        model = SST(TINY)
        variables = model.init(jax.random.PRNGKey(0), batch["features"],
                               batch["coords"], batch["valid"])
        opt = optax.adam(3e-3)
        opt_state = opt.init(variables["params"])
        step = jax.jit(make_train_step(model, opt, TINY,
                                       make_anchors(TINY)))
        params, bstats = variables["params"], variables["batch_stats"]
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
        model = SST(TINY)
        variables = model.init(jax.random.PRNGKey(0), batch["features"],
                               batch["coords"], batch["valid"])
        from d3d_tpu.dataset.kitti.utils import KittiObjectClass

        detect = make_sst_detector(model, variables, TINY,
                                   make_anchors(TINY),
                                   [KittiObjectClass.Car], top_k=8)
        out = detect(_cloud(rng), frame="velo")
        assert out.frame == "velo"
        for obj in out:
            assert np.isfinite(obj.position).all()

    def test_sharded_train_step(self, rng):
        from d3d_tpu.parallel import (make_mesh, shard_train_step,
                                      spatial_constrain)

        mesh = make_mesh(8, dp=2, sp=2, tp=2)
        model = SST(TINY, constrain=spatial_constrain(mesh))
        batch = _batch(rng, b=4)
        variables = model.init(jax.random.PRNGKey(0), batch["features"],
                               batch["coords"], batch["valid"])
        opt = optax.adam(1e-3)
        step = shard_train_step(
            make_train_step(model, opt, TINY, make_anchors(TINY)),
            mesh, donate=False)
        params, bstats, opt_state, aux = step(
            variables["params"], variables["batch_stats"],
            opt.init(variables["params"]), batch)
        assert np.isfinite(float(aux["total"]))


class TestSSTMoE:
    def _cfg(self):
        import dataclasses
        return dataclasses.replace(TINY, moe_experts=2)

    def test_moe_params_and_forward(self, rng):
        cfg = self._cfg()
        batch = _batch(rng, b=1)
        model = SST(cfg)
        variables = model.init(jax.random.PRNGKey(0), batch["features"],
                               batch["coords"], batch["valid"])
        assert "moe_w1" in variables["params"]["block0"]
        out = model.apply(variables, batch["features"], batch["coords"],
                          batch["valid"], train=False)
        assert all(np.isfinite(np.asarray(o)).all() for o in out)

    def test_train_step_carries_moe_aux(self, rng):
        cfg = self._cfg()
        batch = _batch(rng)
        model = SST(cfg)
        variables = model.init(jax.random.PRNGKey(0), batch["features"],
                               batch["coords"], batch["valid"])
        opt = optax.adam(1e-3)
        step = jax.jit(make_train_step(model, opt, cfg, make_anchors(cfg)))
        params, bstats, opt_state, aux = step(
            variables["params"], variables["batch_stats"],
            opt.init(variables["params"]), batch)
        assert "moe_aux" in aux
        # Switch bound: E * sum(f * P) >= 1, scaled by depth blocks
        assert float(aux["moe_aux"]) >= cfg.depth * (1.0 - 1e-4)
        assert np.isfinite(float(aux["total"]))

    def test_ep_sharded_forward_matches_dense(self, rng):
        from d3d_tpu.parallel.mesh import expert_constrain
        from jax.sharding import Mesh

        cfg = self._cfg()
        batch = _batch(rng, b=2)
        mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2),
                    axis_names=("ep",))
        dense = SST(cfg)
        variables = dense.init(jax.random.PRNGKey(0), batch["features"],
                               batch["coords"], batch["valid"])
        sharded = SST(cfg, moe_constrain=expert_constrain(mesh))
        run_d = jax.jit(lambda v: dense.apply(
            v, batch["features"], batch["coords"], batch["valid"],
            train=False))
        run_s = jax.jit(lambda v: sharded.apply(
            v, batch["features"], batch["coords"], batch["valid"],
            train=False))
        for a, b in zip(run_d(variables), run_s(variables)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=1e-5)


class TestPipelinedTrunk:
    def test_pipelined_trunk_matches_model(self, rng):
        """SST's transformer trunk run through the GPipe schedule over a
        4-rank pp mesh must reproduce the model's own trunk output (the
        realistic pipeline-parallel workload: per-depth routing tables
        as per-microbatch stage state, alternating tilings padded to a
        homogeneous shape)."""
        import dataclasses

        from d3d_tpu.models.sst import pipeline_sst_trunk
        from d3d_tpu.parallel.pipeline import (make_pp_mesh, microbatch,
                                               unmicrobatch)

        cfg = dataclasses.replace(TINY, depth=4)
        batch = _batch(rng, b=4)
        model = SST(cfg)
        var = model.init(jax.random.PRNGKey(0), batch["features"],
                         batch["coords"], batch["valid"])
        args = (batch["features"], batch["coords"], batch["valid"])
        pf0 = SST(cfg, stage="embed").apply(var, *args, train=False)
        want = SST(cfg, stage="trunk").apply(var, *args, train=False)

        mesh = make_pp_mesh(4)
        got = unmicrobatch(pipeline_sst_trunk(
            var, cfg, mesh, microbatch(pf0, 2),
            microbatch(batch["coords"], 2), microbatch(batch["valid"], 2)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=2e-5)

    def test_pipelined_trunk_dp_times_pp(self, rng):
        """batch_axis='dp': the routing-table state shards its
        microbatch dim alongside the activations (regression: the
        tables used to stay full-size and shape-mismatch in the scan)."""
        import dataclasses

        from d3d_tpu.models.sst import pipeline_sst_trunk
        from d3d_tpu.parallel.pipeline import (make_pp_mesh, microbatch,
                                               unmicrobatch)

        cfg = dataclasses.replace(TINY, depth=4)
        batch = _batch(rng, b=4)
        model = SST(cfg)
        var = model.init(jax.random.PRNGKey(0), batch["features"],
                         batch["coords"], batch["valid"])
        args = (batch["features"], batch["coords"], batch["valid"])
        pf0 = SST(cfg, stage="embed").apply(var, *args, train=False)
        want = SST(cfg, stage="trunk").apply(var, *args, train=False)

        mesh = make_pp_mesh(4, dp=2)
        got = unmicrobatch(pipeline_sst_trunk(
            var, cfg, mesh, microbatch(pf0, 2),
            microbatch(batch["coords"], 2), microbatch(batch["valid"], 2),
            batch_axis="dp"))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=2e-5)

    def test_ep_sharded_train_step(self, rng):
        """Expert weights physically partition over an 'ep' mesh axis in
        TRAINING: param_partition_spec's moe_* rule + shard_train_step
        on a ('dp', 'ep') mesh."""
        import dataclasses

        from jax.sharding import Mesh
        from d3d_tpu.parallel import (expert_constrain, shard_train_step,
                                      tp_param_report)

        cfg = dataclasses.replace(TINY, moe_experts=2)
        mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                    axis_names=("dp", "ep"))
        model = SST(cfg, moe_constrain=expert_constrain(mesh))
        batch = _batch(rng, b=4)
        variables = model.init(jax.random.PRNGKey(0), batch["features"],
                               batch["coords"], batch["valid"])
        sharded, _ = tp_param_report(variables["params"], mesh)
        assert any("moe_w1" in p for p in sharded)
        assert not any("moe_router" in p for p in sharded)

        opt = optax.adam(1e-3)
        step = shard_train_step(
            make_train_step(model, opt, cfg, make_anchors(cfg)),
            mesh, donate=False)
        params, bstats, opt_state, aux = step(
            variables["params"], variables["batch_stats"],
            opt.init(variables["params"]), batch)
        assert np.isfinite(float(aux["total"]))
        w1 = params["block0"]["moe_w1"]
        assert w1.addressable_shards[0].data.shape[0] == 1  # 2 experts / 2
