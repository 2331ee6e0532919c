"""Multi-chip evaluator-stat reduction: psum merge across the 8-device mesh
must equal the host-side add_stats merge."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P
from scipy.spatial.transform import Rotation

from d3d_tpu.abstraction import ObjectTag, ObjectTarget3D, Target3DArray
from d3d_tpu.benchmarks import DetectionEvaluator
from d3d_tpu.dataset.kitti.utils import KittiObjectClass
from d3d_tpu.parallel import (arrays_to_stats, make_mesh, reduce_stats_arrays,
                              stats_to_arrays)

CAR = KittiObjectClass.Car


def _frame_stats(evaluator, rng, seed):
    r = Rotation.from_euler("Z", 0)
    gt = Target3DArray([
        ObjectTarget3D([seed, 0, 0], r, [2, 2, 2], ObjectTag(CAR)),
        ObjectTarget3D([seed + 10, 0, 0], r, [2, 2, 2], ObjectTag(CAR)),
    ], frame="t")
    dt = Target3DArray([
        ObjectTarget3D([seed + rng.normal(0, 0.1), 0, 0], r, [2, 2, 2],
                       ObjectTag(CAR, scores=0.9)),
    ], frame="t")
    return evaluator.calc_stats(gt, dt)


def test_reduce_matches_host_merge(rng):
    evaluator = DetectionEvaluator([CAR], [0.3], pr_sample_count=8)
    classes = [CAR.value]

    per_device = [_frame_stats(evaluator, rng, i) for i in range(8)]

    # host-side reference merge
    host = DetectionEvaluator([CAR], [0.3], pr_sample_count=8)
    for s in per_device:
        host.add_stats(s)

    # device-side psum merge over the mesh
    mesh = make_mesh(8, dp=8, tp=1)
    arrays = [stats_to_arrays(s, classes) for s in per_device]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *arrays)

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    @jax.jit
    def merge(stats):
        def inner(local):
            local = jax.tree.map(lambda x: x[0], local)  # unshard the axis
            return reduce_stats_arrays(local, "dp")

        return shard_map(
            inner, mesh=mesh,
            in_specs=(jax.tree.map(lambda _: P("dp"), stats),),
            out_specs=jax.tree.map(lambda _: P(), stats),
        )(stats)

    merged = merge(stacked)
    merged_stats = arrays_to_stats(jax.tree.map(np.asarray, merged), classes)

    hs = host.get_stats()
    assert merged_stats.ngt[CAR.value] == hs.ngt[CAR.value]
    assert np.array_equal(merged_stats.tp[CAR.value], hs.tp[CAR.value])
    assert np.array_equal(merged_stats.fp[CAR.value], hs.fp[CAR.value])
    assert np.array_equal(merged_stats.fn[CAR.value], hs.fn[CAR.value])
    # tp-weighted accuracy means agree where defined
    ok = hs.tp[CAR.value] > 0
    assert np.allclose(merged_stats.acc_iou[CAR.value][ok],
                       hs.acc_iou[CAR.value][ok], atol=1e-6)
    assert np.all(np.isnan(merged_stats.acc_iou[CAR.value][~ok]))


# ---------------------------------------------------------------------------
# tensor-parallel axis: explicit rules must actually partition and must not
# change the math
# ---------------------------------------------------------------------------

import optax

from d3d_tpu.models.pointpillars import (PointPillars, PointPillarsConfig,
                                         make_anchors, make_train_step,
                                         pillarize)
from d3d_tpu.parallel import shard_train_step
from d3d_tpu.parallel.mesh import tp_param_report

_TP_TINY = PointPillarsConfig(
    bounds=(0.0, 16.0, -8.0, 8.0, -3.0, 1.0), grid=(32, 32),
    max_pillars=256, max_points_per_pillar=16, pfn_features=32,
    backbone_channels=(32, 64), backbone_blocks=(1, 1),
    upsample_channels=32)


def _pp_state_and_batch(rng, b=4, constrain=None):
    pts = np.stack([np.stack([
        rng.random(2048) * 16, rng.random(2048) * 16 - 8,
        rng.random(2048) * 4 - 3, rng.random(2048)], axis=1)
        for _ in range(b)]).astype(np.float32)
    feats, coords, valid = jax.vmap(
        lambda p: pillarize(p, _TP_TINY))(jnp.asarray(pts))
    m = 3
    gt = np.stack([np.stack([
        rng.random(m) * 12 + 2, rng.random(m) * 12 - 6, np.full(m, -1.0),
        np.full(m, 3.9), np.full(m, 1.6), np.full(m, 1.56),
        rng.random(m) * np.pi - np.pi / 2], axis=1)
        for _ in range(b)]).astype(np.float32)
    batch = dict(features=feats, coords=coords, valid=valid,
                 gt_boxes=jnp.asarray(gt),
                 gt_labels=jnp.zeros((b, m), jnp.int32),
                 gt_mask=jnp.ones((b, m), bool))
    model = PointPillars(_TP_TINY, constrain=constrain)
    variables = model.init(jax.random.PRNGKey(0), feats, coords, valid)
    opt = optax.adam(1e-3)
    step = make_train_step(model, opt, _TP_TINY, make_anchors(_TP_TINY),
                           riou_weight=0.1)
    return variables, opt.init(variables["params"]), step, batch


class TestTensorParallelAxis:
    def test_tp_rules_partition_flagship_params(self, rng):
        """The explicit rules must shard real kernels over tp — an
        all-replicated layout (the round-1 heuristic's silent failure mode)
        now raises in shard_train_step and is asserted against here."""
        variables, _, _, _ = _pp_state_and_batch(rng)
        mesh = make_mesh(8)  # 4 dp x 2 tp
        sharded, repl_kernels = tp_param_report(variables["params"], mesh)
        assert len(sharded) >= 5, sharded
        # every conv/dense kernel in this config has even output channels
        assert repl_kernels == [], repl_kernels

    def test_tp_output_shardings_partitioned(self, rng):
        """After one compiled step, at least one returned param must be
        physically partitioned over tp (addressable shard smaller than the
        global array)."""
        variables, opt_state, step, batch = _pp_state_and_batch(rng)
        mesh = make_mesh(8)
        fn = shard_train_step(step, mesh, donate=False)
        params, _, _, _ = fn(variables["params"], variables["batch_stats"],
                             opt_state, batch)
        found = False
        for leaf in jax.tree.leaves(params):
            spec = getattr(leaf.sharding, "spec", None)
            if spec is not None and any(ax == "tp" for ax in spec):
                shard = leaf.addressable_shards[0].data
                assert shard.shape[-1] * 2 == leaf.shape[-1]
                found = True
        assert found, "no output param partitioned over tp"

    def test_tp1_vs_tp2_same_loss(self, rng):
        """Partitioning over tp must not change the computed loss (GSPMD
        inserts collectives; the math is identical up to reduction order)."""
        variables, opt_state, step, batch = _pp_state_and_batch(rng)
        mesh1 = make_mesh(4, dp=4, tp=1)
        mesh2 = make_mesh(8, dp=4, tp=2)
        fn1 = shard_train_step(step, mesh1, donate=False, check_tp=False)
        fn2 = shard_train_step(step, mesh2, donate=False)
        _, _, _, aux1 = fn1(variables["params"], variables["batch_stats"],
                            opt_state, batch)
        _, _, _, aux2 = fn2(variables["params"], variables["batch_stats"],
                            opt_state, batch)
        l1, l2 = float(aux1["total"]), float(aux2["total"])
        assert np.isfinite(l1)
        assert np.isclose(l1, l2, rtol=1e-6, atol=1e-7), (l1, l2)

    def test_tp_all_replicated_raises(self, rng):
        """A model whose kernels cannot shard over tp must fail loudly."""
        odd = {"dense": {"kernel": jnp.zeros((4, 7))},
               "norm": {"scale": jnp.zeros((7,))}}
        mesh = make_mesh(8)
        fn = shard_train_step(lambda p, bs, o, b: (p, bs, o, {"total": 0.0}),
                              mesh, donate=False)
        with pytest.raises(ValueError, match="no parameter partitions"):
            fn(odd, {}, {}, {"x": jnp.zeros((8, 4))})


class TestSpatialAxis:
    """BEV spatial partitioning over the mesh 'sp' axis: the model's
    ``constrain`` hook shards the (B, W, H, C) canvas rows and XLA's SPMD
    partitioner inserts the conv halo exchanges."""

    def test_sp_vs_dp_same_loss(self, rng):
        """Spatially partitioning the backbone must not change the loss
        (same params, same batch, GSPMD halo exchange only)."""
        from d3d_tpu.parallel import spatial_constrain

        variables, opt_state, step, batch = _pp_state_and_batch(rng)
        mesh_sp = make_mesh(8, dp=2, sp=2, tp=2)
        _, _, step_sp, _ = _pp_state_and_batch(
            rng, constrain=spatial_constrain(mesh_sp))
        fn1 = shard_train_step(step, make_mesh(8, dp=4, tp=2), donate=False)
        fn2 = shard_train_step(step_sp, mesh_sp, donate=False)
        _, _, _, aux1 = fn1(variables["params"], variables["batch_stats"],
                            opt_state, batch)
        _, _, _, aux2 = fn2(variables["params"], variables["batch_stats"],
                            opt_state, batch)
        l1, l2 = float(aux1["total"]), float(aux2["total"])
        assert np.isfinite(l1)
        # looser than the tp test: the two meshes regroup the f32
        # BatchNorm batch-stat reductions over (B, W, H) AND feed the
        # (candidate-masked) rotated-IoU loss coordinates that differ in
        # the last ulp — observed ~3e-5 relative on this tiny canvas
        assert np.isclose(l1, l2, rtol=2e-4), (l1, l2)

    def test_bev_canvas_physically_sharded(self):
        """The constrained canvas must be partitioned over BOTH dp (batch)
        and sp (x-rows): its addressable shard is a quarter of the array."""
        from d3d_tpu.parallel import bev_sharding, spatial_constrain

        mesh = make_mesh(8, dp=2, sp=2, tp=2)
        con = spatial_constrain(mesh)

        @jax.jit
        def canvas(x):
            return con(x, "bev")

        out = canvas(jnp.ones((4, 16, 16, 8)))
        assert out.sharding.is_equivalent_to(bev_sharding(mesh), 4)
        shard = out.addressable_shards[0].data
        assert shard.shape == (2, 8, 16, 8)

    def test_conv_halo_exchange_in_hlo(self):
        """A 3x3 conv over the sp-sharded canvas must compile to a halo
        exchange (collective-permute between row-neighbor devices), the
        SPMD spatial-partitioning signature."""
        from d3d_tpu.parallel import spatial_constrain

        mesh = make_mesh(8, dp=2, sp=2, tp=2)
        con = spatial_constrain(mesh)

        @jax.jit
        def f(x, k):
            return jax.lax.conv_general_dilated(
                con(x, "bev"), k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        txt = f.lower(jnp.ones((4, 16, 16, 8)),
                      jnp.ones((3, 3, 8, 8))).compile().as_text()
        assert "collective-permute" in txt, \
            "no halo exchange found in the partitioned conv HLO"

    def test_make_mesh_sp_axis_resolution(self):
        mesh = make_mesh(8, sp=2)
        assert mesh.axis_names == ("dp", "sp", "tp")
        assert dict(mesh.shape) == {"dp": 2, "sp": 2, "tp": 2}
        assert dict(make_mesh(8).shape) == {"dp": 4, "sp": 1, "tp": 2}
        assert dict(make_mesh(8, sp=4, tp=1).shape) == \
            {"dp": 2, "sp": 4, "tp": 1}


# ---------------------------------------------------------------------------
# multi-host path (single-process degradation; the multi-process branches
# are exercised on real pods)
# ---------------------------------------------------------------------------

from d3d_tpu.parallel import (all_hosts_stats, initialize, make_global_mesh,
                              process_count)


class TestDistributed:
    def test_initialize_noop_single_process(self):
        assert initialize(num_processes=1) is False
        assert process_count() == 1

    def test_global_mesh_over_virtual_devices(self):
        mesh = make_global_mesh()
        assert mesh.axis_names == ("dp", "tp")
        assert mesh.shape["dp"] * mesh.shape["tp"] == len(jax.devices())
        assert mesh.shape["tp"] == 2  # 8 CPU devices -> 4 dp x 2 tp
        mesh2 = make_global_mesh(dp=2, tp=4)
        assert mesh2.shape == {"dp": 2, "tp": 4}

    def test_all_hosts_stats_single_process(self, rng):
        ev = DetectionEvaluator([CAR], [0.3], pr_sample_count=8)
        stats = _frame_stats(ev, rng, 0)
        merged = all_hosts_stats(stats, [CAR.value])
        assert merged.ngt[CAR.value] == stats.ngt[CAR.value]
        np.testing.assert_array_equal(merged.tp[CAR.value],
                                      stats.tp[CAR.value])
        h = stats.acc_iou[CAR.value]
        m = merged.acc_iou[CAR.value]
        np.testing.assert_array_equal(np.isnan(h), np.isnan(m))
        np.testing.assert_allclose(m[~np.isnan(h)], h[~np.isnan(h)])

    def test_merge_stacked_equals_sequential_add_stats(self, rng):
        """The multi-host numpy merge must equal sequential host add_stats
        (runs the merge math the multi-process branch uses, without
        needing multiple processes)."""
        from d3d_tpu.parallel import merge_stacked_stats

        ev_parts = DetectionEvaluator([CAR], [0.3], pr_sample_count=8)
        parts = [_frame_stats(ev_parts, rng, i) for i in range(4)]
        host = DetectionEvaluator([CAR], [0.3], pr_sample_count=8)
        for p in parts:
            host.add_stats(p)

        stacked = {}
        arrs = [stats_to_arrays(p, [CAR.value]) for p in parts]
        for k in arrs[0]:
            stacked[k] = np.stack([np.asarray(a[k]) for a in arrs])
        merged = arrays_to_stats(merge_stacked_stats(stacked), [CAR.value])
        hs = host.get_stats()
        np.testing.assert_array_equal(merged.tp[CAR.value],
                                      hs.tp[CAR.value])
        h = hs.acc_iou[CAR.value]
        d = merged.acc_iou[CAR.value]
        np.testing.assert_array_equal(np.isnan(h), np.isnan(d))
        np.testing.assert_allclose(d[~np.isnan(h)], h[~np.isnan(h)],
                                   rtol=1e-6)


class TestShardInference:
    def test_dp_batched_detector_matches_single(self, rng):
        """shard_inference over the 8-device CPU mesh: each batch row's
        outputs equal the single-cloud pipeline's."""
        import jax
        import jax.numpy as jnp

        from d3d_tpu.dataset.kitti.utils import KittiObjectClass
        from d3d_tpu.models import (PointPillars, PointPillarsConfig,
                                    make_anchors)
        from d3d_tpu.models.inference import make_pointpillars_detector
        from d3d_tpu.models.pointpillars import pillarize
        from d3d_tpu.parallel import make_mesh
        from d3d_tpu.parallel.mesh import shard_inference

        cfg = PointPillarsConfig(
            bounds=(0.0, 16.0, -8.0, 8.0, -3.0, 1.0), grid=(32, 32),
            max_pillars=256, max_points_per_pillar=16, pfn_features=32,
            backbone_channels=(32,), backbone_blocks=(1,),
            upsample_channels=32)
        model = PointPillars(cfg)
        pts0 = np.stack([rng.uniform(0, 16, 1024), rng.uniform(-8, 8, 1024),
                         rng.uniform(-3, 1, 1024), rng.uniform(0, 1, 1024)],
                        axis=1).astype(np.float32)
        feats, coords, valid = pillarize(jnp.asarray(pts0), cfg)
        variables = model.init(jax.random.PRNGKey(0), feats[None],
                               coords[None], valid[None], train=False)
        detect = make_pointpillars_detector(
            model, variables, cfg, make_anchors(cfg),
            [KittiObjectClass.Car], top_k=16)

        mesh = make_mesh(8, dp=8, tp=1)
        batched = shard_inference(detect.device_fn, mesh)
        batch = np.stack([pts0 + np.float32(i) * 0.01 for i in range(8)])
        bb, bs, bl, bk = batched(batch)
        assert bb.shape[0] == 8
        for i in (0, 3, 7):
            wb, ws, wl, wk = detect.device_fn(jnp.asarray(batch[i]))
            np.testing.assert_allclose(np.asarray(bb[i]), np.asarray(wb),
                                       atol=1e-5, rtol=1e-5)
            np.testing.assert_array_equal(np.asarray(bk[i]), np.asarray(wk))
