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
