"""Stage-by-stage device-time breakdown of voxelize_dense_padded on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from d3d_tpu.ops import voxel as V

rng = np.random.default_rng(42)
n = 120_000
pts = np.stack([
    rng.random(n) * 69.12,
    rng.random(n) * 79.36 - 39.68,
    rng.random(n) * 4.0 - 3.0,
    rng.random(n),
], axis=1).astype(np.float32)
jpts = jnp.asarray(pts)

shape = (432, 496, 1)
bounds = jnp.asarray([0.0, 69.12, -39.68, 39.68, -3.0, 1.0], jnp.float32)
max_points, max_voxels = 32, 16000
REPS = 64


def timed(body):
    @jax.jit
    def outer(p):
        def it(_, carry):
            return (body(carry[0], p),)
        return lax.fori_loop(0, REPS, it, (jnp.float32(0),))
    jax.block_until_ready(outer(jpts))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(outer(jpts))
        ts.append(time.perf_counter() - t0)
    trivial = jax.jit(lambda x: x + 1)
    jax.block_until_ready(trivial(jpts))
    t0 = time.perf_counter()
    jax.block_until_ready(trivial(jpts))
    rtt = time.perf_counter() - t0
    return max(np.median(ts) - rtt, 0) / REPS * 1e3


def make_key(p):
    b = bounds.reshape(3, 2)
    sh = jnp.asarray(shape)
    vsize = (b[:, 1] - b[:, 0]) / sh
    idx = jnp.trunc((p[:, :3] - b[:, 0]) / vsize).astype(jnp.int64)
    inr = jnp.all((idx >= 0) & (idx < sh), axis=1)
    key = (idx[:, 0] * shape[1] + idx[:, 1]) * shape[2] + idx[:, 2]
    return jnp.where(inr, key, V._INT_SENTINEL)


def stage_sort(chk, p):
    key = make_key(p + chk * 1e-20)
    capped = jnp.minimum(key, shape[0] * shape[1] * shape[2] + 1)
    packed = jnp.sort(capped * n + jnp.arange(n))
    return (packed[0] % 97).astype(jnp.float32)


def stage_struct(chk, p):
    key = make_key(p + chk * 1e-20)
    s = V._segment_structure(key, max_key=shape[0] * shape[1] * shape[2],
                             order_mode="sorted")
    return (s["seg_start"][0] + s["npoints_seg"][0] + s["nvoxels"]
            ).astype(jnp.float32)


def stage_gfeats(chk, p):
    key = make_key(p + chk * 1e-20)
    s = V._segment_structure(key, max_key=shape[0] * shape[1] * shape[2],
                             order_mode="sorted")
    feats_s = p[s["order"]]
    return (feats_s[0, 0] + s["seg_start"][0]).astype(jnp.float32)


def make_stage_full(reduction, with_voxels=True):
    def stage(chk, p):
        out = V.voxelize_dense_padded(p + chk * 1e-20, shape, bounds,
                                      max_points, max_voxels, reduction,
                                      order_mode="sorted")
        acc = out.coords[0].sum() + out.nvoxels
        if with_voxels:
            acc = acc + out.voxels[0, 0, 0] + out.voxel_npoints[0]
        if reduction != "none":
            acc = acc + out.aggregates[0, 0]
        return acc.astype(jnp.float32)
    return stage


def stage_coords(chk, p):
    out = V.voxelize_dense_padded(p + chk * 1e-20, shape, bounds,
                                  max_points, max_voxels, "none",
                                  order_mode="sorted")
    return (out.coords[0].sum() + out.nvoxels).astype(jnp.float32)


def stage_bench(chk, p):
    # exactly what bench.py consumes: aggregates + coords + nvoxels
    out = V.voxelize_dense_padded(p + chk * 1e-20, shape, bounds,
                                  max_points, max_voxels, "mean",
                                  order_mode="sorted")
    return (jnp.sum(out.aggregates[:8, 0]) + jnp.sum(out.coords[0])
            + out.nvoxels).astype(jnp.float32)


def stage_npoints(chk, p):
    out = V.voxelize_dense_padded(p + chk * 1e-20, shape, bounds,
                                  max_points, max_voxels, "none",
                                  order_mode="sorted")
    return (out.voxel_npoints[0] + out.nvoxels).astype(jnp.float32)


print(f"key+sort        : {timed(stage_sort):7.3f} ms")
print(f"+segment struct : {timed(stage_struct):7.3f} ms")
print(f"+feats gather   : {timed(stage_gfeats):7.3f} ms")
print(f"coords+nvoxels  : {timed(stage_coords):7.3f} ms")
print(f"npoints+nvoxels : {timed(stage_npoints):7.3f} ms")
print(f"bench view      : {timed(stage_bench):7.3f} ms")
print(f"full, none      : {timed(make_stage_full('none')):7.3f} ms")
print(f"full, mean      : {timed(make_stage_full('mean')):7.3f} ms")
print(f"full, max       : {timed(make_stage_full('max')):7.3f} ms")
