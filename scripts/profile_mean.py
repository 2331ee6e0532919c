"""Bisect the voxelizer's mean-aggregation path on TPU."""
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


def parts(p, upto):
    b = bounds.reshape(3, 2)
    sh = jnp.asarray(shape, jnp.int32)
    vsize = (b[:, 1] - b[:, 0]) / sh
    scaled = (p[:, :3] - b[:, 0]) / vsize
    max_key = shape[0] * shape[1] * shape[2]
    idx = jnp.trunc(jnp.clip(scaled, -2e9, 2e9)).astype(jnp.int32)
    inr = jnp.all((idx >= 0) & (idx < sh), axis=1)
    key = (idx[:, 0] * shape[1] + idx[:, 1]) * shape[2] + idx[:, 2]
    key = jnp.where(inr, key, max_key + 1)
    s = V._segment_structure(key, max_key=max_key, order_mode="sorted")
    feats_s = p[s["order"]]
    if upto == "feats":
        return feats_s[0, 0]
    masked = jnp.where(s["valid_s"][:, None], feats_s, 0)
    csum = jnp.cumsum(masked, axis=0)
    if upto == "csum":
        return csum[-1, 0]
    startp = s["seg_start"][:max_voxels + 1]
    E = jnp.where((startp > 0)[:, None],
                  csum[jnp.maximum(startp - 1, 0), :], 0)
    if upto == "egather":
        return E[0, 0] + E[-1, -1]
    keep_v = s["seg_valid"][:max_voxels]
    npoints = jnp.where(keep_v, s["npoints_seg"][:max_voxels], 0)
    total = E[1:] - E[:-1]
    agg = total / jnp.maximum(npoints, 1)[:, None]
    agg = jnp.where(keep_v[:, None], agg, 0)
    return jnp.sum(agg[:8, 0])


for stage in ("feats", "csum", "egather", "agg"):
    print("%-8s: %7.3f ms" % (stage, timed(
        lambda c, p, st=stage: (parts(p + c * 1e-20, st)).astype(jnp.float32))))
