"""Per-component device-time breakdown of the bench pipeline (real TPU).

Methodology per .claude/skills/verify/SKILL.md: loop each component on
device inside one jit with a data dependence, subtract trivial-jit RTT.
"""
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

from d3d_tpu.ops.voxel import voxelize_dense_padded
from d3d_tpu.ops.nms import nms2d
from d3d_tpu.ops import geometry_soa as GS

rng = np.random.default_rng(42)
n = 120_000
pts = np.stack([
    rng.random(n) * 69.12,
    rng.random(n) * 79.36 - 39.68,
    rng.random(n) * 4.0 - 3.0,
    rng.random(n),
], axis=1).astype(np.float32)
nboxes = 512
boxes = np.stack([
    rng.random(nboxes) * 60 + 4,
    rng.random(nboxes) * 70 - 35,
    rng.random(nboxes) * 3 + 1.5,
    rng.random(nboxes) * 3 + 1.5,
    rng.random(nboxes) * np.pi,
], axis=1).astype(np.float32)
scores = rng.random(nboxes).astype(np.float32)

shape = (432, 496, 1)
bounds = jnp.asarray([0.0, 69.12, -39.68, 39.68, -3.0, 1.0], jnp.float32)
REPS = 64


def timed(fn, *args):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    trivial = jax.jit(lambda x: x + 1)
    jax.block_until_ready(trivial(args[0]))
    t0 = time.perf_counter()
    jax.block_until_ready(trivial(args[0]))
    rtt = time.perf_counter() - t0
    return max(np.median(ts) - rtt, 0) / REPS * 1e3


def loop(body, seed):
    def outer(*args):
        def it(_, carry):
            return (body(carry[0], *args),)
        return lax.fori_loop(0, REPS, it, (seed,))
    return outer


jpts, jboxes, jscores = jnp.asarray(pts), jnp.asarray(boxes), jnp.asarray(scores)

# 1. IoU matrix alone (XLA SoA path and the dispatcher, which picks the
# Pallas tile kernel on TPU)
def iou_xla_body(chk, b):
    m = GS._rbox_iou_matrix_xla(b + chk * 1e-20, b)
    return jnp.sum(m[0]).astype(jnp.float32)
t_iou_xla = timed(loop(iou_xla_body, jnp.float32(0)), jboxes)

def iou_body(chk, b):
    m = GS.rbox_iou_matrix(b + chk * 1e-20, b)
    return jnp.sum(m[0]).astype(jnp.float32)
t_iou = timed(loop(iou_body, jnp.float32(0)), jboxes)

# 2. full NMS
def nms_body(chk, b, s):
    keep = nms2d(b + chk * 1e-20, s, iou_threshold=0.25, iou_method="rbox")
    return jnp.sum(keep[:8]).astype(jnp.float32)
t_nms = timed(loop(nms_body, jnp.float32(0)), jboxes, jscores)

# 3. voxelize alone
def vox_body(chk, p):
    vox = voxelize_dense_padded(p + chk * 1e-20, shape, bounds, 32, 16000,
                                "mean", order_mode="sorted")
    return (jnp.sum(vox.aggregates[:8, 0]) + jnp.sum(vox.coords[0])
            + vox.nvoxels).astype(jnp.float32)
t_vox = timed(loop(vox_body, jnp.float32(0)), jpts)

# 4. sort alone (the voxelizer's backbone)
def sort_body(chk, p):
    key = (p[:, 0] + chk * 1e-20).astype(jnp.int32)
    packed = key.astype(jnp.int64) * n + jnp.arange(n, dtype=jnp.int64)
    s = jnp.sort(packed)
    return (s[0] % 1000).astype(jnp.float32)
t_sort = timed(loop(sort_body, jnp.float32(0)), jpts)

print(f"iou xla     : {t_iou_xla:7.3f} ms")
print(f"iou 512x512 : {t_iou:7.3f} ms")
print(f"nms full    : {t_nms:7.3f} ms")
print(f"voxelize    : {t_vox:7.3f} ms")
print(f"sort 120k   : {t_sort:7.3f} ms")
print(f"sum nms+vox : {t_nms + t_vox:7.3f} ms")
