"""Micro-costs of gather/sort/transpose variants on v5e — the data behind
the voxelizer's layout choices."""
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

n, v = 120_000, 16_000
rng = np.random.default_rng(0)
pts = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)
ptsT = jnp.asarray(np.asarray(pts).T)
ordr = jnp.asarray(rng.permutation(n).astype(np.int32))
idx16 = jnp.asarray(rng.integers(0, n, v).astype(np.int32))
key = jnp.asarray(rng.integers(0, 214_000, n).astype(np.int32))
REPS = 64


def timed(body, *args):
    @jax.jit
    def outer(*a):
        def it(_, c):
            return (body(c[0], *a),)
        return lax.fori_loop(0, REPS, it, (jnp.float32(0),))
    jax.block_until_ready(outer(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(outer(*args))
        ts.append(time.perf_counter() - t0)
    triv = jax.jit(lambda q: q + 1)
    jax.block_until_ready(triv(args[0]))
    t0 = time.perf_counter()
    jax.block_until_ready(triv(args[0]))
    rtt = time.perf_counter() - t0
    return max(np.median(ts) - rtt, 0) / REPS * 1e3


j = jnp.int32
print("row gather (n,4)[order]      : %.3f ms" % timed(
    lambda c, p, o: p[jnp.minimum(o, j(1 << 30) + c.astype(jnp.int32))][0, 0], pts, ordr))
print("row gather (n,4)[idx16k]     : %.3f ms" % timed(
    lambda c, p, o: p[jnp.minimum(o, j(1 << 30) + c.astype(jnp.int32))][0, 0], pts, idx16))
print("lane gather (4,n)[:,order]   : %.3f ms" % timed(
    lambda c, p, o: p[:, jnp.minimum(o, j(1 << 30) + c.astype(jnp.int32))][0, 0], ptsT, ordr))
print("lane gather (4,n)[:,idx16k]  : %.3f ms" % timed(
    lambda c, p, o: p[:, jnp.minimum(o, j(1 << 30) + c.astype(jnp.int32))][0, 0], ptsT, idx16))
print("1d gather (n,)[idx16k]       : %.3f ms" % timed(
    lambda c, p, o: p[jnp.minimum(o, j(1 << 30) + c.astype(jnp.int32))][0], ptsT[0], idx16))
print("transpose (n,4)->(4,n)       : %.3f ms" % timed(
    lambda c, p: (p + c * 1e-20).T[0, -1], pts))
print("2-op sort (i32 key, i32)     : %.3f ms" % timed(
    lambda c, k: lax.sort((jnp.minimum(k, j(1 << 30) + c.astype(jnp.int32)), jnp.arange(n, dtype=jnp.int32)),
                          num_keys=1, is_stable=True)[1][0].astype(jnp.float32),
    key))
print("6-op sort (key + idx + 4xf32): %.3f ms" % timed(
    lambda c, k, p: lax.sort(
        (jnp.minimum(k, j(1 << 30) + c.astype(jnp.int32)), jnp.arange(n, dtype=jnp.int32),
         p[:, 0], p[:, 1], p[:, 2], p[:, 3]),
        num_keys=1, is_stable=True)[2][0], key, pts))
