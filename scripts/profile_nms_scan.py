"""Compare greedy-NMS scan formulations on TPU (given a precomputed
overlap matrix): per-box fori_loop vs blocked cascade at several K."""
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

n = 512
rng = np.random.default_rng(0)
ov = jnp.asarray(rng.random((n, n)) < 0.05)
pre = jnp.zeros(n, bool)
REPS = 64


def scan_perbox(overlap, pre):
    def body(i, suppressed):
        alive = ~suppressed[i]
        later = jnp.arange(n, dtype=jnp.int32) > i
        return suppressed | (alive & later & overlap[i])
    return lax.fori_loop(0, n, body, pre)


def make_blocked(k):
    def scan(overlap, pre):
        karange = jnp.arange(k, dtype=jnp.int32)
        arange_n = jnp.arange(n, dtype=jnp.int32)

        def body(bi, suppressed):
            base = bi * k
            sub = lax.dynamic_slice(overlap, (base, base), (k, k))
            s = lax.dynamic_slice(suppressed, (base,), (k,))
            for i in range(k):
                s = s | (~s[i] & (karange > i) & sub[i])
            rows = lax.dynamic_slice(overlap, (base, 0), (k, n))
            later = arange_n[None, :] > (jnp.int32(base) + karange)[:, None]
            contrib = jnp.any(rows & ~s[:, None] & later, axis=0)
            return lax.dynamic_update_slice(suppressed, s, (base,)) | contrib
        return lax.fori_loop(0, n // k, body, pre)
    return scan


def timed(fn):
    @jax.jit
    def outer(overlap, pre):
        def it(_, carry):
            out = fn(overlap ^ carry[0], pre)
            return (out[-1] & out[0],)
        return lax.fori_loop(0, REPS, it, (jnp.zeros((), bool),))
    jax.block_until_ready(outer(ov, pre))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(outer(ov, pre))
        ts.append(time.perf_counter() - t0)
    triv = jax.jit(lambda x: ~x)
    jax.block_until_ready(triv(pre))
    t0 = time.perf_counter()
    jax.block_until_ready(triv(pre))
    rtt = time.perf_counter() - t0
    return max(np.median(ts) - rtt, 0) / REPS * 1e3


ref = np.asarray(scan_perbox(ov, pre))
for k in (8, 16, 32, 64):
    got = np.asarray(make_blocked(k)(ov, pre))
    assert np.array_equal(ref, got), f"k={k} mismatch"
print("all blocked variants match per-box scan")

print("per-box     : %.3f ms" % timed(scan_perbox))
for k in (8, 16, 32, 64):
    print("blocked k=%-2d: %.3f ms" % (k, timed(make_blocked(k))))
