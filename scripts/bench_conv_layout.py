"""NHWC vs NCHW conv-layout experiment for the BEV backbone shapes.

ROADMAP flagged the layout question as the unexplored train-step lever;
this times ``lax.conv_general_dilated`` forward and forward+backward at
the three PointPillars-KITTI stage shapes under both dimension-number
conventions on the current backend (bench.py methodology: chained device
loop, RTT subtracted). flax's default is NHWC; a consistent NCHW loss
here closes the question, a win says the backbone should transpose.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    b = args.batch
    reps = args.reps
    # (H, W, Cin, Cout, stride): the PointPillars-KITTI backbone stages
    stages = [(432, 496, 64, 64, 1), (216, 248, 64, 128, 2),
              (108, 124, 128, 256, 2)]
    print(f"device={jax.devices()[0].platform} batch={b} reps={reps} bf16")

    rng = np.random.default_rng(0)
    for h, w, cin, cout, s in stages:
        x_nhwc = jnp.asarray(rng.normal(0, 1, (b, h, w, cin)), jnp.bfloat16)
        k_hwio = jnp.asarray(rng.normal(0, 0.05, (3, 3, cin, cout)),
                             jnp.bfloat16)
        x_nchw = jnp.transpose(x_nhwc, (0, 3, 1, 2))
        k_oihw = jnp.transpose(k_hwio, (3, 2, 0, 1))

        def make(dn, x, k, grad):
            conv = lambda xx, kk: lax.conv_general_dilated(
                xx, kk, (s, s), "SAME", dimension_numbers=dn)
            if grad:
                f = jax.grad(lambda xx, kk: jnp.sum(
                    conv(xx, kk).astype(jnp.float32)), argnums=(0, 1))
                body_fn = lambda xx, kk: sum(
                    jnp.sum(g.astype(jnp.float32)) for g in f(xx, kk))
            else:
                body_fn = lambda xx, kk: jnp.sum(
                    conv(xx, kk).astype(jnp.float32))

            @jax.jit
            def loop(xx, kk):
                def body(_, carry):
                    chk, = carry
                    return (body_fn(xx + chk.astype(xx.dtype) * 1e-20, kk),)
                return lax.fori_loop(0, reps, body, (jnp.float32(0),))

            return lambda xx, kk: float(np.asarray(loop(xx, kk)[0]))

        for grad in (False, True):
            row = []
            for label, dn, x, k in (
                    ("NHWC", ("NHWC", "HWIO", "NHWC"), x_nhwc, k_hwio),
                    ("NCHW", ("NCHW", "OIHW", "NCHW"), x_nchw, k_oihw)):
                run = make(dn, x, k, grad)
                xs = [jax.block_until_ready(x + i * jnp.bfloat16(1e-6))
                      for i in range(4)]
                run(xs[3], k)
                ts = []
                for i in range(3):
                    t0 = time.perf_counter()
                    run(xs[i], k)
                    ts.append(time.perf_counter() - t0)
                trivial = jax.jit(lambda v: v + 1)
                float(np.asarray(trivial(jnp.float32(0))))
                rtts = []
                for i in range(3):
                    t0 = time.perf_counter()
                    float(np.asarray(trivial(jnp.float32(i))))
                    rtts.append(time.perf_counter() - t0)
                med = float(np.median(ts))
                ms = max(med - min(rtts), 0.5 * med) / reps * 1e3
                row.append(f"{label} {ms:8.3f} ms")
            tag = "fwd+bwd" if grad else "fwd    "
            print(f"{h}x{w} C{cin}->{cout}/s{s} {tag}: " + "   ".join(row),
                  flush=True)


if __name__ == "__main__":
    main()
