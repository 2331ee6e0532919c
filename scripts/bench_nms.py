"""NMS cascade benchmark across box counts (run on the TPU).

Times three things per size on the reference-harness box distribution:

  * ``nms2d`` end-to-end (IoU matrix + cascade — the public op),
  * the sequential-grid ``nms_scan`` kernel alone,
  * the block-parallel ``nms_scan_blocked`` kernel alone
    (reference d3d/box/nms_cuda.cu:16-106 decomposition),

using the bench.py methodology (device loop with a consumed checksum,
tunnel RTT subtracted). Decides the production dispatch cutover between
the two kernels (ops/nms.py).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench_riou_sweep import make_boxes


def device_time_ms(run_loop, warm_args, timed_args, reps):
    import jax
    import jax.numpy as jnp

    run_loop(*warm_args)  # compile + warmup
    times = []
    for a in timed_args:
        t0 = time.perf_counter()
        run_loop(*a)
        times.append(time.perf_counter() - t0)

    trivial = jax.jit(lambda x: x + 1)
    float(np.asarray(trivial(jnp.float32(1))))
    rtts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(np.asarray(trivial(jnp.float32(i))))
        rtts.append(time.perf_counter() - t0)
    med, rtt = float(np.median(times)), min(rtts)
    return max(med - rtt, 0.5 * med) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*",
                    default=[512, 1000, 2000, 5000])
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

    from d3d_tpu.ops.nms import nms2d
    from d3d_tpu.ops.nms_pallas import nms_scan, nms_scan_blocked

    on_tpu = jax.default_backend() == "tpu"
    print(f"device={jax.devices()[0].platform} reps={args.reps}")
    rng = np.random.default_rng(0)
    reps = args.reps

    for n in args.sizes:
        boxes = jnp.asarray(make_boxes(rng, n))
        scores = jnp.asarray(rng.random(n).astype(np.float32))

        @jax.jit
        def e2e_loop(b, s):
            def body(_, carry):
                chk, = carry
                sup = nms2d(b + chk * 1e-20, s, iou_threshold=0.1)
                return (jnp.sum(sup.astype(jnp.float32)),)
            return lax.fori_loop(0, reps, body, (jnp.float32(0),))

        def run_e2e(b, s):
            return float(np.asarray(e2e_loop(b, s)[0]))

        variants = [(boxes + i * 1e-6, scores) for i in range(4)]
        ms = device_time_ms(run_e2e, variants[3], variants[:3], reps)
        print(f"n={n:5d} nms2d end-to-end     {ms:9.3f} ms", flush=True)

        # the cascades alone, on a fixed random overlap structure
        ovh = rng.random((n, n)) < (8.0 / n)
        ovh = ovh | ovh.T
        ov = jnp.asarray(ovh)
        pre = jnp.asarray(rng.random(n) < 0.1)
        for label, kern in (("nms_scan (serial grid)", nms_scan),
                            ("nms_scan_blocked", nms_scan_blocked)):
            if not on_tpu:
                continue  # Mosaic kernels need the chip

            @jax.jit
            def scan_loop(o, p):
                def body(_, carry):
                    chk, = carry
                    sup = kern(o ^ (chk > jnp.int32(reps + 1)), p)
                    # dtype pinned: x64 is on, jnp.sum(int32) promotes
                    # the accumulator to int64 and breaks the scan carry
                    return (jnp.sum(sup, dtype=jnp.int32),)
                return lax.fori_loop(0, reps, body, (jnp.int32(0),))

            def run_scan(o, p):
                return float(np.asarray(scan_loop(o, p)[0]))

            ovs = [jnp.asarray(ovh ^ (rng.random((n, n)) < 0.001))
                   for _ in range(4)]
            ms = device_time_ms(run_scan, (ovs[3], pre),
                                [(o, pre) for o in ovs[:3]], reps)
            print(f"n={n:5d} {label:22s} {ms:9.3f} ms", flush=True)


if __name__ == "__main__":
    main()
