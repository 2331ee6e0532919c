"""Input-pipeline overlap demo: measure that host data work actually hides
behind device compute in the Trainer loop.

The reference has no training loop at all — users hand-roll one around the
devkit. d3d_tpu ships ``Trainer`` + ``prefetch`` (d3d_tpu/train.py), whose
design claims two overlap mechanisms:

1. ``prefetch(iterable)``: a daemon thread pulls the host iterator (disk
   reads, numpy augmentation — GIL-releasing work) into a bounded queue
   while the main thread drives the device.
2. async dispatch: the next batch's device-side prep is dispatched BEFORE
   the current step's result is fetched, so the transfer + prep program
   queue behind the running step on device.

This script measures both with a synthetic pipeline whose host cost is a
controlled ``time.sleep`` (models GIL-releasing IO) per batch:

  serial lower bound   = n_steps * (host_ms + step_ms)
  overlapped bound     = n_steps * max(host_ms, step_ms)

and reports measured wall-clock against both, plus the occupancy ratio
(device-busy time / wall-clock). On a healthy pipeline occupancy ~= 1 when
host_ms < step_ms.

Usage: python scripts/bench_overlap.py [--steps 30] [--host-ms 25] [--cpu]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def make_source(n_batches, host_ms, shape):
    """Host iterator with a fixed GIL-releasing cost per batch."""
    rng = np.random.default_rng(0)
    for _ in range(n_batches):
        time.sleep(host_ms * 1e-3)  # stands in for disk read + decode
        yield {"x": rng.standard_normal(shape, dtype=np.float32)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--host-ms", type=float, default=25.0)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from d3d_tpu.train import Trainer, prefetch

    shape = (8, args.dim)
    w = jnp.eye(args.dim) + 0.01

    @jax.jit
    def step_fn(params, batch_stats, opt_state, batch):
        h = batch["x"]
        for _ in range(args.layers):  # fixed-cost device work
            h = jnp.tanh(h @ params)
        loss = jnp.mean(h * h)
        return params, batch_stats, opt_state, {"loss": loss}

    # calibrate the pure device step (compile, then time a fetch-bounded run)
    out = step_fn(w, None, None, {"x": np.zeros(shape, np.float32)})
    float(np.asarray(out[3]["loss"]))
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        out = step_fn(w, None, None, {"x": np.zeros(shape, np.float32)})
    float(np.asarray(out[3]["loss"]))
    step_ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"device step: {step_ms:.2f} ms   host cost: {args.host_ms:.2f} ms"
          f"   ({args.steps} steps)")

    def run(wrapped, log_every):
        tr = Trainer(step_fn, log_every=log_every, log_fn=lambda *_: None)
        t0 = time.perf_counter()
        tr.run(w, None, None, wrapped, num_steps=args.steps)
        return time.perf_counter() - t0

    lb_serial = args.steps * (args.host_ms + step_ms) * 1e-3
    lb_overlap = args.steps * max(args.host_ms, step_ms) * 1e-3
    print(f"bounds: serial {lb_serial:.2f}s, fully-overlapped "
          f"{lb_overlap:.2f}s")

    # async cadence (metrics fetched rarely): async dispatch alone queues
    # the next step behind the running one, so the host sleep hides even
    # WITHOUT the prefetch thread
    async_s = run(make_source(args.steps, args.host_ms, shape), log_every=0)
    occ = args.steps * step_ms * 1e-3 / async_s
    print(f"async cadence, no prefetch thread: {async_s:.2f}s "
          f"(device occupancy {occ:.0%})")

    # sync cadence (metrics fetched EVERY step — eval-style loops): the
    # fetch barrier defeats async dispatch, so without the thread the host
    # cost serializes; prefetch() pre-pulls batches during device compute
    sync_serial_s = run(make_source(args.steps, args.host_ms, shape),
                        log_every=1)
    sync_prefetch_s = run(
        prefetch(make_source(args.steps, args.host_ms, shape), depth=2),
        log_every=1)
    occ = args.steps * step_ms * 1e-3 / sync_prefetch_s
    print(f"sync cadence, no prefetch thread:  {sync_serial_s:.2f}s")
    print(f"sync cadence, prefetch thread:     {sync_prefetch_s:.2f}s -> "
          f"{sync_serial_s / sync_prefetch_s:.2f}x, device occupancy "
          f"{occ:.0%}")


if __name__ == "__main__":
    main()
