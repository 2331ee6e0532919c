"""Sparse-conv (SECOND middle extractor) throughput at realistic shapes.

Times the per-cloud neighbor-map build (the geometry-dependent sort
machinery) and the per-layer submanifold conv apply (gather + MXU matmul)
at SECOND-KITTI scale: ~16k active sites, 3^3 kernel, C=16..64.

Methodology per .claude/skills/verify: loop the workload inside one jit
with a data dependence, fetch a checksum as the barrier, subtract the
minimum RTT probe (bench.py pattern).

Usage: python scripts/bench_sparse.py [--sites 16384] [--reps 20] [--cpu]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, *args, reps=5):
    """Median wall time of fn(*args) with a value-fetch barrier, minus the
    min round-trip of a trivial dispatch+fetch (the dev-TPU tunnel RTT
    otherwise dominates single-dispatch measurements; bench.py
    methodology)."""
    out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # compile+barrier
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))

    trivial = jax.jit(lambda x: x + 1.0)
    probes = [jnp.float32(i) for i in range(4)]
    float(np.asarray(trivial(probes[3])))  # compile
    rtts = []
    for p in probes[:3]:
        t0 = time.perf_counter()
        float(np.asarray(trivial(p)))
        rtts.append(time.perf_counter() - t0)
    return max(med - min(rtts), 0.5 * med)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sites", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dense-canvas", action="store_true",
                    help="also time the dense-canvas strategy (measured "
                         "3.7-7.9 s/layer on v5e — ~45 s+ per row; "
                         "off by default so the revalidate step fits "
                         "its budget)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from d3d_tpu.ops.sparse_conv import (build_neighbor_map,
                                         downsample_coords,
                                         subm_conv_apply)

    grid = (352, 400, 20)  # SECOND-KITTI input grid (model/second.py cfg)
    n = args.sites
    rng = np.random.default_rng(0)
    # unique random active sites
    flat = rng.choice(grid[0] * grid[1] * grid[2], size=n, replace=False)
    coords = np.stack([flat // (grid[1] * grid[2]),
                       (flat // grid[2]) % grid[1],
                       flat % grid[2]], axis=1).astype(np.int32)
    valid = np.ones(n, bool)
    coords_j = jnp.asarray(coords)
    valid_j = jnp.asarray(valid)
    print(f"sites={n} grid={grid} kernel=3^3 "
          f"device={jax.devices()[0].platform}")

    t = timed(lambda c, v: build_neighbor_map(c, v, grid), coords_j, valid_j,
              reps=args.reps)
    print(f"build_neighbor_map:        {t * 1e3:8.3f} ms")

    nbr = build_neighbor_map(coords_j, valid_j, grid)
    frac = float((np.asarray(nbr) >= 0).mean())
    print(f"  neighbor occupancy: {frac:.3f}")

    t = timed(lambda c, v: downsample_coords(c, v, grid, 2, n), coords_j,
              valid_j, reps=args.reps)
    print(f"downsample_coords:         {t * 1e3:8.3f} ms")

    on_tpu = jax.default_backend() == "tpu"
    for c_in, c_out in ((16, 16), (32, 32), (64, 64)):
        feats = jnp.asarray(rng.normal(0, 1, (n, c_in)), jnp.float32)
        w = jnp.asarray(rng.normal(0, 0.1, (27, c_in, c_out)), jnp.float32)

        def make_loop(symmetric):
            # a fresh closure per variant -> its own trace, so the
            # D3D_TPU_FUSED_SPCONV env read at trace time sticks
            @jax.jit
            def loop(f, nbr, w, v, reps=32):
                def body(i, x):
                    y = subm_conv_apply(x, nbr, w, v, symmetric=symmetric)
                    return y / (jnp.max(jnp.abs(y)) + 1e-6)

                return lax.fori_loop(0, reps, body, f)

            return loop

        from d3d_tpu.ops.sparse_conv import _FUSED_VMEM_BUDGET

        fused_eligible = (on_tpu
                          and n * 4 * (3 * c_in + c_out)
                          <= _FUSED_VMEM_BUDGET)
        # default dispatch is the XLA gather+einsum path (the fused Pallas
        # kernel's lane gather has no Mosaic lowering at realistic N — see
        # sparse_conv._fused_enabled)
        t = timed(make_loop(True), feats, nbr, w, valid_j, reps=args.reps)
        line = f"subm_conv_apply C{c_in:>2}->{c_out:<3}: {t / 32 * 1e3:8.3f} " \
               f"ms/layer (xla-gather)"
        # one rejection record is enough — each attempt costs a full
        # (failing) Mosaic remote-compile round on the tunnel
        if on_tpu and fused_eligible and c_in == 16:
            # attempt the opt-in fused kernel; Mosaic is expected to
            # reject it ("Multiple source vregs along gather dimension")
            os.environ["D3D_TPU_FUSED_SPCONV"] = "1"
            try:
                t_fused = timed(make_loop(False), feats, nbr, w, valid_j,
                                reps=args.reps)
                line += (f"   (fused {t_fused / 32 * 1e3:8.3f} ms, "
                         f"{t / max(t_fused, 1e-9):.2f}x vs xla)")
            except Exception as e:
                line += f"   (fused: Mosaic rejection — {str(e)[:60]})"
            finally:
                os.environ.pop("D3D_TPU_FUSED_SPCONV", None)
        print(line)

        # the dense-canvas strategy (models/second.dense_stage_loop):
        # same submanifold conv as one masked dense 3D conv. Round-4 v5e
        # verdict: 3668 / 7933 ms/layer at C16/C32 vs 2.3 / 3.9 ms for
        # the gather+einsum — XLA's 5D-conv lowering at few-lane channel
        # counts never approaches the MXU roofline, so SECONDConfig
        # "auto" now always picks sparse and these rows are opt-in.
        if not (args.dense_canvas and on_tpu):
            # the dense rows are TPU-only (see below): skip the ~0.7 GB
            # canvas/mask allocation too on other backends
            continue
        mask3 = jnp.zeros(grid, bool).at[coords_j[:, 0], coords_j[:, 1],
                                         coords_j[:, 2]].set(valid_j)
        canvas0 = jnp.zeros(grid + (c_in,), jnp.float32)
        canvas0 = canvas0.at[coords_j[:, 0], coords_j[:, 1],
                             coords_j[:, 2]].set(feats * valid_j[:, None])

        # On TPU the full-grid dense conv is 3.7-7.9 s/layer (round-4
        # measurement, same as the header comment) — 32 inner reps x 10
        # outer blows the revalidate step budget, and the number only
        # needs ~3 significant figures to show the ~1000x gap. Shrink the
        # loop there. On CPU the full-grid 3D conv takes minutes/layer —
        # skip it entirely (gated above).
        d_inner = 4
        d_outer = 3

        @jax.jit
        def dense_loop(canvas, mask, w, reps=d_inner):
            kern = w.reshape(3, 3, 3, c_in, c_out)

            def body(i, x):
                y = lax.conv_general_dilated(
                    x[None], kern, (1, 1, 1), ((1, 1),) * 3,
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]
                y = y * mask[..., None]
                return y / (jnp.max(jnp.abs(y)) + 1e-6)

            return lax.fori_loop(0, reps, body, canvas)

        if c_in == c_out and on_tpu:
            t_d = timed(dense_loop, canvas0, mask3.astype(jnp.float32),
                        jnp.asarray(w), reps=d_outer)
            print(f"  dense-canvas C{c_in:>2}->{c_out:<3}: "
                  f"{t_d / d_inner * 1e3:8.3f} ms/layer "
                  f"({t / 32 / max(t_d / d_inner, 1e-9):.2f}x vs xla-gather)")


if __name__ == "__main__":
    main()
