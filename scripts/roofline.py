"""Roofline accounting for the headline kernels (round-3 VERDICT weak #5:
"no MFU/roofline accounting anywhere — 'fast' means 'faster than a weak
baseline', not 'near the hardware ceiling'").

For each workload this script:

  1. lowers + compiles it on the current backend and reads XLA's
     ``cost_analysis`` (flops, bytes accessed) — the compiler's own
     account of the work the generated program does;
  2. measures device time with bench.py's on-device-loop methodology
     (fori_loop with a data dependence, perturbed input copies against
     tunnel memoization, scalar-fetch completion barrier, RTT-subtracted);
  3. prints, per workload:
       - achieved bandwidth  = XLA bytes accessed / time, and its
         fraction of the v5e HBM peak (819 GB/s) — how close the program
         runs to saturating the memory system on the traffic it does;
       - speed-of-light time = min-traffic bound (read every input once +
         write every output once at HBM peak) — the floor no
         implementation can beat, independent of XLA's fusion choices;
         the measured/SoL ratio is the remaining ALGORITHMIC headroom
         (e.g. sort passes);
       - achieved FLOP/s and, for the MXU workloads, MFU vs the bf16
         peak (197 TFLOP/s; f32 runs on the MXU at ~1/2 that via
         bf16x3-style passes).

  The voxelize/IoU/NMS kernels are memory/latency-bound (the FLOP
  columns are tiny by design); the train step is the MXU workload where
  MFU is the meaningful number.

Peaks (TPU v5e, public): 197 bf16 TFLOP/s, 819 GB/s HBM.

Usage: python scripts/roofline.py [--cpu] [--quick]
Writes /tmp/roofline.json and prints an rst-ready table.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_PEAK = 819e9          # bytes/s, TPU v5e
MXU_PEAK_BF16 = 197e12    # FLOP/s, TPU v5e


def device_loop_ms(fn, args, reps, checksum):
    """bench.py methodology: loop fn on device inside one jit, perturbed
    copies, scalar-fetch barrier, min-RTT subtraction."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def loop(*a):
        def body(_, carry):
            chk, = carry
            out = fn(*jax.tree.map(
                lambda x: (x + chk.astype(x.dtype) * 1e-20)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, a))
            return (checksum(out).astype(jnp.float32),)

        return lax.fori_loop(0, reps, body, (jnp.float32(0),))

    def perturbed(i):
        return jax.tree.map(
            lambda x: x + np.float32(i) * 1e-6
            if np.issubdtype(np.asarray(x).dtype, np.floating) else x, args)

    copies = [jax.tree.map(jnp.asarray, perturbed(i)) for i in range(4)]
    for c in copies:
        jax.block_until_ready(c)

    float(np.asarray(loop(*copies[3])[0]))  # compile + warm
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(np.asarray(loop(*copies[i])[0]))
        ts.append(time.perf_counter() - t0)

    import jax.numpy as jnp2
    trivial = jax.jit(lambda x: x + 1)
    first = jax.tree.leaves(copies[0])[0]
    float(np.asarray(trivial(first)).ravel()[0])
    rtts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(np.asarray(trivial(jax.tree.leaves(copies[i])[0])).ravel()[0])
        rtts.append(time.perf_counter() - t0)
    med, rtt = float(np.median(ts)), min(rtts)
    return max(med - rtt, 0.5 * med) / reps * 1e3


def cost_of(fn, args):
    """XLA's own flops / bytes-accessed account of ONE invocation.

    Falls back to a CPU-backend lowering when the device plugin does not
    expose cost_analysis (flops are HLO-derived and platform-comparable;
    bytes-accessed reflects that backend's fusion and is marked so).
    """
    import jax

    def read(compiled):
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        out = dict(flops=float(ca.get("flops", float("nan"))),
                   bytes=float(ca.get("bytes accessed", float("nan"))))
        if not np.isfinite(out["flops"]) and not np.isfinite(out["bytes"]):
            raise ValueError("empty cost analysis")
        return out

    try:
        return read(jax.jit(fn).lower(*args).compile())
    except Exception:
        pass
    try:
        out = read(jax.jit(fn, backend="cpu").lower(*args).compile())
        out["cost_backend"] = "cpu-fallback"
        return out
    except Exception as e:
        return dict(flops=float("nan"), bytes=float("nan"),
                    error=str(e)[:100])


def min_traffic_bytes(args, outs):
    """Speed-of-light traffic: every input read once, every output written
    once."""
    import jax

    total = 0
    for x in jax.tree.leaves(args) + jax.tree.leaves(outs):
        total += np.prod(np.asarray(x).shape) * np.asarray(x).dtype.itemsize
    return float(total)


def workloads(quick):
    """Yields (name, fn, args, checksum, reps, kind)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(42)
    reps = 16 if quick else 64

    # ---- voxelizers (fixed-point + exact) at the bench frame
    from d3d_tpu.ops.voxel import voxelize_mean_fm, voxelize_mean_fm_exact
    n = 120_000
    pts = np.stack([rng.random(n) * 69.12, rng.random(n) * 79.36 - 39.68,
                    rng.random(n) * 4.0 - 3.0, rng.random(n)],
                   axis=1).astype(np.float32)
    fm = np.ascontiguousarray(pts.T)
    bounds = np.asarray([0.0, 69.12, -39.68, 39.68, -3.0, 1.0], np.float32)
    shape = (432, 496, 1)

    def vox_fm(p, b):
        return voxelize_mean_fm(p, shape, b, 16000)

    def vox_exact(p, b):
        return voxelize_mean_fm_exact(p, shape, b, 16000)

    def vox_chk(out):
        return (jnp.sum(out.aggregates[0, :8]) + jnp.sum(out.coords[:, 0])
                + out.nvoxels)

    yield ("voxelize_mean_fm 120k->16k", vox_fm, (fm, bounds), vox_chk,
           reps, "mem")
    yield ("voxelize_mean_fm_exact 120k->16k", vox_exact, (fm, bounds),
           vox_chk, reps, "mem")

    # ---- rotated-IoU matrix 512x512, f32 device path (Pallas tile kernel
    # on TPU, blocked SoA elsewhere) — the representation NMS/matching
    # actually consume.  The f64 `precise=True` host contract is timed as
    # its own row: it deliberately routes to the XLA f64 path (Mosaic has
    # no f64) and costs ~60x, which is why only host-parity protocols
    # request it.
    from d3d_tpu.ops import geometry_soa as GS
    from d3d_tpu.ops.box import box2d_iou
    nb = 512
    boxes = np.stack([rng.random(nb) * 60 + 4, rng.random(nb) * 70 - 35,
                      rng.random(nb) * 3 + 1.5, rng.random(nb) * 3 + 1.5,
                      rng.random(nb) * np.pi], axis=1).astype(np.float32)

    def iou_fn(b1, b2):
        return GS.rbox_iou_matrix(b1, b2)

    yield ("rbox IoU matrix 512x512 f32", iou_fn, (boxes, boxes.copy()),
           lambda o: jnp.sum(o[:8, :8]), reps, "vpu")

    def iou_f64_fn(b1, b2):
        return box2d_iou(b1, b2, method="rbox", precise=True)

    yield ("rbox IoU matrix 512x512 f64 precise", iou_f64_fn,
           (boxes, boxes.copy()), lambda o: jnp.sum(o[:8, :8]),
           max(4, reps // 4), "vpu")

    # ---- greedy NMS 512
    from d3d_tpu.ops.nms import nms2d
    scores = rng.random(nb).astype(np.float32)

    def nms_fn(b, s):
        return nms2d(b, s, iou_threshold=0.25, iou_method="rbox")

    yield ("rotated NMS 512", nms_fn, (boxes, scores),
           lambda o: jnp.sum(o[:32]), reps, "latency")

    # ---- PointPillars train step (bf16, b2, external targets): MXU MFU
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_train", os.path.join(os.path.dirname(__file__),
                                    "bench_train.py"))
    bt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bt)

    import optax
    from dataclasses import replace as dreplace
    from d3d_tpu.models.pointpillars import (PointPillars,
                                             PointPillarsConfig,
                                             make_anchors, make_train_step,
                                             prepare_targets)

    cfg = dreplace(PointPillarsConfig(), dtype="bfloat16")
    model = PointPillars(cfg)
    opt = optax.adam(2e-4)
    anchors = make_anchors(cfg)
    step = make_train_step(model, opt, cfg, anchors,
                           external_targets=True)
    nsteps = 5 if quick else 30

    # b2 is the flagship config; b8 is the full-sublane-tile batch where
    # the MXU fraction (and hence MFU) peaks — see the train ladder in
    # docs/performance.rst (b<8 gets space-to-batched convs)
    for b in ((2,) if quick else (2, 8)):
        batch = bt.make_batch(np.random.default_rng(0), cfg, b)
        variables = model.init(jax.random.PRNGKey(0), batch["features"],
                               batch["coords"], batch["valid"])
        opt_state = opt.init(variables["params"])
        prepped = jax.jit(lambda bch: prepare_targets(
            jnp.asarray(anchors), bch, cfg.pos_iou, cfg.neg_iou,
            num_classes=cfg.num_classes, dense=True))(batch)
        params, bs = variables["params"], variables.get("batch_stats", {})

        def train_fn(params, bs, opt_state, batch):
            return step(params, bs, opt_state, batch)

        def train_chk(out):
            p = jax.tree.leaves(out[0])[0]
            return jnp.sum(p[..., :1].astype(jnp.float32))

        # the generic device loop does not chain the train state between
        # iterations, which lets XLA drop parts of the optimizer update —
        # measure the train row with bench_train's chained fori_loop
        # instead (state as the carry, everything consumed) so ms/step
        # matches the steady-state training number
        def train_ms(params=params, bs=bs, opt_state=opt_state,
                     prepped=prepped):
            import time as _t

            @jax.jit
            def run(params, bs, opt_state, batch):
                def body(_, carry):
                    p, b, o, _ = carry
                    return step(p, b, o, batch)

                aux_shape = jax.eval_shape(step, params, bs, opt_state,
                                           batch)[3]
                init = (params, bs, opt_state,
                        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                     aux_shape))
                return jax.lax.fori_loop(0, nsteps, body, init)

            out = run(params, bs, opt_state, prepped)  # compile + warm
            float(np.asarray(jax.tree.leaves(out[0])[0]).ravel()[0])
            t0 = _t.perf_counter()
            out = run(params, bs, opt_state, prepped)
            float(np.asarray(jax.tree.leaves(out[0])[0]).ravel()[0])
            dt = _t.perf_counter() - t0
            trivial = jax.jit(lambda x: x + 1.0)
            float(np.asarray(trivial(jnp.float32(9.0))))
            rtts = []
            for i in range(3):
                t0 = _t.perf_counter()
                float(np.asarray(trivial(jnp.float32(i))))
                rtts.append(_t.perf_counter() - t0)
            return max(dt - min(rtts), 0.5 * dt) / nsteps * 1e3

        yield (f"PointPillars train step b{b} bf16 ext-targets", train_fn,
               (params, bs, opt_state, prepped), train_chk,
               4 if quick else 10, "mxu", train_ms)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    rows = []
    for name, fn, wargs, chk, reps, kind, *rest in workloads(args.quick):
        cost = cost_of(fn, wargs)
        outs = jax.eval_shape(fn, *jax.tree.map(np.asarray, wargs))
        sol_bytes = min_traffic_bytes(wargs, outs)
        ms = rest[0]() if rest else device_loop_ms(fn, wargs, reps, chk)
        t = ms * 1e-3
        row = dict(
            name=name, kind=kind, ms=round(ms, 4),
            xla_gb=round(cost["bytes"] / 1e9, 4)
            if np.isfinite(cost["bytes"]) else None,
            gflop=round(cost["flops"] / 1e9, 3)
            if np.isfinite(cost["flops"]) else None,
            achieved_gbps=round(cost["bytes"] / t / 1e9, 1)
            if np.isfinite(cost["bytes"]) else None,
            hbm_frac=round(cost["bytes"] / t / HBM_PEAK, 3)
            if np.isfinite(cost["bytes"]) else None,
            sol_us=round(sol_bytes / HBM_PEAK * 1e6, 2),
            sol_ratio=round(t / (sol_bytes / HBM_PEAK), 1),
            tflops=round(cost["flops"] / t / 1e12, 3)
            if np.isfinite(cost["flops"]) else None,
            mfu=round(cost["flops"] / t / MXU_PEAK_BF16, 4)
            if kind == "mxu" and np.isfinite(cost["flops"]) else None,
        )
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open("/tmp/roofline.json", "w") as f:
        json.dump(rows, f, indent=1)

    print("\nrst table:\n")
    hdr = ("workload", "ms", "XLA GB", "ach. GB/s", "HBM frac",
           "SoL us", "x SoL", "TFLOP/s", "MFU")
    print("  ".join(f"{h:>28s}" if i == 0 else f"{h:>10s}"
                    for i, h in enumerate(hdr)))
    for r in rows:
        vals = (r["name"][:28], r["ms"], r["xla_gb"], r["achieved_gbps"],
                r["hbm_frac"], r["sol_us"], r["sol_ratio"], r["tflops"],
                r["mfu"] if r["mfu"] is not None else "-")
        print("  ".join(f"{str(v):>28s}" if i == 0 else f"{str(v):>10s}"
                        for i, v in enumerate(vals)))


if __name__ == "__main__":
    main()
