"""Serving-latency benchmark: points -> Target3DArray end-to-end.

Times the REAL serving pipeline — ``make_pointpillars_detector(...)``'s
``device_fn`` (pillarize -> network -> top-k decode -> rotated NMS),
exactly what ships and what ``d3d_tpu.export`` serializes — across
serving configurations: f32 vs bf16 weights, BatchNorm folding on/off,
int8 weight-only quantization. The jitted device program loops REPS
times with a data dependence (verify-skill methodology: one RTT, no
hoisting, value-fetch barrier); host assembly
(`Target3DArray.from_columns`) is timed separately.

Usage: python scripts/bench_infer.py [--reps 32] [--cpu] [--quick]
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


def make_cloud(rng, cfg, n=120_000):
    xmin, xmax, ymin, ymax, zmin, zmax = cfg.bounds
    return np.stack([
        rng.uniform(xmin, xmax, n), rng.uniform(ymin, ymax, n),
        rng.uniform(zmin, zmax, n), rng.uniform(0, 1, n),
    ], axis=1).astype(np.float32)


def time_device(fn, args_list, reps):
    """Median wall time of fn over perturbed argument copies with a
    value-fetch completion barrier."""
    out = fn(*args_list[0])
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    ts = []
    for a in args_list[1:]:
        t0 = time.perf_counter()
        out = fn(*a)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / reps


def detector_loop_ms(pipeline, pts, reps, probes):
    """Shared timing harness for 4-output detector pipelines: fori_loop
    with a per-iteration checksum data dependence (no hoisting), probed
    over perturbed input copies, median per-rep milliseconds."""
    @jax.jit
    def looped(points):
        def body(_, carry):
            chk, = carry
            boxes, scores, labels, keep = pipeline(points + chk * 1e-20)
            chk = (jnp.sum(boxes[:4, 0].astype(jnp.float32))
                   + jnp.sum(scores[:4].astype(jnp.float32))
                   + jnp.sum(keep[:8])).astype(points.dtype)
            return (chk,)

        return lax.fori_loop(0, reps, body, (jnp.float32(0),))

    copies = [jnp.asarray(pts) + np.float32(i) * 1e-6
              for i in range(probes + 1)]
    return time_device(looped, [(c,) for c in copies], reps) * 1e3


def bench_pointpillars(rng, reps, probes, quick, dtype="float32",
                       fold=False, int8=False, family="pointpillars"):
    from dataclasses import replace

    from d3d_tpu.dataset.kitti.utils import KittiObjectClass
    from d3d_tpu.models import (SST, SSTConfig, PointPillars,
                                PointPillarsConfig, make_anchors, pillarize)
    from d3d_tpu.models.inference import make_pointpillars_detector
    from d3d_tpu.train import init_variables

    if family == "sst":
        from d3d_tpu.models.presets import sst_kitti

        cfg = sst_kitti(dtype=dtype) if not quick else SSTConfig(
            bounds=(0.0, 16.0, -8.0, 8.0, -3.0, 1.0), grid=(32, 32),
            max_pillars=256, max_points_per_pillar=16, pfn_features=32,
            window=8, capacity=16, depth=2, num_heads=2, neck_channels=32,
            dtype=dtype)
        model = SST(cfg)
    else:
        cfg = PointPillarsConfig() if not quick else PointPillarsConfig(
            bounds=(0.0, 16.0, -8.0, 8.0, -3.0, 1.0), grid=(32, 32),
            max_pillars=256, max_points_per_pillar=16, pfn_features=32,
            backbone_channels=(32, 64), backbone_blocks=(1, 1),
            upsample_channels=32)
        cfg = replace(cfg, dtype=dtype)
        model = PointPillars(cfg)
    pts = make_cloud(rng, cfg, 120_000 if not quick else 8_192)
    feats, coords, valid = pillarize(jnp.asarray(pts), cfg)
    variables = init_variables(model, jax.random.PRNGKey(0), feats[None],
                               coords[None], valid[None], train=False)
    if fold:
        from d3d_tpu.models.fold import fold_batchnorm

        variables = fold_batchnorm(variables)
    if int8:
        from d3d_tpu.quantize import dequantize_params, quantize_params

        qp = quantize_params(variables["params"])
        variables = dict(variables, params=dequantize_params(qp))

    # the REAL serving pipeline (what d3d_tpu.export serializes)
    detect = make_pointpillars_detector(
        model, variables, cfg, make_anchors(cfg), [KittiObjectClass.Car],
        score_threshold=0.3, top_k=100)
    pipeline = detect.device_fn
    ms = detector_loop_ms(pipeline, pts, reps, probes)

    # host assembly cost (from_columns fast path)
    from d3d_tpu.models.inference import _to_targets

    boxes, scores, labels, keep = pipeline(jnp.asarray(pts))
    b, s, l, k = (np.asarray(boxes), np.asarray(scores),
                  np.asarray(labels), np.asarray(keep))
    t0 = time.perf_counter()
    for _ in range(20):
        arr = _to_targets(b, s, l, k, [KittiObjectClass.Car],
                          "velo", 0, 0.3)
    host_ms = (time.perf_counter() - t0) / 20 * 1e3
    tag = f"dtype={dtype} fold={int(fold)} int8={int(int8)}"
    print(f"{family} {tag}: {ms:8.3f} ms/frame device "
          f"+ {host_ms:.3f} ms host assembly ({len(arr)} dets)")
    return ms


def bench_voxelnext(rng, reps, probes, quick, dtype="bfloat16"):
    """The fully-sparse serving pipeline (no dense canvas)."""
    from d3d_tpu.dataset.kitti.utils import KittiObjectClass
    from d3d_tpu.models import (VoxelNeXt, VoxelNeXtConfig,
                                make_voxelnext_detector,
                                voxelnext_voxelize)
    from d3d_tpu.train import init_variables

    cfg = VoxelNeXtConfig(dtype=dtype) if not quick else VoxelNeXtConfig(
        bounds=(0.0, 16.0, -8.0, 8.0, -3.0, 1.0), grid=(32, 32, 8),
        max_voxels=512, stage_channels=(8, 16, 32),
        stage_sites=(512, 256, 128), subm_per_stage=1, bev_sites=128,
        head_channels=16, top_k=16, dtype=dtype)
    pts = make_cloud(rng, cfg, 120_000 if not quick else 8_192)
    f, c, v = voxelnext_voxelize(jnp.asarray(pts), cfg)
    model = VoxelNeXt(cfg)
    variables = init_variables(model, jax.random.PRNGKey(0), f[None],
                               c[None], v[None], train=False)
    detect = make_voxelnext_detector(model, variables, cfg,
                                     [KittiObjectClass.Car],
                                     score_threshold=0.3)
    ms = detector_loop_ms(detect.device_fn, pts, reps, probes)
    print(f"voxelnext dtype={dtype}: {ms:8.3f} ms/frame device "
          f"(fully sparse)")
    return ms


def bench_fused_tracking(rng, reps, probes, quick):
    """Detector + device tracker as ONE program per frame."""
    from d3d_tpu.dataset.kitti.utils import KittiObjectClass
    from d3d_tpu.models import pillarize
    from d3d_tpu.models.centerpoint import CenterPoint, CenterPointConfig
    from d3d_tpu.models.inference import make_centerpoint_detector
    from d3d_tpu.models.pointpillars import PointPillarsConfig
    from d3d_tpu.tracking.device_tracker import make_tracking_step
    from d3d_tpu.train import init_variables

    cfg = CenterPointConfig(
        bounds=(0.0, 69.12, -39.68, 39.68, -3.0, 1.0),
        grid=(432, 496) if not quick else (64, 64),
        max_pillars=12000 if not quick else 512,
        max_points_per_pillar=32 if not quick else 16,
        pfn_features=64 if not quick else 32,
        backbone_channels=(64, 128) if not quick else (32, 64),
        backbone_blocks=(2, 2) if not quick else (1, 1),
        upsample_channels=64 if not quick else 32,
        head_channels=64 if not quick else 16, window=9,
        top_k=100 if not quick else 16,
        predict_velocity=True, dtype="bfloat16")
    pcfg = PointPillarsConfig(
        bounds=cfg.bounds, grid=cfg.grid, max_pillars=cfg.max_pillars,
        max_points_per_pillar=cfg.max_points_per_pillar,
        pfn_features=cfg.pfn_features, dtype=cfg.dtype)
    pts = make_cloud(rng, cfg, 120_000 if not quick else 8_192)
    f, c, v = pillarize(jnp.asarray(pts), pcfg)
    model = CenterPoint(cfg)
    variables = init_variables(model, jax.random.PRNGKey(0), f[None],
                               c[None], v[None])
    det = make_centerpoint_detector(model, variables, cfg, pcfg,
                                    [KittiObjectClass.Car],
                                    score_threshold=0.3)
    # untrained weights: gate at 0 so the association path does real work
    step = make_tracking_step(det.device_fn, thresholds=[2.0],
                              score_threshold=0.0)
    state0 = step.init()

    @jax.jit
    def looped(points, state):
        def body(_, carry):
            st, chk = carry
            st, out = step(st, points + chk * 1e-20, jnp.float32(0.1))
            chk = jnp.sum(st["boxes"][:4, 0]).astype(jnp.float32)
            return (st, chk)

        st, chk = lax.fori_loop(0, reps, body, (state, jnp.float32(0)))
        return chk

    copies = [(jnp.asarray(pts) + np.float32(i) * 1e-6, state0)
              for i in range(probes + 1)]
    ms = time_device(looped, copies, reps) * 1e3
    print(f"centerpoint+tracker fused: {ms:8.3f} ms/frame device "
          f"(detect+associate, zero host hops)")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=32)
    ap.add_argument("--probes", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0].platform} reps={args.reps}")
    base = bench_pointpillars(rng, args.reps, args.probes, args.quick)
    for kw in (dict(dtype="bfloat16"), dict(fold=True),
               dict(dtype="bfloat16", fold=True),
               dict(dtype="bfloat16", fold=True, int8=True)):
        bench_pointpillars(rng, args.reps, args.probes, args.quick, **kw)
    bench_pointpillars(rng, args.reps, args.probes, args.quick,
                       dtype="bfloat16", family="sst")
    bench_voxelnext(rng, args.reps, args.probes, args.quick)
    bench_fused_tracking(rng, args.reps, args.probes, args.quick)
    print(f"baseline f32: {base:.3f} ms/frame")


if __name__ == "__main__":
    main()
