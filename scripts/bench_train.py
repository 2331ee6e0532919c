"""Train-throughput benchmark: PointPillars at KITTI scale on one chip.

Measures steps/s of the full jitted train step (pillar encoder -> BEV
scatter -> conv backbone -> SSD head -> loss -> adam update) by looping N
steps inside ONE jitted lax.fori_loop with the train state as the carry
(so the tunnel RTT is paid once and nothing can be hoisted), following the
methodology in .claude/skills/verify/SKILL.md.

Sweeps dtype (f32 / bf16) x remat (off / on) x batch size.

Usage: python scripts/bench_train.py [--steps 30] [--cpu] [--quick]
"""

import argparse
import os
import sys
import time
from dataclasses import replace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def make_batch(rng, cfg, b, npts=120000, m=16):
    from d3d_tpu.models.pointpillars import pillarize

    pts = np.stack([np.stack([
        rng.uniform(cfg.bounds[0], cfg.bounds[1], npts),
        rng.uniform(cfg.bounds[2], cfg.bounds[3], npts),
        rng.uniform(cfg.bounds[4], cfg.bounds[5], npts),
        rng.uniform(0, 1, npts)], axis=1)
        for _ in range(b)]).astype(np.float32)
    feats, coords, valid = jax.vmap(
        lambda p: pillarize(p, cfg))(jnp.asarray(pts))
    gt = np.stack([np.stack([
        rng.uniform(5, 60, m), rng.uniform(-30, 30, m), np.full(m, -1.0),
        np.full(m, 3.9), np.full(m, 1.6), np.full(m, 1.56),
        rng.uniform(-np.pi / 2, np.pi / 2, m)], axis=1)
        for _ in range(b)]).astype(np.float32)
    return dict(features=feats, coords=coords, valid=valid,
                gt_boxes=jnp.asarray(gt),
                gt_labels=jnp.zeros((b, m), jnp.int32),
                gt_mask=jnp.ones((b, m), bool))


def bench_config(rng, dtype, remat, b, nsteps, ext_targets=False, repeat=1):
    import optax
    from d3d_tpu.models.pointpillars import (PointPillars,
                                             PointPillarsConfig,
                                             make_anchors, make_train_step,
                                             prepare_targets)
    from d3d_tpu.train import repeat_batch_step

    cfg = replace(PointPillarsConfig(), dtype=dtype)
    batch = make_batch(rng, cfg, b)
    model = PointPillars(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch["features"],
                           batch["coords"], batch["valid"])
    opt = optax.adam(2e-4)
    opt_state = opt.init(variables["params"])
    anchors = make_anchors(cfg)
    step = make_train_step(model, opt, cfg, anchors, remat=remat,
                           external_targets=ext_targets)
    step = repeat_batch_step(step, repeat)
    if ext_targets:
        prep = jax.jit(lambda bt: prepare_targets(
            jnp.asarray(anchors), bt, cfg.pos_iou, cfg.neg_iou,
            num_classes=cfg.num_classes, dense=True))
        raw = dict(batch)
        prepped = prep(raw)  # compile
        float(np.asarray(prepped["targets"]["posf"]).sum())
        # perturb the raw batch (same pytree!) to defeat tunnel memoization
        t0 = time.perf_counter()
        prepped = prep(dict(raw, gt_boxes=raw["gt_boxes"] + 1e-6))
        float(np.asarray(prepped["targets"]["posf"]).sum())
        prep_ms = (time.perf_counter() - t0) * 1e3
        print(f"  target-prep (per batch, overlappable): {prep_ms:.1f} ms")
        batch = prepped

    sps, loss = _time_steps(step, variables, opt_state, batch, nsteps)
    tag = " ext-tgt" if ext_targets else ""
    if repeat > 1:
        tag += f" x{repeat}-tiled"
    print(f"dtype={dtype:9s} remat={int(remat)} batch={b}{tag}: "
          f"{sps:6.2f} steps/s  {sps * b:6.2f} frames/s  "
          f"({1e3 / sps:.1f} ms/step, loss {loss:.3f})")
    return sps


def _time_steps(step, variables, opt_state, batch, nsteps):
    """Median device ms/step of a jitted train step: chain the state
    through one lax.fori_loop (nothing hoistable), subtract the tunnel
    RTT, fetch a value as the completion barrier."""
    import jax.numpy as jnp

    @jax.jit
    def run(params, bs, opt_state, batch):
        def body(_, carry):
            params, bs, opt_state, _ = carry
            return step(params, bs, opt_state, batch)
        aux_shape = jax.eval_shape(step, params, bs, opt_state, batch)[3]
        init = (params, bs, opt_state,
                jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                             aux_shape))
        return jax.lax.fori_loop(0, nsteps, body, init)

    # compile + warmup (fetch a value: the only reliable barrier)
    out = run(variables["params"], variables["batch_stats"], opt_state, batch)
    float(np.asarray(out[3]["total"]))
    t0 = time.perf_counter()
    out = run(variables["params"], variables["batch_stats"], opt_state, batch)
    loss = float(np.asarray(out[3]["total"]))
    dt = time.perf_counter() - t0
    assert np.isfinite(loss), loss
    # one tunnel round-trip rides on the whole run call; subtract the min
    # of a few trivial dispatch+fetch probes (perturbed against the
    # tunnel's (executable, args) memoization) so ms/step is device time
    trivial = jax.jit(lambda x: x + 1.0)
    float(np.asarray(trivial(jnp.float32(9.0))))  # compile
    rtts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(np.asarray(trivial(jnp.float32(i))))
        rtts.append(time.perf_counter() - t0)
    dt = max(dt - min(rtts), 0.5 * dt)
    return nsteps / dt, loss


def _sparse_clouds(rng, cfg, b, npts=120000):
    return np.stack([np.stack([
        rng.uniform(cfg.bounds[0], cfg.bounds[1], npts),
        rng.uniform(cfg.bounds[2], cfg.bounds[3], npts),
        rng.uniform(cfg.bounds[4], cfg.bounds[5], npts),
        rng.uniform(0, 1, npts)], axis=1)
        for _ in range(b)]).astype(np.float32)


def bench_sparse_family(rng, model_name, dtype, b, nsteps, m=16):
    """Full train step of a sparse-middle-extractor family (SECOND at the
    KITTI preset, VoxelNeXt at the nuScenes preset) — the families whose
    backbone runs on active-site lists instead of a dense BEV canvas."""
    import optax
    from d3d_tpu.models import presets

    if model_name == "second":
        from d3d_tpu.models.second import (SECOND, head_config,
                                           make_train_step, second_voxelize)
        from d3d_tpu.models.pointpillars import make_anchors

        cfg = presets.second_kitti(dtype=dtype)
        print(f"  [{model_name}] voxelizing (compile)...", flush=True)
        feats, coords, valid = jax.vmap(
            lambda p: second_voxelize(p, cfg))(
                jnp.asarray(_sparse_clouds(rng, cfg, b)))
        model = SECOND(cfg)
        num_classes = cfg.num_classes
        make_step = lambda mdl, opt: make_train_step(
            mdl, opt, cfg, make_anchors(head_config(cfg)))
    elif model_name == "voxelnext":
        from d3d_tpu.models.voxelnext import (VoxelNeXt, make_train_step,
                                              voxelnext_voxelize)

        cfg = presets.voxelnext_nuscenes(dtype=dtype)
        print(f"  [{model_name}] voxelizing (compile)...", flush=True)
        feats, coords, valid = jax.vmap(
            lambda p: voxelnext_voxelize(p, cfg))(
                jnp.asarray(_sparse_clouds(rng, cfg, b)))
        model = VoxelNeXt(cfg)
        num_classes = cfg.num_classes
        make_step = lambda mdl, opt: make_train_step(mdl, opt, cfg)
    else:
        raise ValueError(model_name)

    gt = np.stack([np.stack([
        rng.uniform(cfg.bounds[0] + 5, cfg.bounds[1] - 5, m),
        rng.uniform(cfg.bounds[2] + 5, cfg.bounds[3] - 5, m),
        np.full(m, -1.0), np.full(m, 3.9), np.full(m, 1.6),
        np.full(m, 1.56), rng.uniform(-np.pi / 2, np.pi / 2, m)], axis=1)
        for _ in range(b)]).astype(np.float32)
    batch = dict(features=feats, coords=coords, valid=valid,
                 gt_boxes=jnp.asarray(gt),
                 gt_labels=jnp.asarray(
                     rng.integers(0, num_classes, (b, m)), jnp.int32),
                 gt_mask=jnp.ones((b, m), bool))

    print(f"  [{model_name}] init + train-step compile...", flush=True)
    variables = model.init(jax.random.PRNGKey(0), batch["features"],
                           batch["coords"], batch["valid"])
    opt = optax.adam(2e-4)
    opt_state = opt.init(variables["params"])
    step = make_step(model, opt)
    sps, loss = _time_steps(step, variables, opt_state, batch, nsteps)
    print(f"{model_name:10s} dtype={dtype:9s} batch={b}: "
          f"{sps:6.2f} steps/s  {sps * b:6.2f} frames/s  "
          f"({1e3 / sps:.1f} ms/step, loss {loss:.3f})")
    return sps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true",
                    help="only the bf16+remat flagship config")
    ap.add_argument("--scaling", action="store_true",
                    help="batch-scaling ladder: bf16 ext-targets at "
                         "b2/b4/b8 only (the MFU story)")
    ap.add_argument("--batch", type=int, default=None,
                    help="single bf16 ext-targets config at this batch "
                         "size (re-measure one ladder point cleanly)")
    ap.add_argument("--repeat", type=int, default=1,
                    help="tile the batch Nx inside the step "
                         "(train.repeat_batch_step — the v5e sub-sublane "
                         "batch workaround; gradients identical)")
    ap.add_argument("--model", default="pointpillars",
                    choices=("pointpillars", "second", "voxelnext"),
                    help="second/voxelnext: sparse-family train steps "
                         "(bf16, b1+b2) instead of the PointPillars sweep")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    rng = np.random.default_rng(0)
    if args.model != "pointpillars":
        print(f"device={jax.devices()[0].platform} steps/loop={args.steps} "
              f"model={args.model} (120k pts/frame)")
        for b in (1, 2):
            bench_sparse_family(rng, args.model, "bfloat16", b, args.steps)
        return
    print(f"device={jax.devices()[0].platform} steps/loop={args.steps} "
          f"(KITTI-scale: 432x496 grid, 12k pillars, 120k pts/frame)")
    if args.quick:
        bench_config(rng, "bfloat16", False, 2, args.steps, ext_targets=True)
        return
    if args.batch is not None:
        bench_config(rng, "bfloat16", False, args.batch, args.steps,
                     ext_targets=True, repeat=args.repeat)
        return
    if args.scaling:
        for b in (2, 4, 8):
            bench_config(rng, "bfloat16", False, b, args.steps,
                         ext_targets=True)
        return
    for dtype in ("float32", "bfloat16"):
        for remat in (False, True):
            bench_config(rng, dtype, remat, 2, args.steps)
    bench_config(rng, "bfloat16", False, 4, args.steps)
    bench_config(rng, "bfloat16", True, 4, args.steps)
    bench_config(rng, "bfloat16", False, 2, args.steps, ext_targets=True)
    bench_config(rng, "bfloat16", False, 4, args.steps, ext_targets=True)


if __name__ == "__main__":
    main()
