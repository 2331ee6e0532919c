"""Device-trace one PointPillars train step and print the XLA op breakdown
(drives the round-2 train-throughput optimization pass).

Usage: python scripts/profile_train.py [reps] [--dtype bfloat16] [--batch 2]
"""

import argparse
import glob
import os
import sys
from dataclasses import replace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xplane_report import report  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("reps", nargs="?", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--ext-targets", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from bench_train import make_batch
    from d3d_tpu.models.pointpillars import (PointPillars, PointPillarsConfig,
                                             make_anchors, make_train_step)

    cfg = replace(PointPillarsConfig(), dtype=args.dtype)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, cfg, args.batch)
    model = PointPillars(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch["features"],
                           batch["coords"], batch["valid"])
    opt = optax.adam(2e-4)
    opt_state = opt.init(variables["params"])
    anchors = make_anchors(cfg)
    step = make_train_step(model, opt, cfg, anchors, remat=args.remat,
                           external_targets=args.ext_targets)
    if args.ext_targets:
        from d3d_tpu.models.pointpillars import prepare_targets
        batch = jax.jit(lambda bt: prepare_targets(
            jnp.asarray(anchors), bt, cfg.pos_iou, cfg.neg_iou,
            num_classes=cfg.num_classes, dense=True))(batch)

    @jax.jit
    def run(params, bs, opt_state, batch):
        def body(_, carry):
            params, bs, opt_state, _ = carry
            return step(params, bs, opt_state, batch)
        aux_shape = jax.eval_shape(step, params, bs, opt_state, batch)[3]
        init = (params, bs, opt_state,
                jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), aux_shape))
        return jax.lax.fori_loop(0, args.reps, body, init)

    out = run(variables["params"], variables["batch_stats"], opt_state, batch)
    print("warm loss:", float(np.asarray(out[3]["total"])))

    logdir = f"/tmp/jaxtrace_train_b{args.batch}_{args.dtype}"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        out = run(variables["params"], variables["batch_stats"], opt_state,
                  batch)
        float(np.asarray(out[3]["total"]))

    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", files)
    report(files[0], args.reps, by_category=True)


if __name__ == "__main__":
    main()
