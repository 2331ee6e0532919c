"""AOT-compile the PointPillars train step against a real TPU topology and
report XLA's cost/memory analysis per batch size.

No chips are executed: the axon compile service accepts AOT compiles
against real topologies (aot_parallel_scale.py precedent), so this
quantifies — ahead of a hardware window —

  * the train step's XLA-accounted flops / bytes-accessed (the roofline
    inputs; round 4 published 72.2 GB bytes-accessed at b2 bf16 with the
    f32-pinned BatchNorms), and
  * how temps/traffic scale b2 -> b4 -> b8 (the round-4 b4 throughput
    regression suspect: HBM pressure from f32 activation intermediates
    forcing rematerialization).

Usage: python scripts/aot_train_scale.py [--topology v5e:1x1]
       [--batches 2 4 8] [--dtype bfloat16]
"""

import argparse
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="v5e:1x1")
    ap.add_argument("--batches", type=int, nargs="*", default=[2, 4, 8])
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from jax.experimental import topologies

    # host-side prep (init, prepare_targets) runs on CPU — the default
    # axon backend would execute it through the (possibly wedged) tunnel;
    # the topology AOT compile below is independent of the exec backend
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=args.topology)
    devices = list(topo.devices)
    # fully-replicated mesh over the topology: per-device program == the
    # single-chip train step (no sharded axes, no collectives), and the
    # compile resolves through the compile service instead of a live chip
    mesh = Mesh(np.asarray(devices).reshape(len(devices)), ("r",))
    repl = NamedSharding(mesh, P())
    print(f"topology {args.topology}: {len(devices)} device(s)")

    from bench_train import make_batch
    from d3d_tpu.models.pointpillars import (PointPillars,
                                             PointPillarsConfig,
                                             make_anchors, make_train_step,
                                             prepare_targets)

    cfg = replace(PointPillarsConfig(), dtype=args.dtype)
    rng = np.random.default_rng(0)
    model = PointPillars(cfg)
    anchors = make_anchors(cfg)
    step = make_train_step(model, optax.adam(2e-4), cfg, anchors,
                           external_targets=True)

    for b in args.batches:
        batch = make_batch(rng, cfg, b)
        variables = model.init(jax.random.PRNGKey(0), batch["features"],
                               batch["coords"], batch["valid"])
        opt = optax.adam(2e-4)
        opt_state = opt.init(variables["params"])
        batch = jax.jit(lambda bt: prepare_targets(
            jnp.asarray(anchors), bt, cfg.pos_iou, cfg.neg_iou,
            num_classes=cfg.num_classes, dense=True))(batch)
        batch = jax.tree.map(np.asarray, batch)
        shapes = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
            (variables["params"], variables["batch_stats"], opt_state,
             batch))

        t0 = time.time()
        lowered = jax.jit(step, in_shardings=jax.tree.map(
            lambda _: repl, shapes)).lower(*shapes)
        compiled = lowered.compile()
        dt = time.time() - t0
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        ma = compiled.memory_analysis()
        flops = ca.get("flops", float("nan"))
        bytes_acc = ca.get("bytes accessed", float("nan"))
        temps = getattr(ma, "temp_size_in_bytes", float("nan"))
        args_b = getattr(ma, "argument_size_in_bytes", float("nan"))
        print(f"b={b}: flops={flops / 1e12:.3f} TF  "
              f"bytes_accessed={bytes_acc / 2**30:.2f} GiB  "
              f"temps={temps / 2**20:.1f} MiB  args={args_b / 2**20:.1f} MiB  "
              f"compile={dt:.1f}s", flush=True)


if __name__ == "__main__":
    main()
