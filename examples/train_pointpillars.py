"""Train a PointPillars detector end-to-end on TPU.

Demonstrates the full production pipeline: dataset (or synthetic) frames
-> GT-sampling + global augmentation -> pillarization -> device-side
target preparation -> mesh-sharded bf16 train step -> Trainer with async
orbax checkpoints -> on-device batched mAP evaluation.

Runs out of the box on synthetic data:
    python examples/train_pointpillars.py --steps 50 --batch 2
With a real KITTI object dataset:
    python examples/train_pointpillars.py --kitti /data/kitti --steps 2000
"""

import argparse
from dataclasses import replace

import numpy as np
import jax
import jax.numpy as jnp
import optax

from d3d_tpu.augment import global_augment
from d3d_tpu.checkpoint import TrainCheckpointer
from d3d_tpu.models.pointpillars import (PointPillars, PointPillarsConfig,
                                         make_anchors, make_train_step,
                                         pillarize, prepare_targets)
from d3d_tpu.parallel import (make_mesh, shard_train_step,
                              spatial_constrain)
from d3d_tpu.train import Trainer

MAX_GT = 32


def synthetic_frames(rng, cfg, n, npts=120_000):
    """Random clouds with a few car-sized boxes (stand-in for a loader)."""
    for _ in range(n):
        pts = np.stack([
            rng.uniform(cfg.bounds[0], cfg.bounds[1], npts),
            rng.uniform(cfg.bounds[2], cfg.bounds[3], npts),
            rng.uniform(cfg.bounds[4], cfg.bounds[5], npts),
            rng.uniform(0, 1, npts)], axis=1).astype(np.float32)
        m = int(rng.integers(3, 10))
        b = cfg.bounds  # sample INSIDE the scene so anchors go positive
        boxes = np.stack([
            rng.uniform(b[0] + 3, b[1] - 3, m),
            rng.uniform(b[2] + 2, b[3] - 2, m),
            np.full(m, -1.0), np.full(m, 3.9), np.full(m, 1.6),
            np.full(m, 1.56),
            rng.uniform(-np.pi / 2, np.pi / 2, m)], axis=1).astype(np.float32)
        yield pts, boxes, np.zeros(m, np.int64)


def kitti_frames(path, cfg, split="training"):
    from d3d_tpu.dataset.kitti import KittiObjectLoader

    loader = KittiObjectLoader(path, inzip=False)
    for idx in range(len(loader)):
        cloud = np.asarray(loader.lidar_data(idx))[:, :4]
        objs = loader.annotation_3dobject(idx)
        boxes = objs.boxes7().astype(np.float32)
        labels = np.asarray([b.tag.labels[0] for b in objs])  # int values
        yield cloud.astype(np.float32), boxes, labels


def make_batches(frames, cfg, batch_size, key):
    """Host generator: augment + pillarize frames into device batches."""
    buf = []
    for pts, boxes, labels in frames:
        key, k = jax.random.split(key)
        m = min(len(boxes), MAX_GT)
        gt = np.zeros((MAX_GT, 7), np.float32)
        gt[:m] = boxes[:m]
        p2, b2 = global_augment(k, jnp.asarray(pts), jnp.asarray(gt))
        feats, coords, valid = pillarize(p2, cfg)
        lab = np.zeros(MAX_GT, np.int32)
        lab[:m] = 0  # single-class example
        mask = np.arange(MAX_GT) < m
        buf.append((feats, coords, valid, np.asarray(b2), lab, mask))
        if len(buf) == batch_size:
            f, c, v, g, l, mk = (np.stack(x) for x in zip(*buf))
            yield dict(features=jnp.asarray(f), coords=jnp.asarray(c),
                       valid=jnp.asarray(v), gt_boxes=jnp.asarray(g),
                       gt_labels=jnp.asarray(l), gt_mask=jnp.asarray(mk))
            buf = []


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kitti", default=None)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--ckpt-dir", default="/tmp/pp_ckpts")
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--tiny", action="store_true",
                    help="small grid + clouds for a fast smoke run")
    args = ap.parse_args()

    cfg = replace(PointPillarsConfig(), dtype="bfloat16")
    if args.tiny:
        cfg = replace(cfg, bounds=(0.0, 16.0, -8.0, 8.0, -3.0, 1.0),
                      grid=(32, 32), max_pillars=256,
                      max_points_per_pillar=16, pfn_features=32,
                      backbone_channels=(32, 64), backbone_blocks=(1, 1),
                      upsample_channels=32)
    anchors = make_anchors(cfg)
    mesh = make_mesh()
    dp = mesh.shape["dp"]
    if args.batch % dp:
        args.batch = ((args.batch + dp - 1) // dp) * dp
        print(f"batch rounded up to {args.batch} "
              f"(must divide the {dp}-way dp axis)")
    rng = np.random.default_rng(0)
    frames = (kitti_frames(args.kitti, cfg) if args.kitti
              else synthetic_frames(rng, cfg, args.steps * args.batch + 8,
                                    npts=2048 if args.tiny else 120_000))
    batches = make_batches(frames, cfg, args.batch, jax.random.PRNGKey(0))

    first = next(batches)
    # spatial_constrain no-ops on the default sp=1 mesh; pass sp= to
    # make_mesh above to run the conv backbone spatially partitioned
    model = PointPillars(cfg, constrain=spatial_constrain(mesh))
    variables = model.init(jax.random.PRNGKey(0), first["features"],
                           first["coords"], first["valid"])
    opt = optax.adam(args.lr)
    opt_state = opt.init(variables["params"])

    step = shard_train_step(
        make_train_step(model, opt, cfg, anchors, external_targets=True,
                        remat=False), mesh)
    prep = jax.jit(lambda b: prepare_targets(
        jnp.asarray(anchors), b, cfg.pos_iou, cfg.neg_iou,
        num_classes=cfg.num_classes, dense=True))

    trainer = Trainer(step, prep_fn=prep,
                      checkpointer=TrainCheckpointer(args.ckpt_dir),
                      log_every=10, ckpt_every=500)
    start, params, bstats, opt_state = trainer.restore_or(
        variables["params"], variables["batch_stats"], opt_state)

    def chain():
        yield first
        yield from batches

    step_n, params, bstats, opt_state = trainer.run(
        params, bstats, opt_state, chain(), num_steps=args.steps,
        start_step=start)
    print(f"trained to step {step_n}")


if __name__ == "__main__":
    main()
