"""Train the monocular camera 3D detector end-to-end on synthetic scenes.

The full camera pipeline: rendered scenes (bright boxes at projected
locations, with a brightness-ramp depth cue — a stand-in for a KITTI
image loader) -> flip augmentation -> Mono3D train step (AdamW
one-cycle via ``train.make_optimizer``) -> detection + center-distance
AP with the DetectionEvaluator (the nuScenes-style monocular metric).
This is a MECHANICS demo at smoke scale: a tiny net on rendered blobs
learns coarse depth in ~150 CPU steps; real numbers need a real
dataset — swap ``scene`` for ``loader.camera_data`` +
``mono3d_gt_from_targets``.

Run: ``python examples/train_mono3d.py [--steps 150]``
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from d3d_tpu.augment import flip_camera_frame
    from d3d_tpu.benchmarks import DetectionEvaluator
    from d3d_tpu.tracking.matcher import DistanceTypes
    from d3d_tpu.dataset.kitti.utils import KittiObjectClass
    from d3d_tpu.models import Mono3D, Mono3DConfig
    from d3d_tpu.models.mono3d import (make_mono3d_detector,
                                       make_train_step,
                                       mono3d_to_targets)
    from d3d_tpu.train import make_optimizer

    CAR = KittiObjectClass.Car
    cfg = Mono3DConfig(
        image_size=(96, 160), stride=4, backbone_channels=(8, 16, 32),
        head_channels=32, num_classes=1, top_k=8,
        dim_priors=((3.88, 1.63, 1.53),))
    K = np.array([[70.0, 0, 80.0], [0, 70.0, 48.0], [0, 0, 1.0]],
                 np.float32)
    rng = np.random.default_rng(0)

    def scene(m=2):
        # depth is cued by apparent size AND a brightness ramp — the
        # synthetic analogue of the appearance cues a real mono net uses
        z = rng.uniform(8, 16, m)
        gt = np.stack([
            rng.uniform(-0.4, 0.4, m) * z, rng.uniform(0.8, 1.4, m), z,
            rng.uniform(3.5, 4.3, m), rng.uniform(1.5, 1.8, m),
            rng.uniform(1.4, 1.7, m), rng.uniform(-1, 1, m)],
            axis=1).astype(np.float32)
        h, w = cfg.image_size
        img = rng.random((h, w, 3)).astype(np.float32) * 0.1
        for bx in gt:
            u = int(K[0, 0] * bx[0] / bx[2] + K[0, 2])
            v = int(K[1, 1] * (bx[1] - bx[5] / 2) / bx[2] + K[1, 2])
            su = max(int(K[0, 0] * bx[3] / bx[2] / 2), 2)
            sv = max(int(K[1, 1] * bx[5] / bx[2] / 2), 2)
            img[max(v - sv, 0):v + sv, max(u - su, 0):u + su] = \
                0.25 + (bx[2] - 8.0) / 8.0 * 0.6
        return img, gt

    def batch(b=4, augment=True):
        imgs, ks, gts = [], [], []
        for _ in range(b):
            img, gt = scene()
            k = K
            if augment and rng.random() < 0.5:
                img, k, gt = (np.asarray(a) for a in
                              flip_camera_frame(img, K, gt))
            imgs.append(img)
            ks.append(k)
            gts.append(gt)
        m = gts[0].shape[0]
        return dict(images=jnp.asarray(np.stack(imgs)),
                    intrinsics=jnp.asarray(np.stack(ks)),
                    gt_boxes=jnp.asarray(np.stack(gts)),
                    gt_labels=jnp.zeros((b, m), jnp.int32),
                    gt_mask=jnp.ones((b, m), bool))

    model = Mono3D(cfg)
    b0 = batch()
    var = model.init(jax.random.PRNGKey(0), b0["images"])
    opt, lr = make_optimizer(args.steps, base_lr=5e-3)
    step = jax.jit(make_train_step(model, opt, cfg))
    params, bstats = var["params"], var["batch_stats"]
    opt_state = opt.init(params)
    for i in range(args.steps):
        params, bstats, opt_state, aux = step(params, bstats, opt_state,
                                              batch())
        if (i + 1) % 20 == 0 or i == 0:
            print(f"step {i + 1:4d}: loss={float(aux['total']):.3f} "
                  f"hm={float(aux['hm']):.3f} "
                  f"reg={float(aux['reg']):.3f} lr={float(lr(i)):.2e}")

    # evaluate on fresh scenes: detect -> camera-frame targets -> 3D mAP
    detect = make_mono3d_detector(
        model, dict(params=params, batch_stats=bstats), cfg, [CAR],
        score_threshold=0.2)
    # monocular metric convention: center-distance matching (nuScenes
    # protocol) — 3D IoU punishes depth error too hard for mono models
    ev = DetectionEvaluator([CAR], [4.0],
                            distance_metric=DistanceTypes.Position)
    derr = []
    for _ in range(8):
        img, gt = scene()
        dt = detect(img, K, frame="cam")
        gt_arr = mono3d_to_targets(gt, np.ones(len(gt)),
                                   np.zeros(len(gt), np.int64), [CAR],
                                   frame="cam", score_threshold=0.0)
        ev.add_stats(ev.calc_stats(gt_arr, dt))
        for g in gt:
            if len(dt):
                derr.append(min(abs(float(o.position[2]) - g[2])
                                for o in dt))
    print(f"synthetic-val AP@4m center distance: "
          f"{float(ev.ap()[CAR]):.3f}; median |depth err| "
          f"{np.median(derr) if derr else float('nan'):.1f} m "
          f"(smoke scale — see docstring)")


if __name__ == "__main__":
    main()
