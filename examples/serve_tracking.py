"""Serving loop: detector + device tracker fused into ONE program.

Builds a velocity-head CenterPoint, fuses it with the device-resident
tracker (:func:`d3d_tpu.tracking.make_tracking_step`) and drives a
synthetic 10 Hz stream through the single jitted step — detections
never leave the device between the network and the association. Prints
per-frame latency and the live track table, then round-trips the whole
step through ``jax.export`` serialization to show the deployable
artifact path.

Run: ``python examples/serve_tracking.py [--frames 20]``
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from d3d_tpu.dataset.kitti.utils import KittiObjectClass
    from d3d_tpu.models import pillarize
    from d3d_tpu.models.centerpoint import CenterPoint, CenterPointConfig
    from d3d_tpu.models.inference import make_centerpoint_detector
    from d3d_tpu.models.pointpillars import PointPillarsConfig
    from d3d_tpu.tracking.device_tracker import (make_tracking_step,
                                                 tracker_report)

    CAR = KittiObjectClass.Car
    cfg = CenterPointConfig(
        bounds=(0.0, 32.0, -16.0, 16.0, -3.0, 1.0), grid=(64, 64),
        max_pillars=2048, max_points_per_pillar=20, pfn_features=32,
        backbone_channels=(32, 64), backbone_blocks=(1, 1),
        upsample_channels=32, head_channels=32, window=9, top_k=32,
        predict_velocity=True)
    pcfg = PointPillarsConfig(
        bounds=cfg.bounds, grid=cfg.grid, max_pillars=cfg.max_pillars,
        max_points_per_pillar=cfg.max_points_per_pillar,
        pfn_features=cfg.pfn_features)

    rng = np.random.default_rng(0)

    def cloud(t):
        """Static clutter + one mover crossing at 5 m/s."""
        n = 4096
        pts = np.stack([rng.random(n) * 32, rng.random(n) * 32 - 16,
                        rng.random(n) * 4 - 3, rng.random(n)],
                       axis=1).astype(np.float32)
        box = np.array([4.0 + 0.5 * t, -2.0, -1.0])
        car = box + rng.normal(0, 0.3, (256, 3)) * [1.5, 0.7, 0.5]
        pts[:256, :3] = car
        return pts

    model = CenterPoint(cfg)
    f, c, v = pillarize(jnp.asarray(cloud(0)), pcfg)
    var = model.init(jax.random.PRNGKey(0), f[None], c[None], v[None])
    detect = make_centerpoint_detector(model, var, cfg, pcfg, [CAR],
                                       score_threshold=0.0)
    # untrained demo net: scores hover near the focal prior (~0.1), so
    # lower the admission gate the serving default (0.3) would apply
    step = make_tracking_step(detect.device_fn, thresholds=[3.0],
                              capacity=64, score_threshold=0.05)
    state = step.init()

    print(f"backend={jax.default_backend()}; streaming "
          f"{args.frames} frames at 10 Hz (one jitted step/frame)")
    for t in range(args.frames):
        pts = jnp.asarray(cloud(t))
        dt = jnp.float32(0.0 if t == 0 else 0.1)
        t0 = time.perf_counter()
        state, _ = step(state, pts, dt)
        n_live = int(np.asarray(state["active"]).sum())  # fetch = barrier
        ms = (time.perf_counter() - t0) * 1e3
        tag = " (compile)" if t == 0 else ""
        print(f"frame {t:3d}: {ms:8.2f} ms  live tracks: {n_live}{tag}")

    rep = tracker_report(state, [CAR], frame="velo",
                         timestamp=args.frames * 100_000)
    for o in rep[:5]:
        print(f"  tid={o.tid} pos=({o.position[0]:.1f}, "
              f"{o.position[1]:.1f}) v=({o.velocity[0]:.1f}, "
              f"{o.velocity[1]:.1f}) score={o.tag_top_score:.2f}")

    # the deployable artifact: serialize + reload + run one step
    from jax import export as jax_export

    sds = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                       (state, jnp.asarray(cloud(0)), jnp.float32(0.1)))
    blob = jax_export.export(step)(*sds).serialize()
    reloaded = jax_export.deserialize(blob)
    state2, _ = reloaded.call(state, jnp.asarray(cloud(args.frames)),
                              jnp.float32(0.1))
    print(f"export roundtrip: {len(blob)} bytes; reloaded step ran, "
          f"{int(np.asarray(state2['active']).sum())} live tracks")


if __name__ == "__main__":
    main()
