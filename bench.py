"""Benchmark: the BASELINE.json north-star config — voxelize + rotated NMS
of a 120k-point KITTI-scale lidar frame, end-to-end on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is north_star_ms / measured_ms (>= 1.0 means the < 1 ms/chip
v5e target from BASELINE.md is met; the reference publishes no numbers of its
own — its voxelizer is single-threaded CPU).

Runs on the default JAX backend (the real TPU under the driver).
"""

import json
import time

import numpy as np


NORTH_STAR_MS = 1.0


def main():
    import jax
    import jax.numpy as jnp
    from d3d_tpu.ops.voxel import voxelize_dense_padded
    from d3d_tpu.ops.nms import nms2d

    rng = np.random.default_rng(42)
    n = 120_000
    # KITTI-like frame: forward 70m, +-40m lateral, ground at -2
    pts = np.stack([
        rng.random(n) * 69.12,
        rng.random(n) * 79.36 - 39.68,
        rng.random(n) * 4.0 - 3.0,
        rng.random(n),
    ], axis=1).astype(np.float32)

    nboxes = 512
    boxes = np.stack([
        rng.random(nboxes) * 60 + 4,
        rng.random(nboxes) * 70 - 35,
        rng.random(nboxes) * 3 + 1.5,
        rng.random(nboxes) * 3 + 1.5,
        rng.random(nboxes) * np.pi,
    ], axis=1).astype(np.float32)
    scores = rng.random(nboxes).astype(np.float32)

    shape = (432, 496, 1)
    bounds = jnp.asarray([0.0, 69.12, -39.68, 39.68, -3.0, 1.0], jnp.float32)

    @jax.jit
    def pipeline(points, boxes, scores):
        vox = voxelize_dense_padded(points, shape, bounds, 32, 16000, "mean",
                                    order_mode="sorted")
        keep = ~nms2d(boxes, scores, iou_threshold=0.25, iou_method="rbox")
        return vox.aggregates, vox.coords, vox.nvoxels, keep

    args = (jnp.asarray(pts), jnp.asarray(boxes), jnp.asarray(scores))
    out = pipeline(*args)
    jax.block_until_ready(out)  # compile + warmup

    iters = 50
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = pipeline(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times) * 1e3)

    print(json.dumps({
        "metric": "voxelize+rotated-NMS, 120k-pt KITTI frame, end-to-end",
        "value": round(ms, 4),
        "unit": "ms",
        "vs_baseline": round(NORTH_STAR_MS / ms, 4),
    }))


if __name__ == "__main__":
    main()
