"""Capture a jax.profiler device trace of the bench pipeline and print the
per-op device-time breakdown (VERDICT round-1 item 1: profile before
optimizing the voxelizer further).

Usage: python scripts/profile_trace.py [reps]
"""

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from d3d_tpu.ops.nms import nms2d
    from d3d_tpu.ops.voxel import voxelize_dense_padded

    rng = np.random.default_rng(42)
    n = 120_000
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

    def pipeline(points, boxes, scores):
        vox = voxelize_dense_padded(points, shape, bounds, 32, 16000, "mean",
                                    order_mode="sorted")
        keep = ~nms2d(boxes, scores, iou_threshold=0.25, iou_method="rbox")
        return vox.aggregates, vox.coords, vox.nvoxels, keep

    REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    @jax.jit
    def pipeline_reps(points, boxes, scores):
        def body(_, carry):
            chk, = carry
            agg, coords, nv, keep = pipeline(
                points + chk * 1e-20, boxes, scores)
            chk = (jnp.sum(agg[:8, 0]) + jnp.sum(coords[0]) + nv
                   + jnp.sum(keep[:8])).astype(jnp.float32)
            return (chk,)

        return lax.fori_loop(0, REPS, body, (jnp.float32(0),))

    args = (jnp.asarray(pts), jnp.asarray(boxes), jnp.asarray(scores))
    jax.block_until_ready(pipeline_reps(*args))  # compile + warmup

    logdir = "/tmp/jaxtrace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        jax.block_until_ready(pipeline_reps(*args))

    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", files)
    report(files[0], REPS)


def report(xplane_path, reps):
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xplane_path], "op_profile", {})
    import gzip
    import json

    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode()
    prof = json.loads(data)

    # walk the op-profile tree: byProgram -> programs -> categories -> ops
    total_ps = prof["byCategory"]["metrics"]["time"]
    print(f"\ntotal device time in profile: (normalized metric) {total_ps}")

    def walk(node, depth=0, path=()):
        m = node.get("metrics", {})
        t = m.get("rawTime", m.get("time", 0))
        name = node.get("name", "?")
        yield (t, path + (name,))
        for ch in node.get("children", []):
            yield from walk(ch, depth + 1, path + (name,))

    rows = list(walk(prof["byCategory"]))
    leaf = [(t, p) for t, p in rows if t]
    leaf.sort(reverse=True)
    print(f"\nper-node rawTime (ps), /{reps} reps -> us/iteration:")
    for t, p in leaf[:60]:
        us = t / reps / 1e6
        print(f"{us:10.2f} us/rep  {' / '.join(p[-3:])}")


if __name__ == "__main__":
    if os.path.exists(sys.argv[-1]) and sys.argv[-1].endswith(".pb"):
        report(sys.argv[-1], int(os.environ.get("REPS", "32")))
    else:
        main()
