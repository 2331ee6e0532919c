"""Tracker throughput: host CenterTracker vs the device-resident
slot-table tracker (d3d_tpu.tracking.device_tracker).

Synthetic nuScenes-scale stream: T persistent constant-velocity tracks
with detection noise + F clutter detections per frame, 10 Hz. The host
path pays per-frame numpy bookkeeping and (in a serving pipeline) a
device->host->device round-trip between detector and tracker; the
device path runs association as one jitted program on padded slot
arrays, so the per-frame cost is a single dispatch.

Also reports the RAW tracker_update path (pre-packed arrays, no
Target3DArray assembly) — the number that matters when fused behind a
detector via make_tracking_step, where detections never leave the
device.

Usage: python scripts/bench_track.py [--frames 200] [--tracks 64] [--cpu]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def make_stream(rng, nframes, ntracks, clutter=16):
    from scipy.spatial.transform import Rotation

    from d3d_tpu.abstraction import (ObjectTag, Target3DArray,
                                     TrackingTarget3D)
    from d3d_tpu.dataset.kitti.utils import KittiObjectClass

    classes = [KittiObjectClass.Car, KittiObjectClass.Pedestrian,
               KittiObjectClass.Cyclist]
    pos = rng.uniform(-50, 50, (ntracks, 2))
    vel = rng.normal(0, 3.0, (ntracks, 2))
    cls = rng.choice(3, ntracks)
    frames = []
    for f in range(nframes):
        arr = Target3DArray(frame="velo", timestamp=f * 100_000)
        for i in range(ntracks):
            if rng.random() < 0.05:
                continue  # missed detection
            p = pos[i] + 0.1 * f * vel[i] + rng.normal(0, 0.1, 2)
            arr.append(TrackingTarget3D(
                [p[0], p[1], 0.0], Rotation.identity(), [4.0, 2.0, 1.6],
                [vel[i][0], vel[i][1], 0.0], [0, 0, 0],
                ObjectTag(classes[cls[i]],
                          scores=float(rng.uniform(0.5, 1.0)))))
        for _ in range(clutter):
            p = rng.uniform(-50, 50, 2)
            arr.append(TrackingTarget3D(
                [p[0], p[1], 0.0], Rotation.identity(), [4.0, 2.0, 1.6],
                [0.0, 0.0, 0.0], [0, 0, 0],
                ObjectTag(classes[rng.choice(3)],
                          scores=float(rng.uniform(0.1, 0.4)))))
        frames.append(arr)
    return classes, frames


def pack(frames, classes, pad):
    """Pre-pack the stream into padded arrays (the fused-pipeline view:
    detections are already device arrays)."""
    lut = {int(getattr(c, "value", c)): i for i, c in enumerate(classes)}
    out = []
    for arr in frames:
        n = len(arr)
        cols = arr.columns()
        boxes = np.zeros((pad, 7), np.float32)
        vel = np.zeros((pad, 2), np.float32)
        labels = np.zeros(pad, np.int32)
        scores = np.zeros(pad, np.float32)
        valid = np.zeros(pad, bool)
        boxes[:n, :3] = cols["position"]
        boxes[:n, 3:6] = cols["dimension"]
        boxes[:n, 6] = cols["yaw"]
        vel[:n] = cols["velocity"][:, :2]
        labels[:n] = [lut[int(l)] for l in cols["label"]]
        scores[:n] = cols["score"]
        valid[:n] = True
        out.append(tuple(jnp.asarray(a) for a in
                         (boxes, scores, labels, vel, valid)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--tracks", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from d3d_tpu.tracking import CenterTracker, DeviceCenterTracker
    from d3d_tpu.tracking.device_tracker import tracker_init, tracker_update

    rng = np.random.default_rng(0)
    classes, frames = make_stream(rng, args.frames, args.tracks)
    print(f"{args.frames} frames, ~{args.tracks} tracks + clutter, "
          f"backend={jax.default_backend()}")

    # host tracker
    host = CenterTracker(distance_threshold=2.0)
    host.update(frames[0])
    t0 = time.perf_counter()
    for fr in frames[1:]:
        host.update(fr)
    t_host = (time.perf_counter() - t0) / (len(frames) - 1)
    n_host = len(host.report())
    print(f"host CenterTracker:        {t_host * 1e3:8.3f} ms/frame "
          f"({n_host} live tracks)")

    # device tracker through the host API (pack + dispatch per frame)
    dev = DeviceCenterTracker(classes, distance_threshold=2.0,
                              capacity=256)
    dev.update(frames[0])
    dev.update(frames[1])  # warm both first/later-frame compiles
    t0 = time.perf_counter()
    for fr in frames[2:]:
        dev.update(fr)
    jax.tree.map(np.asarray, dev._state)
    t_dev = (time.perf_counter() - t0) / (len(frames) - 2)
    n_dev = len(dev.report())
    print(f"DeviceCenterTracker (API): {t_dev * 1e3:8.3f} ms/frame "
          f"({n_dev} live tracks)")

    # raw fused-path update (detections already on device)
    pad = int(np.ceil(max(len(f) for f in frames) / 32) * 32)
    packed = pack(frames, classes, pad)
    thr = jnp.full(len(classes), 2.0, jnp.float32)
    lt = jnp.float32(0.3)
    dt = jnp.float32(0.1)
    state = tracker_init(256)
    state = tracker_update(state, *[packed[0][i] for i in (0, 1, 2)],
                           packed[0][3], packed[0][4], jnp.float32(0.0),
                           thr, lt)
    state = tracker_update(state, *[packed[1][i] for i in (0, 1, 2)],
                           packed[1][3], packed[1][4], dt, thr, lt)
    float(np.asarray(state["next_tid"]))  # completion barrier
    t0 = time.perf_counter()
    for boxes, scores, labels, vel, valid in packed[2:]:
        state = tracker_update(state, boxes, scores, labels, vel, valid,
                               dt, thr, lt)
    float(np.asarray(state["next_tid"]))
    t_raw = (time.perf_counter() - t0) / (len(packed) - 2)
    n_raw = int(np.asarray(state["active"]).sum())
    print(f"tracker_update (fused):    {t_raw * 1e3:8.3f} ms/frame "
          f"({n_raw} live tracks)")
    print(f"speedup vs host: API {t_host / t_dev:.2f}x, "
          f"fused {t_host / t_raw:.2f}x")


if __name__ == "__main__":
    main()
