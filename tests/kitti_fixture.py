"""Synthetic mini-KITTI object dataset generator for loader tests (the
reference suite requires real datasets + a human; these fixtures close that
gap, SURVEY.md §4)."""

import zipfile
from pathlib import Path

import numpy as np

# velo (FLU) -> camera (RDF)
TR_VELO_TO_CAM = np.array([
    [0.0, -1.0, 0.0, 0.0],
    [0.0, 0.0, -1.0, -0.08],
    [1.0, 0.0, 0.0, -0.27],
])
R0_RECT = np.eye(3)
P_BASE = np.array([
    [721.5, 0.0, 609.5, 0.0],
    [0.0, 721.5, 172.8, 0.0],
    [0.0, 0.0, 1.0, 0.0],
])
IMAGE_SIZE = (1242, 375)


def calib_text():
    lines = []
    for i in range(4):
        p = P_BASE.copy()
        p[0, 3] = -40.0 * i  # fake per-camera baseline
        lines.append("P%d: " % i + " ".join("%.12e" % v for v in p.ravel()))
    lines.append("R0_rect: " + " ".join("%.12e" % v for v in R0_RECT.ravel()))
    lines.append("Tr_velo_to_cam: "
                 + " ".join("%.12e" % v for v in TR_VELO_TO_CAM.ravel()))
    lines.append("Tr_imu_to_velo: "
                 + " ".join("%.12e" % v
                            for v in np.hstack([np.eye(3),
                                                [[0.8], [-0.3], [0.9]]]).ravel()))
    return "\n".join(lines) + "\n"


def label_text(objects):
    """objects: list of dicts with cls, xyz (camera frame, bottom center),
    hwl, ry."""
    lines = []
    for o in objects:
        lines.append(
            "%s 0.0 0 0.0 100.0 100.0 200.0 200.0 %.2f %.2f %.2f "
            "%.2f %.2f %.2f %.2f"
            % (o["cls"], *o["hwl"], *o["xyz"], o["ry"]))
    return "\n".join(lines) + "\n"


def make_frame_objects(rng):
    return [
        dict(cls="Car", hwl=(1.56, 1.6, 3.9),
             xyz=(float(rng.uniform(-5, 5)), 1.7,
                  float(rng.uniform(8, 30))), ry=float(rng.uniform(-1, 1))),
        dict(cls="Pedestrian", hwl=(1.75, 0.6, 0.8),
             xyz=(float(rng.uniform(-5, 5)), 1.7,
                  float(rng.uniform(5, 20))), ry=0.0),
        dict(cls="DontCare", hwl=(-1, -1, -1), xyz=(-1000, -1000, -1000),
             ry=-10),
    ]


def build_unzipped(root, nframes=3, seed=7):
    from PIL import Image

    rng = np.random.default_rng(seed)
    root = Path(root)
    frames = []
    for sub in ("calib", "image_2", "image_3", "label_2", "velodyne"):
        (root / "training" / sub).mkdir(parents=True, exist_ok=True)
    for i in range(nframes):
        (root / "training" / "calib" / ("%06d.txt" % i)).write_text(calib_text())
        objs = make_frame_objects(rng)
        frames.append(objs)
        (root / "training" / "label_2" / ("%06d.txt" % i)).write_text(
            label_text(objs))
        pts = np.concatenate([
            rng.uniform([0, -20, -2, 0], [50, 20, 2, 1], (512, 4)),
        ]).astype(np.float32)
        pts.tofile(root / "training" / "velodyne" / ("%06d.bin" % i))
        img = Image.new("RGB", IMAGE_SIZE, (64, 64, 64))
        img.save(root / "training" / "image_2" / ("%06d.png" % i))
        img.save(root / "training" / "image_3" / ("%06d.png" % i))
    return frames


def build_zipped(root, zroot, nframes=3, seed=7):
    """Zip an unzipped fixture into the official archive names."""
    frames = build_unzipped(root, nframes, seed)
    zroot = Path(zroot)
    zroot.mkdir(parents=True, exist_ok=True)
    mapping = {
        "calib": "data_object_calib.zip",
        "image_2": "data_object_image_2.zip",
        "image_3": "data_object_image_3.zip",
        "label_2": "data_object_label_2.zip",
        "velodyne": "data_object_velodyne.zip",
    }
    for sub, zname in mapping.items():
        with zipfile.ZipFile(zroot / zname, "w") as zf:
            for f in sorted((Path(root) / "training" / sub).iterdir()):
                zf.write(f, "training/%s/%s" % (sub, f.name))
    return frames


TRACKING_CALIB = """P0: 7.215e+02 0.0 6.095e+02 0.0 0.0 7.215e+02 1.728e+02 0.0 0.0 0.0 1.0 0.0
P1: 7.215e+02 0.0 6.095e+02 -40.0 0.0 7.215e+02 1.728e+02 0.0 0.0 0.0 1.0 0.0
P2: 7.215e+02 0.0 6.095e+02 -80.0 0.0 7.215e+02 1.728e+02 0.0 0.0 0.0 1.0 0.0
P3: 7.215e+02 0.0 6.095e+02 -120.0 0.0 7.215e+02 1.728e+02 0.0 0.0 0.0 1.0 0.0
R_rect: 1.0 0.0 0.0 0.0 1.0 0.0 0.0 0.0 1.0
Tr_velo_cam: 0.0 -1.0 0.0 0.0 0.0 0.0 -1.0 -0.08 1.0 0.0 0.0 -0.27
Tr_imu_velo: 1.0 0.0 0.0 0.8 0.0 1.0 0.0 -0.3 0.0 0.0 1.0 0.9
"""

OXT_LINE = ("49.011212 8.4228601 112.8 0.03 0.01 0.5 "
            "1.0 2.0 2.2 0.1 0.0 0.1 0.2 9.8 0.1 0.2 9.8 "
            "0.01 0.02 0.03 0.01 0.02 0.03 0.5 0.1 4 11 6 6 6\n")


def build_tracking(root, seqs=(0, 1), frames_per_seq=4):
    """Build a synthetic KITTI tracking dataset (unzipped)."""
    from PIL import Image

    root = Path(root)
    for sub in ("calib", "image_02", "image_03", "label_02", "oxts",
                "velodyne"):
        (root / "training" / sub).mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(11)
    for seq in seqs:
        (root / "training" / "calib" / ("%04d.txt" % seq)).write_text(
            TRACKING_CALIB)
        (root / "training" / "oxts" / ("%04d.txt" % seq)).write_text(
            OXT_LINE * frames_per_seq)
        label_lines = []
        for f in range(frames_per_seq):
            for tid, x0 in ((1, 10.0), (2, 20.0)):
                label_lines.append(
                    "%d %d Car 0 0 0.0 100 100 200 200 "
                    "1.56 1.6 3.9 %.2f 1.7 %.2f 0.2" % (f, tid, 2.0, x0 + f))
        (root / "training" / "label_02" / ("%04d.txt" % seq)).write_text(
            "\n".join(label_lines) + "\n")
        img = Image.new("RGB", IMAGE_SIZE, (40, 40, 40))
        for sub in ("image_02", "image_03"):
            d = root / "training" / sub / ("%04d" % seq)
            d.mkdir(parents=True, exist_ok=True)
            for f in range(frames_per_seq):
                img.save(d / ("%06d.png" % f))
        d = root / "training" / "velodyne" / ("%04d" % seq)
        d.mkdir(parents=True, exist_ok=True)
        for f in range(frames_per_seq):
            rng.uniform(0, 1, (256, 4)).astype(np.float32).tofile(
                d / ("%06d.bin" % f))
