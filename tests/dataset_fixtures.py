"""Synthetic mini-dataset builders for the loaders the reference only tests
against real data (reference test/test_dataset.py:22-105 requires datasets +
a human; VERDICT round-1 item 4 asks for CI fixtures instead).

Each ``build_*`` writes the official on-disk layout the corresponding loader
documents in its module docstring, tiny but structurally complete.
"""

import json
import struct
import zipfile
from base64 import urlsafe_b64encode
from pathlib import Path

import numpy as np

# ---------------------------------------------------------------- KITTI raw

_RAW_TS = "2011-09-26 13:02:%02d.%06d500\n"


def _raw_timestamps(n, offset_us=0):
    return "".join(_RAW_TS % (25 + i, 100000 * i + offset_us)
                   for i in range(n))


def _cam_to_cam_text():
    lines = ["calib_time: 09-Jan-2012 13:57:47"]
    for i in range(4):
        p = np.array([[721.5, 0.0, 609.5, -40.0 * i],
                      [0.0, 721.5, 172.8, 0.0],
                      [0.0, 0.0, 1.0, 0.0]])
        lines.append("S_rect_%02d: 1242 375" % i)
        lines.append("R_rect_%02d: 1 0 0 0 1 0 0 0 1" % i)
        lines.append("P_rect_%02d: " % i
                     + " ".join("%.6e" % v for v in p.ravel()))
    return "\n".join(lines) + "\n"


def _rt_text(r, t):
    return ("R: " + " ".join("%.6e" % v for v in np.asarray(r).ravel())
            + "\nT: " + " ".join("%.6e" % v for v in t) + "\n")


_TRACKLET_XML = """<?xml version="1.0" encoding="UTF-8"?>
<boost_serialization signature="serialization::archive" version="9">
<tracklets class_id="0" tracking_level="0" version="0">
  <count>{count}</count>
  <item_version>1</item_version>
{items}
</tracklets>
</boost_serialization>
"""

_TRACKLET_ITEM = """  <item>
    <objectType>{cls}</objectType>
    <h>{h}</h><w>{w}</w><l>{l}</l>
    <first_frame>{first}</first_frame>
    <poses>
      <count>{nposes}</count>
      <item_version>2</item_version>
{poses}
    </poses>
    <finished>1</finished>
  </item>"""

_TRACKLET_POSE = ("      <item><tx>{tx}</tx><ty>{ty}</ty><tz>{tz}</tz>"
                  "<rx>0</rx><ry>0</ry><rz>{rz}</rz>"
                  "<state>1</state><occlusion>0</occlusion>"
                  "<occlusion_kf>0</occlusion_kf><truncation>0</truncation>"
                  "<amt_occlusion>0</amt_occlusion>"
                  "<amt_border_l>0</amt_border_l></item>")

OXT_LINE = ("49.011212 8.4228601 112.8 0.03 0.01 0.5 "
            "1.0 2.0 2.2 0.1 0.0 0.1 0.2 9.8 0.1 0.2 9.8 "
            "0.01 0.02 0.03 0.01 0.02 0.03 0.5 0.1 4 11 6 6 6\n")


def build_kitti_raw(root, nframes=3, date="2011_09_26", drive=1):
    """KITTI raw synced drive, unzipped layout."""
    from PIL import Image

    root = Path(root)
    rng = np.random.default_rng(3)
    (root / date).mkdir(parents=True, exist_ok=True)
    (root / date / "calib_cam_to_cam.txt").write_text(_cam_to_cam_text())
    (root / date / "calib_imu_to_velo.txt").write_text(
        _rt_text(np.eye(3), [0.8, -0.3, 0.9]))
    (root / date / "calib_velo_to_cam.txt").write_text(
        _rt_text([[0, -1, 0], [0, 0, -1], [1, 0, 0]], [0.0, -0.08, -0.27]))

    seq = root / date / ("%s_drive_%04d_sync" % (date, drive))
    for cam in range(4):
        d = seq / ("image_%02d" % cam)
        (d / "data").mkdir(parents=True, exist_ok=True)
        (d / "timestamps.txt").write_text(
            _raw_timestamps(nframes, offset_us=cam + 1))
        img = Image.new("L" if cam < 2 else "RGB", (1242, 375), 90)
        for f in range(nframes):
            img.save(d / "data" / ("%010d.png" % f))
    d = seq / "velodyne_points"
    (d / "data").mkdir(parents=True, exist_ok=True)
    (d / "timestamps.txt").write_text(_raw_timestamps(nframes))
    for f in range(nframes):
        rng.uniform([0, -20, -2, 0], [50, 20, 2, 1], (256, 4)).astype(
            np.float32).tofile(d / "data" / ("%010d.bin" % f))
    d = seq / "oxts"
    (d / "data").mkdir(parents=True, exist_ok=True)
    (d / "timestamps.txt").write_text(_raw_timestamps(nframes))
    for f in range(nframes):
        (d / "data" / ("%010d.txt" % f)).write_text(OXT_LINE)

    poses = "\n".join(
        _TRACKLET_POSE.format(tx=10.0 + f, ty=2.0, tz=-0.8, rz=0.3)
        for f in range(nframes))
    item = _TRACKLET_ITEM.format(cls="Car", h=1.56, w=1.6, l=3.9, first=0,
                                 nposes=nframes, poses=poses)
    (seq / "tracklet_labels.xml").write_text(
        _TRACKLET_XML.format(count=1, items=item))
    return seq.name


# ----------------------------------------------------------- KITTI odometry

def build_kitti_odometry(root, nframes=4, seq=0, with_labels=True):
    """KITTI odometry + SemanticKITTI labels, unzipped layout."""
    from PIL import Image

    root = Path(root)
    rng = np.random.default_rng(5)
    sdir = root / "dataset" / "sequences" / ("%02d" % seq)
    for sub in ("image_2", "velodyne") + (("labels",) if with_labels else ()):
        (sdir / sub).mkdir(parents=True, exist_ok=True)

    calib = []
    for i in range(4):
        p = np.array([[721.5, 0.0, 609.5, -40.0 * i],
                      [0.0, 721.5, 172.8, 0.0],
                      [0.0, 0.0, 1.0, 0.0]])
        calib.append("P%d: " % i + " ".join("%.6e" % v for v in p.ravel()))
    tr = np.array([[0, -1, 0, 0], [0, 0, -1, -0.08], [1, 0, 0, -0.27]])
    calib.append("Tr: " + " ".join("%.6e" % v for v in tr.ravel()))
    (sdir / "calib.txt").write_text("\n".join(calib) + "\n")
    (sdir / "times.txt").write_text(
        "".join("%e\n" % (0.1 * f) for f in range(nframes)))

    img = Image.new("RGB", (1226, 370), 70)
    pose_lines = []
    for f in range(nframes):
        img.save(sdir / "image_2" / ("%06d.png" % f))
        rng.uniform([0, -20, -2, 0], [50, 20, 2, 1], (256, 4)).astype(
            np.float32).tofile(sdir / "velodyne" / ("%06d.bin" % f))
        if with_labels:
            # semantics: cars (10) and road (40); instances in the top bits
            sem = np.full(256, 40, dtype=np.uint32)
            sem[:64] = 10
            inst = np.zeros(256, dtype=np.uint32)
            inst[:64] = 7
            ((inst << np.uint32(16)) | sem).astype("u4").tofile(
                sdir / "labels" / ("%06d.label" % f))
        rt = np.hstack([np.eye(3), [[1.5 * f], [0.0], [0.0]]])
        pose_lines.append(" ".join("%e" % v for v in rt.ravel()))
    (root / "dataset" / "poses").mkdir(parents=True, exist_ok=True)
    (root / "dataset" / "poses" / ("%02d.txt" % seq)).write_text(
        "\n".join(pose_lines) + "\n")


# ---------------------------------------------------------------- KITTI-360

_K360_SEQ = "2013_05_28_drive_0000_sync"

_MEI_YAML = """%YAML:1.0
image_width: 1400
image_height: 1400
mirror_parameters:
   xi: 2.21
distortion_parameters:
   k1: 0.02
   k2: -0.01
   p1: 0.0003
   p2: -0.0002
projection_parameters:
   gamma1: 1336.0
   gamma2: 1336.0
   u0: 716.9
   v0: 705.8
"""


def _k360_ts(n):
    return "".join("2013-05-28 08:46:%02d.%06d000\n" % (2 + i, 0)
                   for i in range(n))


def _k360_box_xml(objects):
    items = []
    for i, o in enumerate(objects):
        t = np.eye(4)
        t[:3, :3] = o["R"] * np.asarray(o["scale"])  # rotation * diag(scale)
        t[:3, 3] = o["t"]
        v = np.array([[-.5, -.5, -.5], [.5, -.5, -.5], [-.5, .5, -.5],
                      [.5, .5, -.5], [-.5, -.5, .5], [.5, -.5, .5],
                      [-.5, .5, .5], [.5, .5, .5]])
        items.append(
            "<object%d>" % i
            + "<index>%d</index>" % i
            + "<label>%s</label>" % o["label"]
            + "<category>%s</category>" % o.get("category", "vehicle")
            + "<semanticId>%d</semanticId>" % o["semanticId"]
            + "<instanceId>%d</instanceId>" % o.get("instanceId", i + 1)
            + "<dynamic>%d</dynamic>" % o.get("dynamic", 0)
            + "<start_frame>%d</start_frame>" % o.get("start", 0)
            + "<end_frame>%d</end_frame>" % o.get("end", 100)
            + "<timestamp>%d</timestamp>" % o.get("timestamp", -1)
            + "<transform><rows>4</rows><cols>4</cols><data>"
            + " ".join("%g" % x for x in t.ravel()) + "</data></transform>"
            + "<vertices><data>"
            + " ".join("%g" % x for x in v.ravel()) + "</data></vertices>"
            + "<faces><data>0 1 2 1 3 2</data></faces>"
            + "</object%d>" % i)
    return ("<?xml version=\"1.0\"?><opencv_storage>"
            + "".join(items) + "</opencv_storage>")


def _write_ply(path, xyz, semantic, instance, rgb=None, timestamp=None):
    n = len(xyz)
    ts_prop = "property int timestamp\n" if timestamp is not None else ""
    header = ("ply\nformat binary_little_endian 1.0\n"
              "element vertex %d\n"
              "property float x\nproperty float y\nproperty float z\n"
              "property uchar red\nproperty uchar green\nproperty uchar blue\n"
              "property int semantic\nproperty int instance\n"
              "property uchar visible\n%send_header\n" % (n, ts_prop))
    fields = [("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
              ("red", "u1"), ("green", "u1"), ("blue", "u1"),
              ("semantic", "<i4"), ("instance", "<i4"), ("visible", "u1")]
    if timestamp is not None:
        fields.append(("timestamp", "<i4"))
    rec = np.zeros(n, np.dtype(fields))
    rec["x"], rec["y"], rec["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    if rgb is not None:
        rec["red"], rec["green"], rec["blue"] = rgb.T
    rec["semantic"] = semantic
    rec["instance"] = instance
    rec["visible"] = 1
    if timestamp is not None:
        rec["timestamp"] = timestamp
    Path(path).write_bytes(header.encode() + rec.tobytes())


def build_kitti360(root, nframes=4):
    """KITTI-360 unzipped layout with one static + one dynamic window."""
    from PIL import Image
    from scipy.spatial.transform import Rotation

    root = Path(root)
    rng = np.random.default_rng(9)

    # calibration
    cal = root / "calibration"
    cal.mkdir(parents=True, exist_ok=True)
    c2p = []
    for i in range(4):
        rt = np.hstack([np.eye(3), [[0.5 + 0.1 * i], [0.0], [1.5]]])
        c2p.append("image_%02d: " % i
                   + " ".join("%.6e" % v for v in rt.ravel()))
    (cal / "calib_cam_to_pose.txt").write_text("\n".join(c2p) + "\n")
    persp = []
    for i in range(2):
        p = np.array([[552.5, 0.0, 682.0, -40.0 * i],
                      [0.0, 552.5, 238.7, 0.0],
                      [0.0, 0.0, 1.0, 0.0]])
        persp.append("P_rect_%02d: " % i
                     + " ".join("%.6e" % v for v in p.ravel()))
        persp.append("S_rect_%02d: 1408 376" % i)
        persp.append("R_rect_%02d: 1 0 0 0 1 0 0 0 1" % i)
    (cal / "perspective.txt").write_text("\n".join(persp) + "\n")
    c2v = np.hstack([Rotation.from_euler("z", 0.01).as_matrix(),
                     [[0.3], [0.0], [-0.9]]])
    (cal / "calib_cam_to_velo.txt").write_text(
        " ".join("%.6e" % v for v in c2v.ravel()) + "\n")
    s2v = np.hstack([np.eye(3), [[-0.4], [0.0], [-0.2]]])
    (cal / "calib_sick_to_velo.txt").write_text(
        " ".join("%.6e" % v for v in s2v.ravel()) + "\n")
    (cal / "image_02.yaml").write_text(_MEI_YAML)
    (cal / "image_03.yaml").write_text(_MEI_YAML)

    # raw data
    seq3d = root / "data_3d_raw" / _K360_SEQ
    (seq3d / "velodyne_points" / "data").mkdir(parents=True, exist_ok=True)
    (seq3d / "velodyne_points" / "timestamps.txt").write_text(
        _k360_ts(nframes))
    (seq3d / "sick_points" / "data").mkdir(parents=True, exist_ok=True)
    (seq3d / "sick_points" / "timestamps.txt").write_text(_k360_ts(nframes))
    for f in range(nframes):
        cloud = rng.uniform([0, -20, -2, 0], [50, 20, 2, 1],
                            (300, 4)).astype(np.float32)
        # plant returns on the static car at world [5, 2, 0] (ego x = 5 - f)
        cloud[:5, :3] = np.array([5.0 - f, 2.0, 0.0], np.float32) \
            + rng.uniform(-0.2, 0.2, (5, 3)).astype(np.float32)
        cloud.tofile(seq3d / "velodyne_points" / "data" / ("%010d.bin" % f))
        rng.uniform(-5, 5, (64, 2)).astype(np.float32).tofile(
            seq3d / "sick_points" / "data" / ("%010d.bin" % f))
    seq2d = root / "data_2d_raw" / _K360_SEQ
    persp_img = Image.new("RGB", (1408, 376), 60)
    fish_img = Image.new("RGB", (1400, 1400), 60)
    for folder, dname in (("image_00", "data_rect"), ("image_01", "data_rect"),
                          ("image_02", "data_rgb"), ("image_03", "data_rgb")):
        d = seq2d / folder / dname
        d.mkdir(parents=True, exist_ok=True)
        (seq2d / folder / "timestamps.txt").write_text(_k360_ts(nframes))
        img = persp_img if dname == "data_rect" else fish_img
        for f in range(nframes):
            img.save(d / ("%010d.png" % f))

    # poses: x advances 1 m per frame (world frame)
    pdir = root / "data_poses" / _K360_SEQ
    pdir.mkdir(parents=True, exist_ok=True)
    lines = []
    for f in range(nframes):
        rt = np.hstack([np.eye(3), [[1.0 * f], [0.0], [0.0]]])
        lines.append("%d " % f + " ".join("%e" % v for v in rt.ravel()))
    (pdir / "poses.txt").write_text("\n".join(lines) + "\n")

    # bboxes: one static car (kittiId 13) + one dynamic pedestrian (19)
    bdir = root / "data_3d_bboxes" / "train"
    bdir.mkdir(parents=True, exist_ok=True)
    objs = [
        dict(label="car", semanticId=13, instanceId=1, t=[5.0, 2.0, 0.0],
             R=Rotation.from_euler("z", 0.4).as_matrix(),
             scale=[3.9, 1.6, 1.5], start=0, end=nframes),
        dict(label="person", semanticId=19, instanceId=2, t=[8.0, -1.0, 0.0],
             R=np.eye(3), scale=[0.6, 0.6, 1.8], dynamic=1, timestamp=1),
    ]
    (bdir / (_K360_SEQ + ".xml")).write_text(_k360_box_xml(objs))

    # semantics: one static window over all frames + one dynamic window.
    # Points: a car cluster near the static box + road points.
    sdir = root / "data_3d_semantics" / _K360_SEQ / "static"
    sdir.mkdir(parents=True, exist_ok=True)
    car_pts = rng.uniform(-1, 1, (128, 3)) * [1.8, 0.7, 0.7] + [5.0, 2.0, 0.0]
    road_pts = rng.uniform([0, -10, -2.1], [20, 10, -1.9], (256, 3))
    xyz = np.concatenate([car_pts, road_pts])
    sem = np.concatenate([np.full(128, 26), np.full(256, 7)])  # car, road ids
    inst = np.concatenate([np.full(128, 26001), np.zeros(256)]).astype(int)
    rgb = rng.integers(0, 255, (384, 3)).astype(np.uint8)
    _write_ply(sdir / ("%010d_%010d.ply" % (0, nframes - 1)),
               xyz, sem, inst, rgb)
    ddir = root / "data_3d_semantics" / _K360_SEQ / "dynamic"
    ddir.mkdir(parents=True, exist_ok=True)
    ped = rng.uniform(-1, 1, (32, 3)) * [0.3, 0.3, 0.9] + [8.0, -1.0, 0.0]
    _write_ply(ddir / ("%010d_%010d.ply" % (0, nframes - 1)),
               ped, np.full(32, 24), np.full(32, 24002),
               rng.integers(0, 255, (32, 3)).astype(np.uint8),
               timestamp=np.full(32, 1))  # pedestrian present at frame 1
    return _K360_SEQ


# ------------------------------------------------------------------- Waymo

def _waymo_tid(i):
    return urlsafe_b64encode(struct.pack("Q", 7700 + i) + b"xyzw").decode()


def build_waymo(root, phase="training", nframes=3, zipped=False,
                segment="1234567890_000_000_1234567890_000"):
    """Waymo converted per-segment layout (the converter's output contract)."""
    from PIL import Image

    rng = np.random.default_rng(13)
    base = Path(root) / phase
    out = base / segment
    (out / "context").mkdir(parents=True, exist_ok=True)

    fu, fv, cu, cv = 2055.5, 2055.5, 939.6, 641.0
    cam_rt = np.eye(4)
    cam_rt[:3, 3] = [1.5, 0.0, 2.1]
    calib_cams = {"front": dict(
        intrinsic=[fu, fv, cu, cv, 0.01, -0.005, 0.0002, -0.0001, 0.0],
        extrinsic=list(cam_rt.ravel()), width=1920, height=1280)}
    lid_rt = np.eye(4)
    lid_rt[:3, 3] = [1.43, 0.0, 2.18]
    calib_lidars = {"top": dict(extrinsic=list(lid_rt.ravel()))}
    (out / "context" / "stats.json").write_text(json.dumps(dict(
        frame_count=nframes, context=segment)))
    (out / "context" / "calib_cams.json").write_text(json.dumps(calib_cams))
    (out / "context" / "calib_lidars.json").write_text(
        json.dumps(calib_lidars))

    img = Image.new("RGB", (192, 128), 50)
    for sub in ("lidar_top", "camera_front", "label_camera_front",
                "label_lidars", "pose", "timestamp"):
        (out / sub).mkdir(exist_ok=True)
    for f in range(nframes):
        cloud = rng.uniform([-30, -30, -3, 0, 0],
                            [30, 30, 3, 1, 1], (300, 5)).astype(np.float32)
        cloud.tofile(out / "lidar_top" / ("%04d.bin" % f))
        img.save(out / "camera_front" / ("%04d.jpg" % f))
        (out / "label_camera_front" / ("%04d.json" % f)).write_text(
            json.dumps([dict(center=[960, 640], size=[60, 40], label=1,
                             id=_waymo_tid(0))]))
        (out / "label_lidars" / ("%04d.json" % f)).write_text(json.dumps([
            dict(center=[10.0 + f, 2.0, 1.0], size=[4.5, 2.0, 1.7],
                 heading=0.3, label=1, id=_waymo_tid(0)),
            dict(center=[-5.0, -3.0, 1.0], size=[0.8, 0.8, 1.8],
                 heading=0.0, label=2, id=_waymo_tid(1)),
        ]))
        rt = np.eye(4)
        rt[0, 3] = 2.0 * f
        rt.astype("f8").tofile(out / "pose" / ("%04d.bin" % f))
        (out / "timestamp" / ("%04d.txt" % f)).write_text(
            str(1550000000000000 + 100000 * f))

    if zipped:
        zpath = base / (segment + ".zip")
        with zipfile.ZipFile(zpath, "w") as zf:
            for fp in sorted(out.rglob("*")):
                if fp.is_file():
                    zf.write(fp, fp.relative_to(out))
        import shutil

        shutil.rmtree(out)
    return segment


# -------------------------------------------------------------------- CADC

_CADC_CAM_YAML = """image_width: 1280
image_height: 1024
camera_name: F
camera_matrix:
  rows: 3
  cols: 3
  data: [653.0, 0.0, 653.6, 0.0, 650.0, 508.4, 0.0, 0.0, 1.0]
distortion_model: plumb_bob
distortion_coefficients:
  rows: 1
  cols: 5
  data: [-0.17, 0.08, 0.0002, -0.0005, 0.0]
"""


def _cadc_extrinsics_yaml():
    def mat(t, about_z=0.0):
        c, s = np.cos(about_z), np.sin(about_z)
        m = np.eye(4)
        m[:2, :2] = [[c, -s], [s, c]]
        m[:3, 3] = t
        return m.tolist()

    data = {"T_BASELINK_LIDAR": mat([0.0, 0.0, 1.6])}
    for i in range(8):
        data["T_LIDAR_CAM%02d" % i] = mat([0.1 * i, 0.0, -0.3],
                                          about_z=i * np.pi / 4)
    data["T_00CAMERA_00IMU"] = mat([0.0, 0.1, 0.0])
    data["T_03CAMERA_03IMU"] = mat([0.0, -0.1, 0.0])
    data["T_LIDAR_GPSIMU"] = mat([-0.5, 0.0, -1.2])
    import yaml

    return yaml.safe_dump(data)


_INSPVAX_LINE = ("43.47 -80.54 335.8 -36.5 0.01 0.01 0.02 "
                 "0.5 -0.3 271.9 0.02 0.02 0.08 3 56\n")


def _cadc_ts(n):
    return "".join("2018-03-06T14:17:%02d.%06d\n" % (2 + i, 1000 * i)
                   for i in range(n))


def build_cadc(root, nframes=3, date="2018_03_06", drive="0001"):
    """CADC labeled drive, unzipped layout."""
    from PIL import Image

    root = Path(root)
    rng = np.random.default_rng(17)
    cal = root / date / "calib"
    cal.mkdir(parents=True, exist_ok=True)
    for i in range(8):
        (cal / ("%02d.yaml" % i)).write_text(_CADC_CAM_YAML)
    (cal / "extrinsics.yaml").write_text(_cadc_extrinsics_yaml())

    ddir = root / date / drive / "labeled"
    img = Image.new("RGB", (1280, 1024), 200)
    for i in range(8):
        d = ddir / ("image_%02d" % i)
        (d / "data").mkdir(parents=True, exist_ok=True)
        (d / "timestamps.txt").write_text(_cadc_ts(nframes))
        for f in range(nframes):
            img.save(d / "data" / ("%010d.png" % f))
    d = ddir / "lidar_points"
    (d / "data").mkdir(parents=True, exist_ok=True)
    (d / "timestamps.txt").write_text(_cadc_ts(nframes))
    for f in range(nframes):
        rng.uniform([-40, -40, -3, 0], [40, 40, 3, 1], (256, 4)).astype(
            np.float32).tofile(d / "data" / ("%010d.bin" % f))
    d = ddir / "novatel"
    (d / "data").mkdir(parents=True, exist_ok=True)
    (d / "timestamps.txt").write_text(_cadc_ts(nframes))
    for f in range(nframes):
        (d / "data" / ("%010d.txt" % f)).write_text(_INSPVAX_LINE)

    anns = []
    for f in range(nframes):
        anns.append(dict(cuboids=[
            dict(uuid="aaaabbbb-cccc-dddd-eeee-%012d" % f,
                 label="Car", yaw=0.2,
                 position=dict(x=12.0 + f, y=3.0, z=0.8),
                 dimensions=dict(x=2.0, y=4.6, z=1.6),
                 attributes=dict(state="Moving")),
            dict(uuid="11112222-3333-4444-5555-%012d" % f,
                 label="Truck", yaw=-0.4,
                 position=dict(x=-8.0, y=-6.0, z=1.0),
                 dimensions=dict(x=2.6, y=8.5, z=3.2),
                 attributes=dict(truck_type="Semi_Truck", state="Parked")),
        ]))
    (root / date / drive / "3d_ann.json").write_text(json.dumps(anns))
    return f"{date}-{drive}"
