"""Execute the dep-gated module bodies (io.ros, vis.xviz, vis.pcl, Waymo
submission dump) against stubbed third-party packages so their logic runs in
CI at least once (round-1 VERDICT weak #6; the real deps are never present
in the image)."""

import sys
import types

import numpy as np
import pytest

import dataset_fixtures as dfx
import kitti_fixture as kfx


class _Auto:
    """Attribute sink: nested attribute reads auto-create children, writes
    are recorded. Good enough to stand in for ROS message types."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __getattr__(self, name):
        child = _Auto()
        self.__dict__[name] = child
        return child


@pytest.fixture(scope="module")
def tracking_loader(tmp_path_factory):
    from d3d_tpu.dataset.kitti import KittiTrackingLoader

    root = tmp_path_factory.mktemp("kitti_trk_opt")
    kfx.build_tracking(root, seqs=(0,), frames_per_seq=3)
    return KittiTrackingLoader(root, phase="training", inzip=False,
                               trainval_split=1)


# ------------------------------------------------------------------ io.ros
def test_ros_dump(monkeypatch, tracking_loader, tmp_path):
    records = []

    class _Bag:
        size = 1

        def __init__(self, path, mode):
            self.path, self.mode = path, mode

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def write(self, topic, msg, t=None):
            records.append((topic, msg, t))

    rosbag = types.ModuleType("rosbag")
    rosbag.Bag = _Bag
    rospy = types.ModuleType("rospy")
    rospy.Time = _Auto(from_sec=lambda s: ("time", s))

    sensor_msgs = types.ModuleType("sensor_msgs")
    pc2 = types.ModuleType("sensor_msgs.point_cloud2")
    pc2.create_cloud = lambda header, fields, arr: ("cloud", len(fields),
                                                    np.asarray(arr).shape)
    sm_msg = types.ModuleType("sensor_msgs.msg")

    class _PointField:
        FLOAT32 = 7

        def __init__(self, name, offset, dtype, count):
            self.name = name

    sm_msg.PointField = _PointField
    sm_msg.CameraInfo = _Auto
    sm_msg.Image = _Auto
    sensor_msgs.point_cloud2 = pc2
    sensor_msgs.msg = sm_msg

    geometry_msgs = types.ModuleType("geometry_msgs")
    gm_msg = types.ModuleType("geometry_msgs.msg")
    gm_msg.TransformStamped = _Auto
    geometry_msgs.msg = gm_msg

    std_msgs = types.ModuleType("std_msgs")
    st_msg = types.ModuleType("std_msgs.msg")
    st_msg.ByteMultiArray = _Auto
    st_msg.Header = _Auto
    std_msgs.msg = st_msg

    tf2_msgs = types.ModuleType("tf2_msgs")
    tf_msg = types.ModuleType("tf2_msgs.msg")

    class _TFMessage(_Auto):
        def __init__(self):
            self.transforms = []

    tf_msg.TFMessage = _TFMessage
    tf2_msgs.msg = tf_msg

    for name, mod in [("rosbag", rosbag), ("rospy", rospy),
                      ("sensor_msgs", sensor_msgs),
                      ("sensor_msgs.point_cloud2", pc2),
                      ("sensor_msgs.msg", sm_msg),
                      ("geometry_msgs", geometry_msgs),
                      ("geometry_msgs.msg", gm_msg),
                      ("std_msgs", std_msgs), ("std_msgs.msg", st_msg),
                      ("tf2_msgs", tf2_msgs), ("tf2_msgs.msg", tf_msg)]:
        monkeypatch.setitem(sys.modules, name, mod)

    from d3d_tpu.io.ros import dump_sequence_dataset

    # the KITTI tracking calib has no raw intrinsic matrix; graft one onto
    # cam2 so the CameraInfo branch executes
    calib = tracking_loader.calibration_data((0, 0))
    calib.intrinsics_meta["cam2"].intri_matrix = np.eye(3)
    monkeypatch.setattr(tracking_loader, "calibration_data",
                        lambda idx, **kw: calib)

    dump_sequence_dataset(tracking_loader, tmp_path / "seq.bag", 0,
                          odom_frame="velo")

    topics = [r[0] for r in records]
    assert "/tf_static" in topics
    assert any(t.startswith("/calib/cam") for t in topics)
    assert topics.count("/lidar/velo") == 3  # one cloud per frame
    assert topics.count("/objects") == 3
    # camera images: one SensorImage per camera per frame with rgb8 payload
    cam_topics = [t for t in topics if t.startswith("/camera/")]
    assert len(cam_topics) == 3 * len(tracking_loader.VALID_CAM_NAMES)
    img_msg = records[topics.index(cam_topics[0])][1]
    assert img_msg.encoding == "rgb8"
    assert len(img_msg.data) == img_msg.height * img_msg.step
    # per-frame ego pose chain rooted on the odom anchor
    assert topics.count("/tf") == 3
    tf0 = records[topics.index("/tf")][1].transforms[0]
    assert tf0.header.frame_id == "odom_pose"
    assert tf0.child_frame_id == tracking_loader.pose_name
    # frame 0 pose is the identity (relative to itself)
    assert abs(tf0.transform.translation.x) < 1e-9
    assert abs(tf0.transform.rotation.w - 1.0) < 1e-9
    # the static tf carries one transform per calibration frame + odom
    tfm = records[topics.index("/tf_static")][1]
    assert len(tfm.transforms) >= 5
    assert any(m.child_frame_id == "odom_pose" for m in tfm.transforms)
    # object payloads are msgpack bytes of the Target3DArray dump
    arr = records[topics.index("/objects")][1]
    assert len(arr.data) > 10


# ----------------------------------------------------------------- vis.xviz
def test_xviz_converter(monkeypatch, tracking_loader):
    calls = []

    class _Chain:
        def __init__(self, tag):
            self.tag = tag

        def __getattr__(self, name):
            def record(*args, **kw):
                calls.append((self.tag, name, args))
                return self

            return record

    class _MetaBuilder(_Chain):
        def __init__(self):
            super().__init__("meta")

        def get_message(self):
            calls.append(("meta", "get_message", ()))
            return {"streams": "meta"}

    class _Builder(_Chain):
        def __init__(self, metadata=None):
            super().__init__("msg")

        def get_message(self):
            calls.append(("msg", "get_message", ()))
            return {"update": "snapshot"}

    xviz_avs = types.ModuleType("xviz_avs")
    builder_mod = types.ModuleType("xviz_avs.builder")
    builder_mod.XVIZMetadataBuilder = _MetaBuilder
    builder_mod.XVIZBuilder = _Builder
    xviz_avs.builder = builder_mod
    monkeypatch.setitem(sys.modules, "xviz_avs", xviz_avs)
    monkeypatch.setitem(sys.modules, "xviz_avs.builder", builder_mod)

    from d3d_tpu.vis.xviz import TrackingDatasetConverter

    conv = TrackingDatasetConverter(tracking_loader, 0)
    meta = conv.get_metadata()
    assert meta == {"streams": "meta"}
    streams = [a[0] for tag, name, a in calls
               if tag == "meta" and name == "stream"]
    assert "/vehicle_pose" in streams and "/lidar/velo" in streams \
        and "/objects" in streams

    calls.clear()
    msg = conv.get_message(1)
    assert msg == {"update": "snapshot"}
    assert ("msg", "pose", ("/vehicle_pose",)) in calls
    prims = [a for tag, name, a in calls if name == "primitive"]
    assert ("/lidar/velo",) in prims and ("/objects",) in prims
    npoints = [a[0].size for tag, name, a in calls if name == "points"]
    assert npoints == [256 * 3]
    npoly = sum(1 for tag, name, a in calls if name == "polygon")
    assert npoly == 2  # two tracked cars in the fixture


# ------------------------------------------------------------------ vis.pcl
def _targets():
    from scipy.spatial.transform import Rotation

    from d3d_tpu.abstraction import (ObjectTag, ObjectTarget3D, Target3DArray)
    from d3d_tpu.dataset.kitti import KittiObjectClass

    return Target3DArray([
        ObjectTarget3D([5.0, 1.0, 0.0], Rotation.from_euler("z", 0.3),
                       [3.9, 1.6, 1.56],
                       ObjectTag(KittiObjectClass.Car, KittiObjectClass),
                       tid=3),
        ObjectTarget3D([10.0, -2.0, 0.0], Rotation.identity(),
                       [0.8, 0.6, 1.75],
                       ObjectTag(KittiObjectClass.Pedestrian,
                                 KittiObjectClass), tid=4),
    ], frame="velo")


def test_pcl_visualizer_branch(monkeypatch):
    pcl = types.ModuleType("pcl")
    monkeypatch.setitem(sys.modules, "pcl", pcl)
    calls = []

    class _Vis:
        def addCube(self, *a, **kw):
            calls.append(("cube", a, kw))

        def setShapeRenderingProperties(self, *a, **kw):
            calls.append(("props", a, kw))

        def addText3D(self, *a, **kw):
            calls.append(("text", a, kw))

        def addLine(self, *a, **kw):
            calls.append(("line", a, kw))

    from d3d_tpu.vis.pcl import visualize_detections

    visualize_detections(_Vis(), "velo", _targets(), None, id_colored=True)
    kinds = [c[0] for c in calls]
    assert kinds.count("cube") == 2 and kinds.count("text") == 2
    assert kinds.count("line") == 4  # 2 orientation-arrow lines per box
    # quaternion passed w-first
    quat = calls[0][1][1]
    assert len(quat) == 4 and abs(np.linalg.norm(quat) - 1) < 1e-6


def test_pcl_mpl_fallback():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from d3d_tpu.vis.pcl import visualize_detections

    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    visualize_detections(ax, "velo", _targets(), None)
    # 12 wireframe edges + 2 orientation-arrow lines per box
    assert len(ax.lines) == 28
    plt.close(fig)


# ------------------------------------------------- waymo submission dump
def test_waymo_dump_detection(monkeypatch, tmp_path):
    from d3d_tpu.dataset.waymo import WaymoLoader

    root = tmp_path / "waymo"
    dfx.build_waymo(root, nframes=2)

    class _Box(_Auto):
        pass

    class _ObjInner(_Auto):
        def __init__(self):
            self.box = _Auto(CopyFrom=lambda b: setattr(self, "box_val", b))

    class _Object(_Auto):
        def __init__(self):
            self.object = _ObjInner()

    class _Objects:
        def __init__(self):
            self.objects = []

        def SerializeToString(self):
            return b"WAYMO%d" % len(self.objects)

    label_pb2 = types.ModuleType("waymo_open_dataset.label_pb2")
    label_pb2.Label = _Auto(TYPE_UNKNOWN=0, TYPE_VEHICLE=1,
                            TYPE_PEDESTRIAN=2, TYPE_SIGN=3, TYPE_CYCLIST=4,
                            Box=_Box)
    metrics_pb2 = types.ModuleType(
        "waymo_open_dataset.protos.metrics_pb2")
    metrics_pb2.Objects = _Objects
    metrics_pb2.Object = _Object
    wod = types.ModuleType("waymo_open_dataset")
    wod.label_pb2 = label_pb2
    protos = types.ModuleType("waymo_open_dataset.protos")
    protos.metrics_pb2 = metrics_pb2
    wod.protos = protos
    for name, mod in [("waymo_open_dataset", wod),
                      ("waymo_open_dataset.label_pb2", label_pb2),
                      ("waymo_open_dataset.protos", protos),
                      ("waymo_open_dataset.protos.metrics_pb2", metrics_pb2)]:
        monkeypatch.setitem(sys.modules, name, mod)

    loader = WaymoLoader(root, phase="training")
    dets = loader.annotation_3dobject(0)
    for d in dets:
        d.tag.scores = [0.9]
    out = tmp_path / "sub.bin"
    loader.dump_detection_output(0, dets, out)
    assert out.read_bytes() == b"WAYMO2"
