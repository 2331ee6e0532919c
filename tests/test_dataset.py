"""Dataset layer tests on synthetic mini-KITTI fixtures: loader accessors
(unzipped + in-zip), label camera->velo conversion round trip, split logic,
fan-out decorators, PatchedZipFile selective parsing."""

import numpy as np
import pytest

import kitti_fixture as fx
from d3d_tpu.dataset.base import (DatasetBase, NumberPool, check_frames,
                                  expand_idx, split_trainval,
                                  split_trainval_seq)
from d3d_tpu.dataset.kitti import KittiObjectClass, KittiObjectLoader
from d3d_tpu.dataset.kitti.object import load_label, parse_label
from d3d_tpu.dataset.zip import PatchedZipFile


class TestSplits:
    def test_split_trainval(self):
        train = split_trainval("training", 10, 0.8, False)
        val = split_trainval("validation", 10, 0.8, False)
        assert list(train) == list(range(8))
        assert list(val) == [8, 9]
        assert list(split_trainval("training", 10, 0.5, "r"))[:2] == [9, 8]
        seeded = split_trainval("training", 10, 0.8, 42)
        assert sorted(set(seeded) | set(split_trainval("validation", 10, 0.8, 42))) \
            == list(range(10))
        assert split_trainval("training", 10, [1, 3, 5], False) == [1, 3, 5]

    def test_split_trainval_seq(self):
        counts = {"a": 3, "b": 2, "c": 5}
        frames = split_trainval_seq("training", counts, 2 / 3, False,
                                    by_seq=True)
        assert sorted(frames) == list(range(5))  # seqs a+b
        frames = split_trainval_seq("validation", counts, 2 / 3, False,
                                    by_seq=True)
        assert sorted(frames) == list(range(5, 10))

    def test_check_frames(self):
        unpack, names = check_frames("cam2", ["cam2", "cam3"])
        assert unpack and names == ["cam2"]
        unpack, names = check_frames(None, ["cam2", "cam3"])
        assert not unpack and names == ["cam2", "cam3"]
        with pytest.raises(ValueError):
            check_frames("nope", ["cam2"])


class TestKittiObject:
    @pytest.fixture(scope="class")
    def dataset(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("kitti")
        frames = fx.build_unzipped(root, nframes=4)
        return root, frames

    def test_len_and_split(self, dataset):
        root, _ = dataset
        loader = KittiObjectLoader(root, phase="training", trainval_split=0.75)
        assert len(loader) == 3
        val = KittiObjectLoader(root, phase="validation", trainval_split=0.75)
        assert len(val) == 1

    def test_accessors(self, dataset):
        root, frames = dataset
        loader = KittiObjectLoader(root, phase="training", trainval_split=1.0)
        cloud = loader.lidar_data(0)
        assert cloud.shape == (512, 4)
        rec = loader.lidar_data(0, formatted=True)
        assert rec.dtype.names == ("x", "y", "z", "intensity")
        img = loader.camera_data(0)
        assert img.size == fx.IMAGE_SIZE
        both = loader.camera_data(0, names=["cam2", "cam3"])
        assert len(both) == 2
        calib = loader.calibration_data(0)
        assert set(calib.frames) >= {"cam0", "cam1", "cam2", "cam3", "imu"}
        objs = loader.annotation_3dobject(0)
        # DontCare removed
        assert len(objs) == 2
        assert objs.frame == "velo"
        assert objs[0].tag_top == KittiObjectClass.Car

    def test_label_geometry(self, dataset):
        """Camera-frame label -> velo conversion: z_cam (forward) becomes
        x_velo; y_cam (down) becomes -z; box center lifted by h/2."""
        root, frames = dataset
        loader = KittiObjectLoader(root, phase="training", trainval_split=1.0)
        objs = loader.annotation_3dobject(0)
        raw = frames[0][0]
        x_cam, y_cam, z_cam = raw["xyz"]
        h = raw["hwl"][0]
        car = objs[0]
        # velo->cam extrinsic has translation (0, -0.08, -0.27); the label
        # file stores %.2f so compare at centimeter tolerance
        assert car.position[0] == pytest.approx(z_cam + 0.27, abs=6e-3)
        assert car.position[1] == pytest.approx(-x_cam, abs=6e-3)
        assert car.position[2] == pytest.approx(-(y_cam - h / 2) + -0.08,
                                                abs=6e-3)
        assert car.dimension == pytest.approx(
            [raw["hwl"][2], raw["hwl"][1], raw["hwl"][0]], abs=6e-3)
        # camera ry -> velo yaw: -ry - pi/2 (the dimension-swap Rx(pi/2)
        # factor contributes the extra quarter turn)
        assert np.sin(car.yaw) == pytest.approx(
            np.sin(-raw["ry"] - np.pi / 2), abs=6e-3)
        assert np.cos(car.yaw) == pytest.approx(
            np.cos(-raw["ry"] - np.pi / 2), abs=6e-3)

    def test_projection_in_image(self, dataset):
        root, _ = dataset
        loader = KittiObjectLoader(root, phase="training", trainval_split=1.0)
        calib = loader.calibration_data(0)
        objs = loader.annotation_3dobject(0)
        uv, mask = calib.project_points_to_camera(
            objs[0].corners, frame_to="cam2", frame_from="velo")
        assert len(mask) > 0  # the car is visible

    def test_dump_roundtrip(self, dataset, tmp_path):
        root, _ = dataset
        loader = KittiObjectLoader(root, phase="training", trainval_split=1.0)
        objs = loader.annotation_3dobject(1)
        for o in objs:
            o.tag.scores[0] = 0.9
        out = tmp_path / "000001.txt"
        loader.dump_detection_output(1, objs, out)
        rows = load_label(tmp_path, "000001.txt")
        back = parse_label(rows, loader.calibration_data(1, raw=True))
        assert len(back) == len(objs)
        for a, b in zip(objs, back):
            assert np.allclose(a.position, b.position, atol=0.02)
            assert np.allclose(a.dimension, b.dimension, atol=0.02)
            assert abs(np.sin(a.yaw - b.yaw)) < 1e-2

    def test_return_path(self, dataset):
        root, _ = dataset
        loader = KittiObjectLoader(root, phase="training", trainval_split=1.0)
        with loader.return_path():
            p = loader.lidar_data(0)
        assert str(p).endswith("000000.bin")

    def test_inzip(self, dataset, tmp_path_factory):
        zroot = tmp_path_factory.mktemp("kitti_zip")
        uroot = tmp_path_factory.mktemp("kitti_unzipped_src")
        fx.build_zipped(uroot, zroot, nframes=2)
        loader = KittiObjectLoader(zroot, inzip=True, phase="training",
                                   trainval_split=1.0)
        assert len(loader) == 2
        assert loader.lidar_data(1).shape == (512, 4)
        assert len(loader.annotation_3dobject(0)) == 2
        assert loader.camera_data(0).size == fx.IMAGE_SIZE


class TestPatchedZip:
    def test_selective_parse(self, tmp_path):
        import zipfile

        zpath = tmp_path / "many.zip"
        with zipfile.ZipFile(zpath, "w") as zf:
            for i in range(200):
                zf.writestr("member_%03d.txt" % i, b"x" * i)
        with PatchedZipFile(zpath, to_extract="member_050.txt") as zf:
            assert zf.namelist() == ["member_050.txt"]
            assert zf.read("member_050.txt") == b"x" * 50
        with PatchedZipFile(zpath, to_extract=["member_000.txt",
                                               "member_199.txt"]) as zf:
            assert len(zf.namelist()) == 2
            assert zf.read("member_199.txt") == b"x" * 199


def test_expand_idx_window():
    class Seq:
        nframes = 2

        def _locate_frame(self, idx):
            return "seq0", idx

        @expand_idx
        def data(self, idx):
            return idx

    s = Seq()
    assert s.data(3) == [("seq0", 3), ("seq0", 4), ("seq0", 5)]
    assert s.data(3, bypass=True) == ("seq0", 3)
    s.nframes = 0
    assert s.data(3) == ("seq0", 3)


def test_numberpool_single_thread():
    pool = NumberPool(0)
    out = pool.apply_async(lambda n, x: x * 2, (21,))
    assert out == 42


class TestKittiTracking:
    @pytest.fixture(scope="class")
    def dataset(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("kitti_tracking")
        fx.build_tracking(root, seqs=(0, 1), frames_per_seq=4)
        return root

    def test_sequences(self, dataset):
        from d3d_tpu.dataset.kitti import KittiTrackingLoader

        loader = KittiTrackingLoader(dataset, phase="training",
                                     trainval_split=1.0)
        assert loader.sequence_ids == [0, 1]
        assert loader.sequence_sizes == {0: 4, 1: 4}
        assert len(loader) == 8
        assert loader._locate_frame(5) == (1, 1)

    def test_annotations_and_pose(self, dataset):
        from d3d_tpu.dataset.kitti import KittiTrackingLoader

        loader = KittiTrackingLoader(dataset, phase="training",
                                     trainval_split=1.0)
        objs = loader.annotation_3dobject((0, 2))
        assert len(objs) == 2
        assert sorted(o.tid for o in objs) == [1, 2]
        # x_velo = z_cam + 0.27
        assert objs[0].position[0] == pytest.approx(10 + 2 + 0.27, abs=1e-4)
        pose = loader.pose((0, 0))
        assert np.isfinite(pose.position).all()
        assert loader.pose_name == "imu"
        assert loader.timestamp((0, 3)) == int(3e5 + 1)

    def test_nframes_window(self, dataset):
        from d3d_tpu.dataset.kitti import KittiTrackingLoader

        loader = KittiTrackingLoader(dataset, phase="training",
                                     trainval_split=1.0, nframes=1)
        assert len(loader) == 6  # (4-1) * 2 sequences
        window = loader.lidar_data(0)
        assert len(window) == 2  # nframes+1 clouds
        assert all(w.shape == (256, 4) for w in window)

    def test_tracking_submission_roundtrip(self, dataset, tmp_path):
        """dump_tracking_output lines parse back to the input boxes via
        the loader's own label parser (same reprojection math)."""
        from d3d_tpu.dataset.kitti import KittiTrackingLoader
        from d3d_tpu.dataset.kitti.tracking import parse_label

        loader = KittiTrackingLoader(dataset, phase="training",
                                     trainval_split=1.0)
        tracks = {fi: loader.annotation_3dobject((0, fi))
                  for fi in range(2)}
        for arr in tracks.values():
            for o in arr:
                o.tag.scores = [0.9]
        out = tmp_path / "0000.txt"
        loader.dump_tracking_output(0, tracks, out)
        text = out.read_text()
        lines = text.strip().split("\n")
        assert len(lines) == sum(len(a) for a in tracks.values())
        # parse back with the loader's own machinery: fields 0/1 are
        # frame/tid, the rest is the object-label layout + score
        from d3d_tpu.dataset.kitti.utils import KittiObjectClass

        per_frame = {0: [], 1: []}
        for ln in lines:
            f = ln.split(" ")
            per_frame[int(f[0])].append(
                [int(f[1]), KittiObjectClass[f[2]], *map(float, f[3:])])
        raw_calib = loader.calibration_data((0, 0), raw=True)
        for fi, rows in per_frame.items():
            want = tracks[fi]
            got = parse_label(rows, raw_calib)
            assert len(got) == len(want)
            for g, w in zip(got, want):
                assert g.tid == w.tid
                np.testing.assert_allclose(g.position, w.position,
                                           atol=0.02)
                np.testing.assert_allclose(g.dimension, w.dimension,
                                           atol=0.02)


    def test_multi_sequence_evaluation(self, dataset):
        """Loader -> per-sequence calc_stats_sequence on ONE evaluator:
        KITTI tracking tids restart per sequence, so the automatic
        sequence boundary must prevent cross-sequence id fabrication —
        perfect detections give MOTA 1.0 and zero switches."""
        from d3d_tpu.abstraction import Target3DArray, TrackingTarget3D
        from d3d_tpu.benchmarks import TrackingEvaluator
        from d3d_tpu.dataset.kitti import KittiTrackingLoader
        from d3d_tpu.dataset.kitti.utils import KittiObjectClass

        loader = KittiTrackingLoader(dataset, phase="training",
                                     trainval_split=1.0)
        ev = TrackingEvaluator([KittiObjectClass.Car], [0.5])
        for seq in loader.sequence_ids:
            gts, dts = [], []
            for f in range(loader.sequence_sizes[seq]):
                gt = loader.annotation_3dobject((seq, f))
                gt.timestamp = loader.timestamp((seq, f))
                dt = Target3DArray([
                    TrackingTarget3D(
                        o.position, o.orientation, o.dimension,
                        [0, 0, 0], [0, 0, 0],
                        type(o.tag)(o.tag.labels[0], type(o.tag_top),
                                    scores=0.9),
                        tid=o.tid + 1000)  # detector's own id space
                    for o in gt], frame=gt.frame,
                    timestamp=gt.timestamp)
                gts.append(gt)
                dts.append(dt)
            ev.calc_stats_sequence(gts, dts)
        assert ev.mota()[KittiObjectClass.Car] == pytest.approx(1.0)
        assert ev.id_switches()[KittiObjectClass.Car] == 0
        assert ev.fragments()[KittiObjectClass.Car] == 0


class TestNuscenes:
    @pytest.fixture(scope="class")
    def dataset(self, tmp_path_factory):
        import json

        root = tmp_path_factory.mktemp("nuscenes")
        scene = root / "trainval" / "scene-0001"
        for sub in ("scene", "lidar_top", "cam_front", "annotation", "pose",
                    "timestamp", "lidar_top_seg", "intermediate/000",
                    "intermediate/001"):
            (scene / sub).mkdir(parents=True)
        nf = 2
        (scene / "scene/stats.json").write_text(json.dumps(dict(
            nbr_samples=nf, token="abc", description="synthetic",
            sample_tokens=["t0", "t1"], logfile="log", date_captured="2020",
            vehicle="car", location="somewhere")))
        (scene / "scene/calib.json").write_text(json.dumps(dict(
            lidar_top=dict(rotation=[1, 0, 0, 0], translation=[0, 0, 1.8]),
            cam_front=dict(rotation=[1, 0, 0, 0], translation=[1.5, 0, 1.6],
                           camera_intrinsic=[[1266, 0, 800], [0, 1266, 450],
                                             [0, 0, 1]]))))
        (scene / "scene/tokens.json").write_text(json.dumps(dict(
            lidar_top=["lt0", "lt1"], cam_front=["cf0", "cf1"])))
        rng = np.random.default_rng(5)
        for f in range(nf):
            pts = rng.random((128, 5)).astype(np.float32)
            pts.tofile(scene / "lidar_top" / ("%03d.pcd" % f))
            from PIL import Image
            Image.new("RGB", (160, 90)).save(
                scene / "cam_front" / ("%03d.jpg" % f))
            (scene / "annotation" / ("%03d.json" % f)).write_text(json.dumps([
                dict(category="vehicle.car", attribute=["vehicle.moving"],
                     translation=[10.0 + f, 2.0, 0.5], size=[2.0, 4.5, 1.7],
                     rotation=[1, 0, 0, 0], velocity=[1.0, 0, 0],
                     angular_velocity=[0, 0, 0.1],
                     instance="deadbeef0123", num_lidar_pts=55,
                     num_radar_pts=3)]))
            (scene / "pose" / ("%03d.json" % f)).write_text(json.dumps(dict(
                lidar_top=dict(rotation=[1, 0, 0, 0],
                               translation=[float(f), 0.0, 0.0]),
                cam_front=dict(rotation=[1, 0, 0, 0],
                               translation=[float(f), 0.0, 0.0]))))
            (scene / "timestamp" / ("%03d.json" % f)).write_text(json.dumps(
                dict(lidar_top=1000000 * f, cam_front=1000000 * f + 50)))
            seg = rng.integers(0, 31, 128).astype(np.uint8)
            (scene / "lidar_top_seg" / ("%03d.bin" % f)).write_bytes(
                seg.tobytes())
            (scene / "intermediate" / ("%03d" % f) / "meta.json").write_text(
                json.dumps(dict(lidar_top=[], cam_front=[])))
        return root

    def test_loader(self, dataset):
        from d3d_tpu.dataset.nuscenes import (NuscenesDetectionClass,
                                              NuscenesLoader)

        loader = NuscenesLoader(dataset, phase="training",
                                trainval_split="official")
        assert len(loader) == 2
        assert loader.sequence_ids == ["scene-0001"]
        cloud = loader.lidar_data(0)
        assert cloud.shape == (128, 5)
        img = loader.camera_data(0, names="cam_front")
        assert img.size == (160, 90)
        objs = loader.annotation_3dobject(0)
        assert len(objs) == 1
        car = objs[0]
        assert car.tag_top == NuscenesDetectionClass.car
        # ego at (0,0,0) identity: global == ego coords; wlh -> lwh
        assert np.allclose(car.position, [10, 2, 0.5], atol=1e-5)
        assert np.allclose(car.dimension, [4.5, 2.0, 1.7], atol=1e-5)
        assert np.allclose(car.velocity, [1, 0, 0], atol=1e-5)
        seg = loader.annotation_3dpoints(0)
        assert seg.semantic.shape == (128,)
        calib = loader.calibration_data(0)
        assert set(calib.frames) == {"lidar_top", "cam_front"}
        assert loader.timestamp(0) == 0
        assert loader.pose(1).position[0] == pytest.approx(1.0)
        assert loader.token(0, names="lidar_top") == "lt0"
        assert loader.metadata(0).sample_token == "t0"
        sub = loader.dump_detection_output(1, objs)
        assert sub[0]["detection_name"] == "car"
        # frame 1 pose shifts x by 1
        assert sub[0]["translation"][0] == pytest.approx(11.0, abs=1e-5)

    def test_tracking_submission(self, dataset):
        from scipy.spatial.transform import Rotation
        from d3d_tpu.abstraction import (ObjectTag, Target3DArray,
                                         TrackingTarget3D)
        from d3d_tpu.dataset.nuscenes import (NuscenesDetectionClass,
                                              NuscenesLoader)

        loader = NuscenesLoader(dataset, phase="training",
                                trainval_split="official")
        trk = Target3DArray(frame="ego")
        trk.append(TrackingTarget3D(
            [10, 2, 0.5], Rotation.identity(), [4.5, 2.0, 1.7],
            [3.0, 0.0, 0.0], [0, 0, 0],
            ObjectTag(NuscenesDetectionClass.car, scores=0.9), tid=42))
        # untracked class: dropped from the submission
        trk.append(TrackingTarget3D(
            [5, 1, 0.5], Rotation.identity(), [0.5, 0.5, 1.0],
            [0, 0, 0], [0, 0, 0],
            ObjectTag(NuscenesDetectionClass.traffic_cone, scores=0.8),
            tid=43))
        sub = loader.dump_tracking_output(1, trk)
        assert len(sub) == 1
        e = sub[0]
        assert e["tracking_name"] == "car" and e["tracking_id"] == "42"
        assert e["tracking_score"] == pytest.approx(0.9)
        assert e["translation"][0] == pytest.approx(11.0, abs=1e-5)
        assert e["velocity"] == pytest.approx([3.0, 0.0])
        assert e["size"] == pytest.approx([2.0, 4.5, 1.7])
        # fout path: every field must be JSON-serializable (f32 columns
        # used to leak through as np.float32 and crash json.dumps)
        import json as _json
        out = dataset / "trk.json"
        loader.dump_tracking_output(1, trk, fout=out)
        loader.dump_detection_output(1, trk, fout=dataset / "det.json")
        assert _json.loads(out.read_text())["t1"][0]["tracking_id"] == "42"


def test_taxonomies():
    from d3d_tpu.dataset.cadc import CADCObjectClass
    from d3d_tpu.dataset.nuscenes import (NuscenesDetectionClass,
                                          NuscenesObjectClass)
    from d3d_tpu.dataset.waymo import WaymoObjectClass

    c = NuscenesObjectClass.parse("vehicle.bus.rigid")
    assert c.to_detection() == NuscenesDetectionClass.bus
    assert (c | NuscenesObjectClass.vehicle_moving).attribute \
        == NuscenesObjectClass.vehicle_moving
    assert NuscenesObjectClass.from_nuscenes_id(17) \
        == NuscenesObjectClass.vehicle_car
    assert NuscenesObjectClass.vehicle_car.nuscenes_id == 17
    assert WaymoObjectClass.Vehicle.value == 1
    truck = CADCObjectClass.Snowplow_Truck | CADCObjectClass.Moving
    # base class lives in the low byte; Snowplow_Truck subsumes Truck's bit
    assert truck & 0xFF == CADCObjectClass.Snowplow_Truck
    assert truck & CADCObjectClass.Truck == CADCObjectClass.Truck


class TestNuscenesConverter:
    def _raw(self, root):
        import json

        v = root / "v1.0-trainval"
        v.mkdir(parents=True)
        (root / "samples/LIDAR_TOP").mkdir(parents=True)
        (root / "samples/CAM_FRONT").mkdir(parents=True)

        def w(name, rows):
            (v / f"{name}.json").write_text(json.dumps(rows))

        w("log", [dict(token="log1", logfile="lf", date_captured="2020",
                       vehicle="v1", location="loc")])
        w("scene", [dict(token="sc1", name="scene-0001", log_token="log1",
                         nbr_samples=2, description="synthetic",
                         first_sample_token="s0", last_sample_token="s1")])
        w("sample", [
            dict(token="s0", scene_token="sc1", timestamp=1000000,
                 prev="", next="s1", anns=["a0"]),
            dict(token="s1", scene_token="sc1", timestamp=1500000,
                 prev="s0", next="", anns=["a1"]),
        ])
        w("sensor", [dict(token="se_l", channel="LIDAR_TOP", modality="lidar"),
                     dict(token="se_c", channel="CAM_FRONT",
                          modality="camera")])
        w("calibrated_sensor", [
            dict(token="cs_l", sensor_token="se_l", rotation=[1, 0, 0, 0],
                 translation=[0, 0, 1.8], camera_intrinsic=[]),
            dict(token="cs_c", sensor_token="se_c", rotation=[1, 0, 0, 0],
                 translation=[1.5, 0, 1.6],
                 camera_intrinsic=[[1266, 0, 800], [0, 1266, 450],
                                   [0, 0, 1]]),
        ])
        w("ego_pose", [
            dict(token="p0", rotation=[1, 0, 0, 0], translation=[0, 0, 0],
                 timestamp=1000000),
            dict(token="p1", rotation=[1, 0, 0, 0], translation=[5, 0, 0],
                 timestamp=1500000),
        ])
        sd = []
        for i, (s, p) in enumerate((("s0", "p0"), ("s1", "p1"))):
            lf = f"samples/LIDAR_TOP/l{i}.pcd.bin"
            cf = f"samples/CAM_FRONT/c{i}.jpg"
            np.random.rand(64, 5).astype(np.float32).tofile(root / lf)
            from PIL import Image
            Image.new("RGB", (32, 18)).save(root / cf)
            sd.append(dict(token=f"sdl{i}", sample_token=s, ego_pose_token=p,
                           calibrated_sensor_token="cs_l", filename=lf,
                           is_key_frame=True, timestamp=1000000 + i * 500000,
                           fileformat="pcd", prev="", next=""))
            sd.append(dict(token=f"sdc{i}", sample_token=s, ego_pose_token=p,
                           calibrated_sensor_token="cs_c", filename=cf,
                           is_key_frame=True,
                           timestamp=1000000 + i * 500000 + 50,
                           fileformat="jpg", prev="", next=""))
        w("sample_data", sd)
        w("category", [dict(token="cat1", name="vehicle.car")])
        w("attribute", [dict(token="at1", name="vehicle.moving")])
        w("instance", [dict(token="ab12cd34ef56", category_token="cat1",
                            nbr_annotations=2)])
        w("sample_annotation", [
            dict(token="a0", sample_token="s0", instance_token="ab12cd34ef56",
                 attribute_tokens=["at1"], translation=[10, 2, 0.5],
                 size=[2, 4.5, 1.7], rotation=[1, 0, 0, 0],
                 num_lidar_pts=10, num_radar_pts=1, prev="", next="a1"),
            dict(token="a1", sample_token="s1", instance_token="ab12cd34ef56",
                 attribute_tokens=["at1"], translation=[12, 2, 0.5],
                 size=[2, 4.5, 1.7], rotation=[1, 0, 0, 0],
                 num_lidar_pts=10, num_radar_pts=1, prev="a0", next=""),
        ])

    def test_convert_then_load(self, tmp_path):
        from d3d_tpu.dataset.nuscenes import NuscenesLoader
        from d3d_tpu.dataset.nuscenes.converter import convert_dataset_inpath

        raw = tmp_path / "raw"
        raw.mkdir()
        self._raw(raw)
        out = tmp_path / "converted"
        convert_dataset_inpath(raw, out)

        loader = NuscenesLoader(out, phase="training",
                                trainval_split="official")
        assert len(loader) == 2
        assert loader.lidar_data(0).shape == (64, 5)
        objs = loader.annotation_3dobject(0)
        assert len(objs) == 1
        # velocity from finite differences: 2m over 0.5s = 4 m/s in x
        assert objs[0].velocity[0] == pytest.approx(4.0, abs=1e-4)
        assert loader.camera_data(0, names="cam_front").size == (32, 18)
        assert loader.metadata(1).sample_token == "s1"
        assert loader.pose(1).position[0] == pytest.approx(5.0)


class TestRound2ReviewFixes:
    def test_expand_idx_name_positional_args(self, tmp_path):
        """Positional args after the index must not collide with the names
        keyword (round-2 review finding: every expand_idx_name accessor
        raised TypeError on loader.lidar_data(0, 'velo', ...))."""
        from d3d_tpu.dataset.kitti import KittiObjectLoader

        root = tmp_path / "kitti"
        fx.build_unzipped(root, nframes=2)
        loader = KittiObjectLoader(root, inzip=False)
        a = loader.lidar_data(0, "velo")
        b = loader.lidar_data(0, names="velo")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_numberpool_task_failure_does_not_deadlock(self):
        """A raising task must release its slot and queue count so
        wait_for_once never hangs (previously reproduced deadlock)."""
        from d3d_tpu.dataset.base import NumberPool

        pool = NumberPool(2)
        done = []
        for i in range(6):
            pool.wait_for_once()
            pool.apply_async(_fail_or_succeed, (i,),
                             callback=done.append)
        pool.close()
        pool.join()
        assert sorted(done) == [1, 3, 5]  # odd tasks succeeded


def _fail_or_succeed(ntqdm, i):
    if i % 2 == 0:
        raise RuntimeError(f"task {i} failed")
    return i


def test_locate_windowed_frame_short_sequences():
    """Sequences shorter than the frame window must contribute zero
    indices, keeping the mapping aligned with the split domain (round-2
    review finding: the unclamped walk shifted every index)."""
    from d3d_tpu.dataset.base import locate_windowed_frame

    counts = {"A": 3, "B": 10}
    nframes = 5
    # domain size = max(3-5,0) + max(10-5,0) = 5, all in B
    for i in range(5):
        assert locate_windowed_frame(i, counts, nframes) == ("B", i)
    with pytest.raises(KeyError):
        locate_windowed_frame(5, counts, nframes)
