"""Data model tests: msgpack round-trips (same coverage as reference
test/test_abstraction.py), pickle, filters, TransformSet math and camera
projection."""

import io
import pickle

import msgpack
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from d3d_tpu.abstraction import (
    EgoPose,
    ObjectTag,
    ObjectTarget3D,
    Target3DArray,
    TrackingTarget3D,
    TransformSet,
)
from d3d_tpu.dataset.kitti.utils import KittiObjectClass


def _make_arrays(rng):
    obj_arr = Target3DArray(frame="someframe", timestamp=1.2345)
    track_arr = Target3DArray(frame="fixed", timestamp=0.1234)
    for i in range(10):
        position = np.array([i] * 3)
        dimension = np.array([i + 1] * 3)
        var = np.diag(position).astype(float)
        orientation = Rotation.from_euler("Z", i)
        tag = ObjectTag(KittiObjectClass.Car, KittiObjectClass, 0.9)
        obj_arr.append(ObjectTarget3D(
            position, orientation, dimension, tag, tid="test%d" % i,
            position_var=var, dimension_var=var))
        track_arr.append(TrackingTarget3D(
            position, orientation, dimension, rng.random(3), rng.random(3),
            tag, tid="test%d" % i, position_var=var, dimension_var=var,
            velocity_var=rng.random((3, 3)),
            angular_velocity_var=rng.random((3, 3)), history=i * 0.1))
    return obj_arr, track_arr


class TestSerialization:
    def test_msgpack_roundtrip(self, rng):
        obj_arr, track_arr = _make_arrays(rng)
        for arr in (obj_arr, track_arr):
            data = msgpack.packb(arr.serialize(), use_single_float=True)
            copy = Target3DArray.deserialize(msgpack.unpackb(data))
            assert len(copy) == len(arr)
            assert copy.frame == arr.frame
            # the wire format packs floats as f32 (use_single_float=True)
            assert copy.timestamp == pytest.approx(arr.timestamp, rel=1e-6)
            for a, b in zip(arr, copy):
                assert np.allclose(a.position, b.position)
                assert np.allclose(a.position_var, b.position_var)
                assert np.allclose(a.dimension, b.dimension)
                assert np.allclose(
                    a.orientation.as_quat(), b.orientation.as_quat())
                assert a.tid == b.tid
                assert a.tag.mapping == b.tag.mapping
                assert a.tag.labels == b.tag.labels
                if isinstance(a, TrackingTarget3D):
                    assert np.allclose(a.velocity, b.velocity, atol=1e-6)
                    assert np.allclose(a.angular_velocity, b.angular_velocity,
                                       atol=1e-6)
                    assert a.history == pytest.approx(b.history)

    def test_dump_load_file(self, rng, tmp_path):
        obj_arr, _ = _make_arrays(rng)
        p = tmp_path / "arr.msg"
        obj_arr.dump(p)
        loaded = Target3DArray.load(p)
        assert len(loaded) == 10 and loaded.frame == "someframe"
        # file-like objects too
        buf = io.BytesIO()
        obj_arr.dump(buf)
        buf.seek(0)
        assert len(Target3DArray.load(buf)) == 10

    def test_pickle(self, rng):
        obj_arr, track_arr = _make_arrays(rng)
        for arr in (obj_arr, track_arr):
            copy = pickle.loads(pickle.dumps(arr))
            assert len(copy) == len(arr) and copy.frame == arr.frame

    def test_empty_array(self):
        arr = Target3DArray(frame="f")
        copy = Target3DArray.deserialize(
            msgpack.unpackb(msgpack.packb(arr.serialize())))
        assert len(copy) == 0 and copy.frame == "f"
        assert arr.to_numpy().shape == (0,)


class TestTargets:
    def test_tag(self):
        t = ObjectTag("Car", KittiObjectClass)
        assert t.labels == [KittiObjectClass.Car.value]
        assert t.scores == [1]
        t = ObjectTag([KittiObjectClass.Car, KittiObjectClass.Van],
                      scores=[0.2, 0.8])
        assert t.mapping is KittiObjectClass  # inferred
        assert t.labels[0] == KittiObjectClass.Van.value  # sorted by score
        with pytest.raises(ValueError):
            ObjectTag([1, 2], KittiObjectClass)

    def test_yaw_and_corners(self):
        tag = ObjectTag(KittiObjectClass.Car, KittiObjectClass)
        obj = ObjectTarget3D([1, 2, 3], Rotation.from_euler("Z", 0.5),
                             [4, 2, 2], tag)
        assert obj.yaw == pytest.approx(0.5, abs=1e-6)
        c = obj.corners
        assert c.shape == (8, 3)
        assert np.allclose(c.mean(axis=0), [1, 2, 3], atol=1e-5)

    def test_to_numpy_layout(self):
        tag = ObjectTag(KittiObjectClass.Van, KittiObjectClass, 0.7)
        obj = ObjectTarget3D([1, 2, 3], Rotation.identity(), [4, 5, 6], tag)
        arr = obj.to_numpy()
        assert arr.shape == (9,)
        assert arr[0] == KittiObjectClass.Van.value
        assert arr[1] == pytest.approx(0.7)
        assert np.allclose(arr[2:8], [1, 2, 3, 4, 5, 6])
        tr = TrackingTarget3D([1, 2, 3], Rotation.identity(), [4, 5, 6],
                              [7, 8, 9], [0, 0, 0.3], tag)
        assert tr.to_numpy().shape == (12,)
        assert np.allclose(tr.to_numpy()[9:], [7, 8, 0.3], atol=1e-6)

    def test_crop_points(self):
        tag = ObjectTag(KittiObjectClass.Car, KittiObjectClass)
        arr = Target3DArray([
            ObjectTarget3D([0, 0, 0], Rotation.identity(), [2, 2, 2], tag),
            ObjectTarget3D([5, 5, 5], Rotation.identity(), [2, 2, 2], tag),
        ], frame="velo")
        cloud = np.array([[0, 0, 0], [5, 5, 5], [9, 9, 9]], dtype=float)
        mask = arr.crop_points(cloud)
        assert mask.shape == (2, 3)
        assert mask[0].tolist() == [True, False, False]
        assert mask[1].tolist() == [False, True, False]

    def test_filters(self, rng):
        tag_car = ObjectTag(KittiObjectClass.Car, KittiObjectClass, 0.9)
        tag_ped = ObjectTag(KittiObjectClass.Pedestrian, KittiObjectClass, 0.4)
        arr = Target3DArray([
            ObjectTarget3D([0, 0, 0], Rotation.identity(), [1, 1, 1], tag_car),
            ObjectTarget3D([10, 0, 0], Rotation.identity(), [1, 1, 1], tag_ped),
        ], frame="f")
        assert len(arr.filter_tag("car")) == 1
        assert len(arr.filter_tag([KittiObjectClass.Pedestrian])) == 1
        assert len(arr.filter_score(0.5)) == 1
        assert len(arr.filter_position(x_max=5)) == 1
        assert len(arr.filter_position(x_min=5)) == 1
        assert len(arr.filter_position(y_min=-1, y_max=1)) == 2
        arr.sort_by_score(reverse=True)
        assert arr[0].tag_top_score == 0.9


class TestTransformSet:
    def _ts(self):
        ts = TransformSet("base")
        ts.set_intrinsic_lidar("velo")
        ts.set_intrinsic_pinhole("cam", (640, 480), 320, 240, 500, 500)
        ts.set_extrinsic(np.eye(4), frame_to="velo")
        t_cam = np.eye(4)
        t_cam[:3, 3] = [1, 0, 0]
        ts.set_extrinsic(t_cam, frame_to="cam")
        return ts

    def test_extrinsic_chain(self):
        ts = self._ts()
        rt = ts.get_extrinsic(frame_to="cam", frame_from="velo")
        assert np.allclose(rt[:3, 3], [1, 0, 0])
        back = ts.get_extrinsic(frame_to="velo", frame_from="cam")
        assert np.allclose(rt.dot(back), np.eye(4), atol=1e-12)
        assert np.allclose(ts.get_extrinsic(), np.eye(4))

    def test_missing_frame_raises(self):
        ts = self._ts()
        with pytest.raises(ValueError):
            ts.get_extrinsic(frame_to="nope", frame_from="velo")

    def test_transform_points_objects(self):
        ts = self._ts()
        pts = np.array([[0.0, 0, 0, 7.5], [1, 1, 1, 2.5]])
        out = ts.transform_points(pts, frame_to="cam", frame_from="velo")
        assert np.allclose(out[:, :3], pts[:, :3] + [1, 0, 0])
        assert np.allclose(out[:, 3], pts[:, 3])  # features pass through

        tag = ObjectTag(KittiObjectClass.Car, KittiObjectClass)
        arr = Target3DArray(
            [ObjectTarget3D([0, 0, 0], Rotation.identity(), [1, 1, 1], tag)],
            frame="velo")
        out = ts.transform_objects(arr, frame_to="cam")
        assert out.frame == "cam"
        assert np.allclose(out[0].position, [1, 0, 0])

    def test_camera_projection(self):
        ts = self._ts()
        # points 10m in front of the camera in FLU (x forward)
        pts = np.array([[11.0, 0, 0], [11.0, -20, 0], [-9.0, 0, 0]])
        uv, mask = ts.project_points_to_camera(
            pts, frame_to="cam", frame_from="base")
        # first point projects to the image center; second is out of view;
        # third is behind the camera
        assert mask.tolist() == [0]
        assert np.allclose(uv[0], [320, 240], atol=1e-6)
        uv, mask, dmask = ts.project_points_to_camera(
            pts, frame_to="cam", frame_from="base", remove_outlier=False,
            return_dmask=True)
        assert dmask.tolist() == [0, 1]

    def test_ego_pose(self):
        pose = EgoPose([1, 2, 3], Rotation.from_euler("Z", np.pi / 2))
        h = pose.homo()
        assert np.allclose(h[:3, 3], [1, 2, 3])
        assert np.allclose(h[:3, :3].dot([1, 0, 0]), [0, 1, 0], atol=1e-7)

    def test_dump_load(self, tmp_path):
        ts = self._ts()
        p = tmp_path / "calib.pkl"
        ts.dump(p)
        loaded = TransformSet.load(p)
        assert loaded.frames == ts.frames
        assert np.allclose(
            loaded.get_extrinsic("cam", "velo"), ts.get_extrinsic("cam", "velo"))


class TestCovarianceRotation:
    def test_transform_objects_rotates_covariances(self):
        """Reference bug fixed: covariances transform as R S R^T and
        angular velocity rotates as a vector (the reference copies both
        unrotated)."""
        from scipy.spatial.transform import Rotation as R

        ts = TransformSet("base")
        ts.set_intrinsic_lidar("velo")
        ts.set_extrinsic(np.eye(4), frame_to="velo")
        rot90 = np.eye(4)
        rot90[:3, :3] = R.from_euler("Z", np.pi / 2).as_matrix()
        ts.set_intrinsic_lidar("rot")
        ts.set_extrinsic(rot90, frame_from="velo", frame_to="rot")

        obj = TrackingTarget3D(
            [1, 0, 0], R.identity(), [2, 2, 2], [1, 0, 0], [0.2, 0, 0],
            ObjectTag(1, scores=1.0), tid=5,
            position_var=np.diag([4.0, 1.0, 0.5]),
            velocity_var=np.diag([9.0, 1.0, 0.1]),
            angular_velocity_var=np.diag([0.3, 0.1, 0.05]))
        arr = Target3DArray([obj], frame="velo")
        out = ts.transform_objects(arr, frame_to="rot")[0]
        # 90-deg z rotation swaps x/y of vectors and covariance diagonals
        np.testing.assert_allclose(out.angular_velocity, [0, 0.2, 0],
                                   atol=1e-12)
        np.testing.assert_allclose(np.diag(out.position_var),
                                   [1.0, 4.0, 0.5], atol=1e-12)
        np.testing.assert_allclose(np.diag(out.velocity_var),
                                   [1.0, 9.0, 0.1], atol=1e-12)
        np.testing.assert_allclose(np.diag(out.angular_velocity_var),
                                   [0.1, 0.3, 0.05], atol=1e-12)
        # dimensions are box-frame quantities: untouched
        np.testing.assert_allclose(out.dimension, [2, 2, 2])


class TestColumnarSerialize:
    """The columnar serialize/deserialize fast paths must be
    byte-identical on the wire and bitwise-identical after load vs the
    per-object reference paths."""

    def _arrays(self, rng):
        obj = Target3DArray(frame="velo", timestamp=123)
        trk = Target3DArray(frame="velo", timestamp=456)
        for i in range(40):
            r = Rotation.from_euler("Z", rng.uniform(-3, 3))
            obj.append(ObjectTarget3D(
                rng.uniform(-40, 40, 3), r, rng.uniform(1, 4, 3),
                ObjectTag(1, scores=float(rng.uniform())), tid=i + 1,
                position_var=np.eye(3) * 0.1, orientation_var=0.05,
                aux={"k": i} if i % 3 == 0 else None))
            trk.append(TrackingTarget3D(
                rng.uniform(-40, 40, 3), r, rng.uniform(1, 4, 3),
                rng.uniform(-5, 5, 3), [0, 0, 0.1],
                ObjectTag(1, scores=float(rng.uniform())), tid=i + 1,
                history=0.5))
        return obj, trk

    def test_wire_bytes_identical(self, rng):
        import msgpack

        for arr in self._arrays(rng):
            fast = arr.serialize()
            slow = (arr.frame, arr.timestamp, fast[2],
                    [o.serialize() for o in arr])
            assert (msgpack.packb(fast, use_single_float=True)
                    == msgpack.packb(slow, use_single_float=True))

    def test_bulk_load_bitwise_quats(self, rng):
        import msgpack

        for arr in self._arrays(rng):
            data = msgpack.unpackb(
                msgpack.packb(arr.serialize(), use_single_float=True))
            bulk = Target3DArray.deserialize(data)
            perobj = [type(arr[0]).deserialize(r) for r in data[3]]
            qa = np.stack([o._orientation for o in bulk])
            qb = np.stack([o._orientation for o in perobj])
            np.testing.assert_array_equal(qa.view(np.uint32),
                                          qb.view(np.uint32))
            for a, b in zip(bulk, perobj):
                np.testing.assert_array_equal(a.position, b.position)
                assert a.tid == b.tid and a.aux == b.aux

    @pytest.mark.parametrize("tid", ["strid0", -1])
    def test_odd_tids_fall_back(self, rng, tid):
        """String and negative tids break the u64 tid column — serialize
        must fall back to the per-object path, not crash."""
        import io

        arr = Target3DArray(frame="velo")
        arr.append(ObjectTarget3D(
            [1.0, 2, 3], Rotation.identity(), [4, 2, 1.6],
            ObjectTag(1, scores=0.5), tid=tid))
        buf = io.BytesIO()
        arr.dump(buf)
        buf.seek(0)
        re = Target3DArray.load(buf)
        assert re[0].tid == tid
