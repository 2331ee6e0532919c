"""Dump sequence datasets into ROS bags (reference d3d/io/ros.py). Gated on
the optional ROS python stack (rospy/rosbag/sensor_msgs)."""

import numpy as np

__all__ = ["dump_sequence_dataset"]


def _require_ros():
    try:
        import rosbag  # noqa: F401
        import rospy  # noqa: F401
        from sensor_msgs import point_cloud2  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "rospy/rosbag/sensor_msgs are required for ROS dumping; install "
            "a ROS python environment") from e


def dump_sequence_dataset(dataset, out_path, sequence, size_limit=None,
                          object_encoder="msgpack"):
    """Write one sequence (calibration TFs, clouds, images, poses and
    msgpack-encoded object annotations) into a rosbag.

    :param object_encoder: 'msgpack' serializes Target3DArray dumps into
        std_msgs/ByteMultiArray messages
    """
    _require_ros()
    import rosbag
    import rospy
    from geometry_msgs.msg import TransformStamped
    from sensor_msgs import point_cloud2
    from sensor_msgs.msg import CameraInfo, PointField
    from std_msgs.msg import ByteMultiArray, Header
    from tf2_msgs.msg import TFMessage

    nframes = dataset.sequence_sizes[sequence]
    calib = dataset.calibration_data((sequence, 0), bypass=True)

    with rosbag.Bag(str(out_path), "w") as bag:
        # static calibration
        tfm = TFMessage()
        for frame in calib.frames:
            # TF child_frame_id semantics: the transform carries CHILD-frame
            # points into the parent, i.e. frame->base (frame_from), not
            # base->frame
            rt = calib.get_extrinsic(frame_from=frame)
            msg = TransformStamped()
            msg.header.frame_id = calib.base_frame
            msg.child_frame_id = frame
            q = _mat2quat(rt[:3, :3])
            msg.transform.translation.x, msg.transform.translation.y, \
                msg.transform.translation.z = rt[:3, 3]
            msg.transform.rotation.x, msg.transform.rotation.y, \
                msg.transform.rotation.z, msg.transform.rotation.w = q
            tfm.transforms.append(msg)

            meta = calib.intrinsics_meta.get(frame)
            if getattr(meta, "intri_matrix", None) is not None:
                info = CameraInfo()
                info.width, info.height = meta.width, meta.height
                info.K = list(np.asarray(meta.intri_matrix).ravel())
                bag.write(f"/calib/{frame}", info)
        bag.write("/tf_static", tfm)

        for fi in range(nframes):
            ts = dataset.timestamp((sequence, fi), bypass=True)
            stamp = rospy.Time.from_sec(ts / 1e6)
            header = Header(stamp=stamp)

            # clouds
            for name in dataset.VALID_LIDAR_NAMES:
                cloud = dataset.lidar_data((sequence, fi), name, bypass=True)
                header.frame_id = name
                fields = [PointField(n, 4 * i, PointField.FLOAT32, 1)
                          for i, n in enumerate("xyzi"[:cloud.shape[1]])]
                msg = point_cloud2.create_cloud(header, fields,
                                                cloud[:, :len(fields)])
                bag.write(f"/lidar/{name}", msg, t=stamp)

            # objects
            objs = dataset.annotation_3dobject((sequence, fi), bypass=True)
            arr = ByteMultiArray()
            import io as _io

            buf = _io.BytesIO()
            objs.dump(buf)
            # ROS1 byte[] is SIGNED int8: raw values > 127 crash genpy's
            # struct packing
            arr.data = [b - 256 if b > 127 else b for b in buf.getvalue()]
            bag.write("/objects", arr, t=stamp)

            if size_limit and bag.size > size_limit:
                break


def _mat2quat(m):
    from scipy.spatial.transform import Rotation

    return Rotation.from_matrix(m).as_quat()
