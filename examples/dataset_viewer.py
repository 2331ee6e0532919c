"""Browse a tracking dataset frame by frame with the point-cloud viewer
(the d3d_tpu equivalent of the reference devkit's examples/dataset_viewer.py:
same loader surface, the pcl dependency is optional with a matplotlib
fallback).

Usage:
    python examples/dataset_viewer.py <dataset_path> kitti-raw <scene>
    python examples/dataset_viewer.py <dataset_path> nuscenes <scene> --inter 3
"""

import argparse
from pathlib import Path

import numpy as np


def dataset_visualize_pcl(dataset_path, dataset_type, scene,
                          ninter_frames=0):
    """Render each frame's accumulated lidar + GT boxes; space advances.

    :param dataset_type: one of kitti-raw, nuscenes, waymo
    """
    from d3d_tpu.vis.pcl import visualize_detections

    dataset_type = dataset_type.lower()
    if dataset_type == "kitti-raw":
        from d3d_tpu.dataset.kitti import KittiRawLoader
        loader = KittiRawLoader(dataset_path)
    elif dataset_type == "nuscenes":
        from d3d_tpu.dataset.nuscenes import NuscenesLoader
        loader = NuscenesLoader(dataset_path)
    elif dataset_type == "waymo":
        from d3d_tpu.dataset.waymo import WaymoLoader
        loader = WaymoLoader(dataset_path)
    else:
        raise ValueError("Unsupported dataset type!")

    lidar_frame = loader.VALID_LIDAR_NAMES[0]
    for idx in range(loader.sequence_sizes[scene]):
        sidx = (scene, idx)
        objs = loader.annotation_3dobject(sidx)
        calib = loader.calibration_data(sidx)
        cloud = np.asarray(loader.lidar_data(sidx))[:, :4]

        if ninter_frames:
            pose = loader.pose(sidx)
            inter = loader.intermediate_data(sidx, names=lidar_frame,
                                             ninter_frames=ninter_frames)
            for frame in inter:
                ego_rt = calib.get_extrinsic(frame_from=lidar_frame)
                rt = (np.linalg.inv(ego_rt) @ np.linalg.inv(pose.homo())
                      @ frame.pose.homo() @ ego_rt)
                xyz = frame.data[:, :3] @ rt[:3, :3].T + rt[:3, 3]
                cloud = np.vstack(
                    [cloud, np.hstack([xyz, frame.data[:, [3]]])])

        try:
            import pcl
            vis = pcl.Visualizer()
            vis.addPointCloud(pcl.create_xyzi(cloud[:, :4]),
                              field="intensity")
        except ImportError:  # matplotlib fallback
            import matplotlib.pyplot as plt
            fig = plt.figure()
            vis = fig.add_subplot(projection="3d")
            vis.scatter(cloud[::8, 0], cloud[::8, 1], cloud[::8, 2],
                        s=0.2, c=cloud[::8, 3])
        visualize_detections(vis, lidar_frame, objs, calib)
        try:
            vis.spin()  # pcl
        except AttributeError:
            import matplotlib.pyplot as plt
            plt.show()
        key = input(f"frame {idx} — enter to continue, q to quit: ")
        try:
            import matplotlib.pyplot as plt
            plt.close("all")  # the fallback leaks a figure per frame
        except ImportError:
            pass
        if key == "q":
            break


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("path", type=Path)
    ap.add_argument("dataset", choices=["kitti-raw", "nuscenes", "waymo"])
    ap.add_argument("scene")
    ap.add_argument("--inter", type=int, default=0)
    args = ap.parse_args()
    dataset_visualize_pcl(args.path, args.dataset, args.scene, args.inter)
