"""The minimum end-to-end slice (SURVEY.md §7): load a KITTI frame ->
voxelize -> stand-in detector (GT perturbation) -> rotated NMS ->
DetectionEvaluator mAP. Exercises every kernel plus the eval stack without
a trained detector."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import kitti_fixture as fx
from d3d_tpu.abstraction import ObjectTag, ObjectTarget3D, Target3DArray
from d3d_tpu.benchmarks import DetectionEvaluator
from d3d_tpu.dataset.kitti import KittiObjectClass, KittiObjectLoader
from d3d_tpu.ops.box import box2d_nms
from d3d_tpu.ops.voxel import VoxelGenerator


@pytest.fixture(scope="module")
def loader(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_e2e")
    fx.build_unzipped(root, nframes=4)
    return KittiObjectLoader(root, phase="training", trainval_split=1.0)


def _fake_detector(gt, rng, jitter=0.05, n_noise=6):
    """Perturb GT boxes + add noise boxes, with scores."""
    dets = Target3DArray(frame=gt.frame, timestamp=gt.timestamp)
    for obj in gt:
        pos = obj.position + rng.normal(0, jitter, 3)
        dim = obj.dimension * (1 + rng.normal(0, jitter / 2, 3))
        yaw = obj.yaw + rng.normal(0, 0.02)
        dets.append(ObjectTarget3D(
            pos, Rotation.from_euler("Z", yaw), dim,
            ObjectTag(obj.tag_top, KittiObjectClass,
                      scores=float(rng.uniform(0.7, 0.95)))))
        # duplicate detection that NMS must remove
        dets.append(ObjectTarget3D(
            pos + rng.normal(0, jitter, 3), Rotation.from_euler("Z", yaw),
            dim, ObjectTag(obj.tag_top, KittiObjectClass,
                           scores=float(rng.uniform(0.3, 0.5)))))
    for _ in range(n_noise):
        dets.append(ObjectTarget3D(
            rng.uniform([0, -20, -2], [50, 20, 0]),
            Rotation.from_euler("Z", rng.uniform(-np.pi, np.pi)),
            [4, 1.8, 1.6],
            ObjectTag(KittiObjectClass.Car, KittiObjectClass,
                      scores=float(rng.uniform(0.05, 0.2)))))
    return dets


def test_end_to_end_map(loader, rng):
    gen = VoxelGenerator([0, 70.4, -40, 40, -3, 1], [176, 200, 4],
                         max_points=32, max_voxels=8000, reduction="mean",
                         dense=True)
    evaluator = DetectionEvaluator(
        [KittiObjectClass.Car, KittiObjectClass.Pedestrian], [0.5, 0.25])

    for i in range(len(loader)):
        cloud = loader.lidar_data(i)
        vox = gen(cloud)
        assert len(vox.coords) > 0  # voxelization ran on the real frame

        gt = loader.annotation_3dobject(i)
        dets = _fake_detector(gt, rng)

        # rotated BEV NMS on the detections
        arr = dets.to_numpy()
        bev = arr[:, [2, 3, 5, 6, 8]].astype(np.float64)  # x,y,l,w,yaw
        keep = box2d_nms(bev, arr[:, 1].astype(np.float64),
                         iou_method="rbox", iou_threshold=0.1)
        kept = Target3DArray([d for d, k in zip(dets, keep) if k],
                             frame=dets.frame)

        stats = evaluator.calc_stats(gt, kept)
        evaluator.add_stats(stats)

    ap = evaluator.ap()
    # jittered GT at IoU 0.5/0.25 must yield high AP; noise boxes have low
    # scores so they only hurt low-score thresholds
    assert ap[KittiObjectClass.Car] > 0.85
    assert ap[KittiObjectClass.Pedestrian] > 0.85
    summary = evaluator.summary(verbose=True)
    assert "mAP" in summary

    # sanity: NMS removed the duplicate per gt box
    assert len(kept) < len(dets)
