"""IO / vis / profiler tests on the synthetic KITTI fixtures."""

import time

import matplotlib

matplotlib.use("Agg")

import h5py
import matplotlib.pyplot as plt
import numpy as np
import pytest

import kitti_fixture as fx
from d3d_tpu.dataset.kitti import KittiObjectLoader
from d3d_tpu.io.hdf5 import dump_dataset
from d3d_tpu.profiler import tap_time, tap_arrays
from d3d_tpu.vis.image import visualize_detections, visualize_detections_bev


@pytest.fixture(scope="module")
def loader(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_iovis")
    fx.build_unzipped(root, nframes=2)
    return KittiObjectLoader(root, phase="training", trainval_split=1.0)


def test_hdf5_dump(loader, tmp_path):
    out = tmp_path / "dump.h5"
    dump_dataset(loader, out)
    with h5py.File(out) as f:
        assert "dataset/s0/lidar_data/velo" in f
        assert f["dataset/s0/lidar_data/velo"].shape == (512, 4)


def test_visualize_image(loader):
    fig, ax = plt.subplots()
    objs = loader.annotation_3dobject(0)
    calib = loader.calibration_data(0)
    visualize_detections(ax, "cam2", objs, calib)
    assert len(ax.lines) > 0  # the car wireframe was drawn
    plt.close(fig)


def test_visualize_bev(loader):
    fig, ax = plt.subplots()
    objs = loader.annotation_3dobject(0)
    calib = loader.calibration_data(0)
    visualize_detections_bev(ax, "velo", objs, calib)
    assert len(ax.lines) >= 8  # two boxes x 4 footprint edges
    plt.close(fig)


def test_visualize_labels(loader):
    """show_tid/show_score annotate the drawn boxes with text."""
    fig, (ax1, ax2) = plt.subplots(1, 2)
    objs = loader.annotation_3dobject(0)
    for i, o in enumerate(objs):
        o.tid = i + 1
        o.tag.scores = [0.75]
    calib = loader.calibration_data(0)
    visualize_detections(ax1, "cam2", objs, calib, show_tid=True,
                         show_score=True)
    visualize_detections_bev(ax2, "velo", objs, calib, show_tid=True)
    assert len(ax1.texts) >= 1 and any("#" in t.get_text()
                                       for t in ax1.texts)
    assert len(ax2.texts) == len(objs)
    plt.close(fig)


def test_tap_time():
    assert tap_time("t1") == 0
    time.sleep(0.01)
    dt = tap_time("t1")
    assert dt >= 0.01


def test_tap_arrays():
    import jax.numpy as jnp

    tap_arrays()  # baseline
    keep = jnp.zeros((256, 8)) + 1
    new, _ = tap_arrays()
    assert any(n.shape == (256, 8) for n in new)
