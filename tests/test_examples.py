"""The shipped examples must keep running against the synthetic fixtures
(they are the executable documentation of the public surface)."""

import sys
from pathlib import Path

import numpy as np

import dataset_fixtures as dfx

EXAMPLES = Path(__file__).parent.parent / "examples"


def test_kitti_raw_pipeline(tmp_path, monkeypatch):
    """examples/kitti_raw_pipeline.py runs the loader -> accumulate ->
    pillarize -> track -> evaluate loop on a synthetic micro-drive."""
    monkeypatch.syspath_prepend(str(EXAMPLES))
    import kitti_raw_pipeline as demo

    dfx.build_kitti_raw(tmp_path, nframes=3)
    ev = demo.run(tmp_path)
    from d3d_tpu.dataset.kitti.utils import KittiObjectClass

    # the stand-in detector is the GT itself -> perfect MOTA for the class
    # that appears, zero id switches
    mota = ev.mota()
    assert mota[KittiObjectClass.Car] == 1.0
    assert all(v == 0 for v in ev.id_switches().values())


def test_accumulate_frames_compensation(tmp_path, monkeypatch):
    """Ego-motion compensation maps static world points of consecutive
    frames onto each other."""
    monkeypatch.syspath_prepend(str(EXAMPLES))
    import kitti_raw_pipeline as demo

    from d3d_tpu.dataset.kitti import KittiRawLoader

    dfx.build_kitti_raw(tmp_path, nframes=3)
    loader = KittiRawLoader(tmp_path, inzip=False, phase="training",
                            trainval_split=1)
    scene = loader.sequence_ids[0]
    cloud = demo.accumulate_frames(loader, scene, 2, nframes=3)
    n = len(np.asarray(loader.lidar_data((scene, 0))))
    assert cloud.shape[1] == 5  # xyz, intensity, age
    assert len(cloud) == 3 * n
    ages = np.unique(cloud[:, 4])
    assert len(ages) == 3 and ages.min() == 0.0


def test_serve_tracking_example(monkeypatch, capsys):
    """examples/serve_tracking.py: the fused detect+track serving loop
    runs, reports live tracks, and the export roundtrip works."""
    monkeypatch.syspath_prepend(str(EXAMPLES))
    monkeypatch.setattr(sys, "argv",
                        ["serve_tracking.py", "--frames", "3"])
    import serve_tracking as demo

    demo.main()
    out = capsys.readouterr().out
    assert "frame   2:" in out
    assert "export roundtrip:" in out


def test_train_mono3d_example(monkeypatch, capsys):
    """examples/train_mono3d.py: the camera training loop runs end to
    end (smoke steps) and reports the center-distance AP."""
    monkeypatch.syspath_prepend(str(EXAMPLES))
    monkeypatch.setattr(sys, "argv", ["train_mono3d.py", "--steps", "3"])
    import train_mono3d as demo

    demo.main()
    out = capsys.readouterr().out
    assert "AP@4m center distance" in out
