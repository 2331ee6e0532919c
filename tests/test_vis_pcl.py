"""The matplotlib fallback of vis/pcl must render everything the
reference's interactive pcl window does (reference d3d/vis/pcl.py:18-113):
wireframe cubes, tid/class/score/variance label text, orientation arrows,
velocity lines, and colormap-by-tid colors. Round-3 VERDICT missing #2.

Assertions are structural (line counts, label strings, per-tid colors)
rather than a golden PNG — they pin the same scene content without
coupling to matplotlib's rasterizer version; a full draw() still runs so
the render path itself is exercised.
"""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from d3d_tpu.abstraction import (ObjectTag, ObjectTarget3D, Target3DArray,
                                 TrackingTarget3D)
from d3d_tpu.dataset.kitti.utils import KittiObjectClass
from d3d_tpu.vis.pcl import visualize_detections


@pytest.fixture
def scene():
    r = Rotation.from_euler("Z", 0.3)
    det = ObjectTarget3D([5, 0, 0], r, [4, 2, 1.6],
                         ObjectTag(KittiObjectClass.Car, scores=0.7),
                         position_var=np.eye(3) * 0.04)
    trk = TrackingTarget3D([10, 3, 0], r, [4, 2, 1.6], [2, 0, 0], [0, 0, 0],
                           ObjectTag(KittiObjectClass.Pedestrian,
                                     scores=0.9), tid=42)
    return Target3DArray([det, trk], frame="velo")


def _ax():
    fig = plt.figure()
    return fig, fig.add_subplot(projection="3d")


def test_mpl_scene_content(scene):
    fig, ax = _ax()
    visualize_detections(ax, "velo", scene, None)

    # 12 wireframe edges + 2 orientation-arrow lines per target, plus one
    # velocity line for the tracked target (pcl.py:92-113 scene content)
    assert len(ax.lines) == 2 * (12 + 2) + 1

    texts = [t.get_text() for t in ax.texts]
    assert len(texts) == 2
    # untracked: "#i: Class (score, pos_std)"
    assert texts[0].startswith("#0: Car")
    assert "0.70" in texts[0]          # tag_top_score < 1 is annotated
    assert "0.20" in texts[0]          # det(position_var)^(1/6)
    # tracked: "tid64: Class (score)"
    assert texts[1].split(":")[1].strip().startswith("Pedestrian")
    assert "0.90" in texts[1]

    fig.canvas.draw()  # the full render path runs
    plt.close(fig)


def test_velocity_line_endpoints(scene):
    fig, ax = _ax()
    visualize_detections(ax, "velo", scene, None, text_scale=0)
    assert not ax.texts  # text_scale <= 0 suppresses labels (ref parity)
    vel_line = ax.lines[-1]
    x, y, z = vel_line.get_data_3d()
    np.testing.assert_allclose([x[0], y[0], z[0]], [10, 3, 0])
    np.testing.assert_allclose([x[1], y[1], z[1]], [12, 3, 0])
    plt.close(fig)


def test_colormap_by_tid(scene):
    """A str box_color is a colormap applied to tid % 256 — different tids
    get different box colors (reference colormap semantics)."""
    fig, ax = _ax()
    visualize_detections(ax, "velo", scene, None, box_color="viridis",
                         text_color="plasma")
    c0 = ax.lines[0].get_color()                # target 0 (tid -> index 0)
    c1 = ax.lines[14].get_color()               # target 1 (tid 42)
    assert c0 != c1
    import matplotlib as mpl

    np.testing.assert_allclose(c1[:3], mpl.colormaps["viridis"](42)[:3])
    plt.close(fig)


def test_wireframe_matches_corners(scene):
    fig, ax = _ax()
    visualize_detections(ax, "velo", scene, None, text_scale=0)
    corners = scene[0].corners
    x, y, z = ax.lines[0].get_data_3d()
    got = np.array([[x[0], y[0], z[0]], [x[1], y[1], z[1]]])
    np.testing.assert_allclose(got, corners[[0, 1]], atol=1e-6)
    plt.close(fig)


# ---------------------------------------------------------------------------
# real pcl-branch execution against a recording stand-in (the optional
# pcl.py wheel is not installable here; the mock satisfies exactly the
# Visualizer API surface the branch calls — reference d3d/vis/pcl.py:18-113)
# ---------------------------------------------------------------------------

class _RecordingVisualizer:
    def __init__(self):
        self.cubes = {}
        self.props = []
        self.texts = {}
        self.lines = {}

    def addCube(self, position, quat_wxyz, lx, ly, lz, id=None, viewport=0):
        self.cubes[id] = (position, quat_wxyz, (lx, ly, lz), viewport)

    def setShapeRenderingProperties(self, prop, id, value):
        self.props.append((prop, id, value))

    def addText3D(self, text, position, text_scale=1.0, color=None, id=None,
                  viewport=0):
        self.texts[id] = (text, position, text_scale, color, viewport)

    def addLine(self, p0, p1, color=None, id=None, viewport=0):
        self.lines[id] = (np.asarray(p0, float), np.asarray(p1, float),
                          color, viewport)


def test_pcl_branch_draw_calls(scene, monkeypatch):
    """Runs vis/pcl.py's REAL pcl branch (not the mpl fallback): inject a
    stub ``pcl`` module so the import succeeds, and assert the drawn
    actors — cube per target with pcl's (w, x, y, z) quat order, opacity +
    color properties, label text, two direction arrows, one velocity line
    for the tracked target, and the id_prefix/viewport routing."""
    import sys
    import types

    monkeypatch.setitem(sys.modules, "pcl", types.ModuleType("pcl"))
    vis = _RecordingVisualizer()
    visualize_detections(vis, "velo", scene, None, id_prefix="det",
                         viewport=3)

    assert set(vis.cubes) == {"det/target0", "det/target1"}
    pos, quat, dims, vp = vis.cubes["det/target0"]
    assert np.allclose(pos, [5, 0, 0]) and dims == (4, 2, 1.6) and vp == 3
    q_xyzw = Rotation.from_euler("Z", 0.3).as_quat()
    assert np.allclose(quat, [q_xyzw[3], *q_xyzw[:3]], atol=1e-12)

    # opacity + color per cube
    assert {p[:2] for p in vis.props} == {
        ("opacity", "det/target0"), ("color", "det/target0"),
        ("opacity", "det/target1"), ("color", "det/target1")}

    assert vis.texts["det/target0/tag"][0].startswith("#0: Car")
    assert vis.texts["det/target1/tag"][0].split(":")[1].strip().startswith(
        "Pedestrian")

    # two direction arrows per target; velocity only for the tracked one
    for i in (0, 1):
        assert f"det/target{i}/direction_1" in vis.lines
        assert f"det/target{i}/direction_2" in vis.lines
    assert "det/target0/velocity" not in vis.lines
    p0, p1, color, vp = vis.lines["det/target1/velocity"]
    assert np.allclose(p1 - p0, [2, 0, 0]) and vp == 3
