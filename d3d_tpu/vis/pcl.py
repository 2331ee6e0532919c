"""3D point-cloud visualization (reference d3d/vis/pcl.py draws into a
`pcl.py` Visualizer; that package is optional and rarely available, so this
module also provides a matplotlib 3D fallback)."""

import numpy as np

__all__ = ["visualize_detections"]


def _tid_color(tid):
    """Deterministic RGB per tracking id (stable across processes:
    hash() is randomized for strings by PYTHONHASHSEED)."""
    import zlib

    rng = np.random.default_rng(zlib.crc32(str(tid).encode()))
    return tuple(rng.random(3) * 0.8 + 0.2)


def visualize_detections(visualizer, frame, targets, calib, text_scale=0.8,
                         box_color=(1, 1, 1), text_color=(1, 0.8, 1),
                         id_colored=False, tags=None):
    """Add detection boxes (+ labels) to a `pcl.py` Visualizer.

    Falls back to :func:`visualize_detections_mpl` semantics if the pcl
    package is missing and ``visualizer`` is a matplotlib 3D axis.
    """
    try:
        import pcl  # noqa: F401
        has_pcl = hasattr(visualizer, "addCube")
    except ImportError:
        has_pcl = False

    if targets.frame != frame:
        targets = calib.transform_objects(targets, frame_to=frame)

    for i, target in enumerate(targets.filter_tag(tags)):
        color = _tid_color(target.tid) if id_colored and target.tid \
            else box_color
        if has_pcl:
            lx, ly, lz = target.dimension
            q = target.orientation.as_quat()
            visualizer.addCube(
                list(target.position), [q[3], q[0], q[1], q[2]],
                lx, ly, lz, id=f"target{i}")
            visualizer.setShapeRenderingProperties(
                "color", f"target{i}", color)
            disp = "#%d: %s" % (target.tid or i, target.tag_top.name)
            visualizer.addText3D(
                disp, list(target.position + [0, 0, target.dimension[2]]),
                text_scale=text_scale, color=text_color,
                id=f"target{i}/text")
        else:
            _draw_wireframe_mpl(visualizer, target, color)


def _draw_wireframe_mpl(ax, target, color):
    corners = target.corners
    pairs = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 4), (1, 5), (2, 6), (3, 7),
             (0, 2), (1, 3), (4, 6), (5, 7)]
    for i, j in pairs:
        ax.plot([corners[i, 0], corners[j, 0]],
                [corners[i, 1], corners[j, 1]],
                [corners[i, 2], corners[j, 2]], color=color)
