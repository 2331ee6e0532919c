"""Public differentiable box-op API, drop-in compatible with the reference's
`d3d.box` (d3d/box/__init__.py): `box2d_iou`, `box2d_nms`, `box2dr_crop`,
`box3dp_crop`, `seg1d_iou`, `seg1d_pdist`, `box2dr_pdist`, `box3dr_pdist`.

Inputs may be numpy arrays or jax arrays; numpy in -> numpy out (mirroring
the reference's numpy<->torch convention).  ``precise=True`` upcasts to
float64 — the documented workaround for polygon-clip instability
(reference README.md:31) — which works natively here because the package
enables x64.
"""

import numpy as np
import jax
import jax.numpy as jnp

from . import geometry as G
from . import geometry_soa as GS
from . import nms as _nms

__all__ = [
    "box2d_iou",
    "box2d_nms",
    "box2dr_crop",
    "box3dp_crop",
    "seg1d_iou",
    "seg1d_pdist",
    "box2dr_pdist",
    "box3dr_pdist",
]

_IOU_FNS = {
    "box": G.aabox_iou,
    "rbox": GS.rbox_iou,  # SoA kernel: same math/grads, TPU-lane friendly
    "grbox": G.rbox_giou,
    "drbox": G.rbox_diou,
}


def _maybe_numpy(*arrays):
    isnp = isinstance(arrays[0], np.ndarray)
    if isnp:
        assert all(isinstance(a, np.ndarray) for a in arrays), (
            "Inputs should be all numpy arrays or all jax arrays!"
        )
    return isnp


def box2d_iou(boxes1, boxes2, method="box", precise=True):
    """Differentiable IoU matrix between two box sets.

    :param boxes1: (N, 5) boxes as [x, y, w, h, r]
    :param boxes2: (M, 5)
    :param method: 'box' (axis-aligned AABB of the rotated corners), 'rbox'
        (rotated IoU), 'grbox' (rotated GIoU), 'drbox' (rotated DIoU)
    :param precise: compute in float64
    :return: (N, M) IoU matrix
    """
    convert = _maybe_numpy(boxes1, boxes2)
    if boxes1.ndim != 2 or boxes2.ndim != 2:
        raise ValueError("Input boxes should be 2D (N, 5) arrays!")
    if boxes1.shape[1] != 5 or boxes2.shape[1] != 5:
        raise ValueError("Input boxes should have 5 fields: x, y, w, h, r")
    if method not in _IOU_FNS:
        raise ValueError("Unrecognized iou type!")

    otype = boxes1.dtype
    dt = jnp.float64 if precise else None
    b1 = jnp.asarray(boxes1, dtype=dt)
    b2 = jnp.asarray(boxes2, dtype=dt)
    if (method == "rbox"
            and jnp.result_type(b1.dtype, b2.dtype) == jnp.float32):
        # matrix entry point: picks the Pallas tile kernel on TPU for f32
        out = GS.rbox_iou_matrix(b1, b2)
    else:
        out = _IOU_FNS[method](b1[:, None, :], b2[None, :, :])
    out = out.astype(otype)
    return np.asarray(out) if convert else out


def box2d_nms(
    boxes,
    scores,
    iou_method="box",
    supression_method="hard",
    iou_threshold=0.0,
    score_threshold=0.0,
    supression_param=0.0,
    precise=True,
):
    """NMS on (rotated) 2D boxes; returns the keep mask.

    See :mod:`d3d_tpu.ops.nms` for the TPU formulation and the soft-NMS
    reference (Bodla et al. 2017).
    """
    convert = _maybe_numpy(boxes, scores)
    if len(boxes) != len(scores):
        raise ValueError("Numbers of boxes and scores are inconsistent!")
    if iou_method not in ("box", "rbox"):
        raise ValueError("Unrecognized iou type!")
    if supression_method not in ("hard", "linear", "gaussian"):
        raise ValueError("Unrecognized supression type!")

    dt = jnp.float64 if precise else None
    b = jnp.asarray(boxes, dtype=dt)
    s = jnp.asarray(scores, dtype=dt)
    if s.ndim == 2:
        s = s.max(axis=1)
    if b.size == 0:
        out = jnp.zeros((0,), bool)
    elif supression_method == "hard":
        out = ~_nms.nms2d(
            b, s, iou_threshold=iou_threshold, score_threshold=score_threshold,
            iou_method=iou_method,
        )
    else:
        out = ~_nms.soft_nms2d(
            b, s, iou_threshold=iou_threshold, score_threshold=score_threshold,
            supression_param=supression_param, iou_method=iou_method,
            supression_method=supression_method,
        )
    return np.asarray(out) if convert else out


def crop_mask_2dr(points, boxes):
    """(M boxes, N points) boolean containment matrix for rotated 2D boxes."""
    poly = G.box2poly(jnp.asarray(boxes))
    return G.poly_contains(poly[:, None, :, :], jnp.asarray(points)[None, :, :])


def box2dr_crop(points, boxes):
    """Indices of points inside each rotated box.

    :param points: (N, 2)
    :param boxes: (M, 5)
    :return: list of M index arrays (reference d3d/box/__init__.py:278-287)
    """
    mask = np.asarray(crop_mask_2dr(points, boxes))
    return [np.where(m)[0] for m in mask]


def box3dp_crop(points, boxes, project_axis=2):
    """Boolean (M, N) mask of 3D points inside rotated 3D boxes, testing the
    2D footprint projected along ``project_axis`` plus the interval along it
    (reference d3d/box/__init__.py:289-315).

    :param points: (N, 3)
    :param boxes: (M, 7) as [x, y, z, lx, ly, lz, r]
    """
    convert = _maybe_numpy(points, boxes)
    points = jnp.asarray(points)
    boxes = jnp.asarray(boxes)
    ax2d = [a for a in range(3) if a != project_axis]
    if len(ax2d) != 2:
        raise ValueError("The projection axis can only be 0-x, 1-y and 2-z!")
    points_2d = points[:, ax2d]
    boxes_2d = jnp.concatenate(
        [boxes[:, ax2d], boxes[:, [3 + a for a in ax2d]], boxes[:, 6:7]], axis=1
    )
    mask_2d = crop_mask_2dr(points_2d, boxes_2d)

    pp = points[:, project_axis][None, :]
    bc = boxes[:, project_axis][:, None]
    bd = boxes[:, 3 + project_axis][:, None] / 2
    mask_p = (pp - bd < bc) & (bc < pp + bd)
    out = mask_2d & mask_p
    return np.asarray(out) if convert else out


def seg1d_iou(seg1, seg2):
    """IoU of 1D segments given as (center, width) rows.

    Note: the reference has a bug here (it derives ``dseg2`` from ``seg1``,
    d3d/box/__init__.py:163-164); this implementation is the fixed behavior,
    as recommended in SURVEY.md §7 hard-parts item 5.
    """
    convert = _maybe_numpy(seg1, seg2)
    s1 = jnp.asarray(seg1)
    s2 = jnp.asarray(seg2)
    i, u = G.seg1d_intersection(s1[:, 0], s1[:, 1], s2[:, 0], s2[:, 1])
    return np.asarray(i / u) if convert else i / u


def seg1d_pdist(points, segs):
    """Signed distance from 1D points to (center, width) segments; positive
    inside (reference d3d/box/__init__.py:317-331)."""
    convert = _maybe_numpy(points, segs)
    p = jnp.asarray(points)
    s = jnp.asarray(segs)
    half = s[:, 1] / 2
    smax = s[:, 0] + half
    smin = s[:, 0] - half
    out = jnp.where(p[..., 0] > s[:, 0], smax - p[..., 0], p[..., 0] - smin) \
        if p.ndim > 1 else jnp.where(p > s[:, 0], smax - p, p - smin)
    return np.asarray(out) if convert else out


def box2dr_pdist(points, boxes, method="rbox"):
    """Signed distance from points to rotated 2D box boundaries, positive
    inside. Returns an (M, N) matrix (boxes x points), matching the reference
    kernel layout (d3d/box/dist.cpp:36-49)."""
    if method != "rbox":
        raise ValueError("Only supported rotated boxes by now!")
    convert = _maybe_numpy(points, boxes)
    b = jnp.asarray(boxes)
    p = jnp.asarray(points)
    if b.ndim != 2 or b.shape[1] != 5:
        raise ValueError("Input boxes should have 5 fields: x, y, w, h, r")
    poly = G.box2poly(b)
    out = G.poly_signed_distance(poly[:, None, :, :], p[None, :, :])
    return np.asarray(out) if convert else out


def box3dr_pdist(points, boxes, project_axis=2):
    """Signed distance from 3D points to rotated 3D box surfaces: combines
    the projected 2D signed distance with the 1D interval distance along the
    projection axis (reference d3d/box/__init__.py:351-381)."""
    convert = _maybe_numpy(points, boxes)
    points = jnp.asarray(points)
    boxes = jnp.asarray(boxes)
    ax2d = [a for a in range(3) if a != project_axis]
    if len(ax2d) != 2:
        raise ValueError("The projection axis can only be 0-x, 1-y and 2-z!")
    boxes_2d = jnp.concatenate(
        [boxes[:, ax2d], boxes[:, [3 + a for a in ax2d]], boxes[:, 6:7]], axis=1
    )
    dist_2d = box2dr_pdist(points[:, ax2d], boxes_2d)  # (M, N)

    segs = boxes[:, [project_axis, 3 + project_axis]]
    half = segs[:, 1:2] / 2
    smax = segs[:, 0:1] + half
    smin = segs[:, 0:1] - half
    pp = points[:, project_axis][None, :]
    dist_p = jnp.where(pp > segs[:, 0:1], smax - pp, pp - smin)  # (M, N)

    out = jnp.where(
        dist_p > 0,
        jnp.where(dist_2d > 0, jnp.minimum(dist_p, dist_2d), dist_2d),
        jnp.where(dist_2d > 0, dist_p, -jnp.sqrt(dist_2d**2 + dist_p**2)),
    )
    return np.asarray(out) if convert else out
