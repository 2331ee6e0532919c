"""Test-time augmentation: flip-ensemble detection as ONE jitted program.

The standard leaderboard/serving trick (e.g. CenterPoint's "double-flip"
testing): run the detector on the original cloud and on mirrored copies,
un-mirror the boxes, and merge all candidate sets with one final rotated
NMS. Shapes stay fixed (k passes x top_k candidates), so the whole
ensemble remains a single device program — no host round-trips between
passes.

Works uniformly over every detector factory in
:mod:`d3d_tpu.models.inference`: it wraps the factory's ``device_fn``
(``points -> (boxes, scores, labels, keep[, vel])``) and returns a
``detect`` with the same Target3DArray contract.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.nms import nms2d

__all__ = ["make_tta_detector", "FLIP_MODES"]

FLIP_MODES = ("none", "flip_y", "flip_x", "flip_xy")


def _flip_points(points, mode):
    if mode == "none":
        return points
    sx = -1.0 if mode in ("flip_x", "flip_xy") else 1.0
    sy = -1.0 if mode in ("flip_y", "flip_xy") else 1.0
    scale = jnp.asarray([sx, sy] + [1.0] * (points.shape[1] - 2),
                        points.dtype)
    return points * scale


def _unflip_boxes(boxes, vel, mode):
    """Mirror detector outputs back to the original frame. For a y-flip
    the yaw negates; for an x-flip it reflects to pi - yaw."""
    if mode == "none":
        return boxes, vel
    fx = mode in ("flip_x", "flip_xy")
    fy = mode in ("flip_y", "flip_xy")
    x = -boxes[:, 0] if fx else boxes[:, 0]
    y = -boxes[:, 1] if fy else boxes[:, 1]
    yaw = boxes[:, 6]
    if fy:
        yaw = -yaw
    if fx:
        yaw = jnp.pi - yaw
    out = jnp.stack([x, y, boxes[:, 2], boxes[:, 3], boxes[:, 4],
                     boxes[:, 5], yaw], axis=-1)
    if vel is None:
        return out, None
    vx = -vel[:, 0] if fx else vel[:, 0]
    vy = -vel[:, 1] if fy else vel[:, 1]
    return out, jnp.stack([vx, vy], axis=-1)


def make_tta_detector(detect, classes, modes=("none", "flip_y"),
                      score_threshold=0.3, iou_threshold=0.5):
    """Wrap a detector factory's output with a flip ensemble.

    :param detect: a ``detect`` closure from a ``make_*_detector``
        factory (its ``.device_fn`` is wrapped)
    :param classes: same class list the base detector was built with
    :param modes: subset of :data:`FLIP_MODES`; "none" should normally
        be included
    :returns: ``tta(points, frame=None, timestamp=0) -> Target3DArray``
        with ``.device_fn`` (exportable like the base detectors)
    """
    from .inference import _bev, _to_targets, _to_tracking_targets

    base = detect.device_fn
    for m in modes:
        if m not in FLIP_MODES:
            raise ValueError("unknown TTA mode %r" % (m,))

    @jax.jit
    def device(points):
        all_boxes, all_scores, all_labels, all_vel = [], [], [], []
        has_vel = False
        for mode in modes:
            out = base(_flip_points(points, mode))
            boxes, scores, labels, keep = out[:4]
            vel = out[4] if len(out) > 4 else None
            has_vel = has_vel or vel is not None
            boxes, vel = _unflip_boxes(boxes, vel, mode)
            # suppressed candidates drop out of the merge via score 0
            all_boxes.append(boxes)
            all_scores.append(jnp.where(keep, scores, 0.0))
            all_labels.append(labels)
            all_vel.append(jnp.zeros((boxes.shape[0], 2), jnp.float32)
                           if vel is None else vel)
        boxes = jnp.concatenate(all_boxes)
        scores = jnp.concatenate(all_scores).astype(jnp.float32)
        labels = jnp.concatenate(all_labels)
        keep = ~nms2d(_bev(boxes), scores, iou_threshold=iou_threshold,
                      iou_method="rbox")
        keep = keep & (scores > 0)
        if has_vel:  # velocity-head detectors keep their 5-tuple contract
            return boxes, scores, labels, keep, jnp.concatenate(all_vel)
        return boxes, scores, labels, keep

    def tta(points, frame=None, timestamp=0):
        out = device(jnp.asarray(points, jnp.float32))
        if len(out) > 4:
            return _to_tracking_targets(*out, classes, frame, timestamp,
                                        score_threshold)
        return _to_targets(*out, classes, frame, timestamp,
                           score_threshold)

    tta.device_fn = device
    return tta
