"""End-to-end inference: points in, :class:`Target3DArray` out.

Glues the model families to the framework's own post-processing (decode ->
rotated NMS -> data model), mirroring how the reference devkit's pieces are
meant to be combined downstream (its README pipeline: detector output ->
`d3d.box` NMS -> `d3d.abstraction` arrays -> evaluators). Each factory
closes over the model and jits ONE fixed-shape device function (top-k keeps
every shape static); only the final Target3DArray assembly runs on host.
"""

import numpy as np
import jax
import jax.numpy as jnp
from ..abstraction import ObjectTag, Target3DArray
from ..ops.nms import nms2d
from .pointpillars import decode_boxes, pillarize
from .centerpoint import decode_centers

__all__ = ["make_pointpillars_detector", "make_centerpoint_detector",
           "make_second_detector", "make_sst_detector",
           "make_voxelnext_detector"]


def _to_targets(boxes, scores, labels, keep, classes, frame, timestamp,
                score_threshold):
    """Host-side assembly of kept detections into a Target3DArray — one
    vectorized mask + ``Target3DArray.from_columns`` (the dense decode
    outputs become the array's struct-of-arrays backing directly)."""
    boxes, scores, labels, keep = (np.asarray(a) for a in
                                   (boxes, scores, labels, keep))
    sel = (keep & (scores >= score_threshold)
           & np.all(np.isfinite(boxes), axis=-1))
    boxes, scores, labels = boxes[sel], scores[sel], labels[sel]
    tags = [ObjectTag(cls := classes[int(l)], type(cls), float(s))
            for l, s in zip(labels, scores)]
    return Target3DArray.from_columns(
        positions=boxes[:, 0:3], dimensions=boxes[:, 3:6],
        yaws=boxes[:, 6], tags=tags, frame=frame, timestamp=timestamp)


def _bev(boxes):
    return jnp.concatenate([boxes[:, 0:2], boxes[:, 3:5], boxes[:, 6:7]],
                           axis=-1).astype(jnp.float32)


def _to_tracking_targets(boxes, scores, labels, keep, vel, classes, frame,
                         timestamp, score_threshold):
    """Like :func:`_to_targets` but emits :class:`TrackingTarget3D` with
    the decoded BEV velocities — the input format of
    :class:`d3d_tpu.tracking.CenterTracker` and the tracking evaluator.
    Columnar construction like ``from_columns`` (no per-box scipy)."""
    from ..abstraction import TrackingTarget3D

    boxes, scores, labels, keep, vel = (np.asarray(a) for a in
                                        (boxes, scores, labels, keep, vel))
    sel = (keep & (scores >= score_threshold)
           & np.all(np.isfinite(boxes), axis=-1))
    boxes, scores, labels, vel = boxes[sel], scores[sel], labels[sel], \
        vel[sel]
    n = len(boxes)
    y = boxes[:, 6].astype(np.float64)
    quats = np.zeros((n, 4), np.float32)
    quats[:, 2] = np.sin(y / 2)
    quats[:, 3] = np.cos(y / 2)
    vel3 = np.zeros((n, 3), np.float32)
    vel3[:, :2] = vel
    cols = dict(
        position=np.ascontiguousarray(boxes[:, 0:3], np.float32),
        dimension=np.ascontiguousarray(boxes[:, 3:6], np.float32),
        quat=quats,
        position_var=np.zeros((n, 3, 3), np.float32),
        dimension_var=np.zeros((n, 3, 3), np.float32),
        velocity=vel3,
        angular_velocity=np.zeros((n, 3), np.float32),
        velocity_var=np.zeros((n, 3, 3), np.float32),
        angular_velocity_var=np.zeros((n, 3, 3), np.float32),
    )
    tags = [ObjectTag(cls := classes[int(l)], type(cls), float(s))
            for l, s in zip(labels, scores)]
    return Target3DArray._from_backed_columns(
        TrackingTarget3D, cols, tags, np.zeros(n, np.float32),
        frame=frame, timestamp=timestamp)


def _make_anchor_detector(model, variables, cfg, anchors, classes,
                          voxelize_fn, score_threshold, iou_threshold,
                          top_k):
    """Shared factory for the anchor-head families (PointPillars, SECOND):
    voxelize -> heads -> top-k decode (incl. the direction classifier:
    arcsin only recovers yaw up to pi, the trained dir head supplies the
    flip) -> rotated NMS -> Target3DArray."""

    @jax.jit
    def device(points):
        feats, coords, valid = voxelize_fn(points, cfg)
        cls_logits, box_preds, dir_logits = model.apply(
            variables, feats[None], coords[None], valid[None], train=False)
        scores_all = jax.nn.sigmoid(cls_logits[0])        # (N, C)
        best = jnp.max(scores_all, axis=-1)
        top_scores, idx = jax.lax.top_k(best, top_k)
        boxes = decode_boxes(anchors[idx], box_preds[0][idx])
        # direction head disambiguates the arcsin yaw (training target:
        # residual mod 2pi > pi -> class 1 -> add pi)
        flip = jnp.argmax(dir_logits[0][idx], axis=-1).astype(boxes.dtype)
        boxes = boxes.at[:, 6].add(flip * jnp.pi)
        labels = jnp.argmax(scores_all, axis=-1)[idx]
        keep = ~nms2d(_bev(boxes), top_scores.astype(jnp.float32),
                      iou_threshold=iou_threshold, iou_method="rbox")
        return boxes, top_scores, labels, keep

    def detect(points, frame=None, timestamp=0):
        boxes, scores, labels, keep = device(
            jnp.asarray(points, jnp.float32))
        return _to_targets(boxes, scores, labels, keep, classes, frame,
                           timestamp, score_threshold)

    detect.device_fn = device  # exportable pipeline (d3d_tpu.export)
    return detect


def make_pointpillars_detector(model, variables, cfg, anchors, classes,
                               score_threshold=0.3, iou_threshold=0.5,
                               top_k=100):
    """Build ``detect(points, frame=None, timestamp=0) -> Target3DArray``
    for a trained PointPillars model (jitted once)."""
    return _make_anchor_detector(model, variables, cfg, anchors, classes,
                                 pillarize, score_threshold, iou_threshold,
                                 top_k)


def make_sst_detector(model, variables, cfg, anchors, classes,
                      score_threshold=0.3, iou_threshold=0.5, top_k=100):
    """Build ``detect(points, frame=None, timestamp=0) -> Target3DArray``
    for a trained SST model (PointPillars-compatible anchor head at the
    full single-stride grid)."""
    return _make_anchor_detector(model, variables, cfg, anchors, classes,
                                 pillarize, score_threshold, iou_threshold,
                                 top_k)


def make_centerpoint_detector(model, variables, cfg, pillar_cfg, classes,
                              score_threshold=0.3, iou_threshold=0.5,
                              refine=None):
    """Build ``detect(points, frame=None, timestamp=0) -> Target3DArray``
    for a trained CenterPoint model (top-k set by ``cfg.top_k``).

    :param refine: optional ``(refine_model, refine_variables,
        refine_cfg)`` second stage (:mod:`d3d_tpu.models.centerpoint2`) —
        requires the first stage built with ``return_feat=True``; applies
        the box residuals and fuses the IoU-aware confidence into the
        score before NMS (still one jitted program)."""
    if refine is not None and not getattr(model, "return_feat", False):
        raise ValueError(
            "the refine stage pools the shared BEV map: build the first "
            "stage with CenterPoint(cfg, return_feat=True)")

    @jax.jit
    def device(points):
        feats, coords, valid = pillarize(points, pillar_cfg)
        outputs = model.apply(variables, feats[None], coords[None],
                              valid[None], train=False)
        outputs = jax.tree.map(lambda x: x[0], outputs)
        feat = outputs.pop("feat", None)
        dec = decode_centers(cfg, outputs)
        boxes, scores, labels = dec[:3]
        vel = dec[3] if cfg.predict_velocity else jnp.zeros(
            (boxes.shape[0], 2), jnp.float32)
        if refine is not None:
            from .centerpoint2 import apply_refinements, roi_grid_features

            rmodel, rvars, rcfg = refine
            pooled = roi_grid_features(feat, boxes, cfg.bounds, cfg.grid,
                                       rcfg.grid_points)
            out = rmodel.apply(rvars, pooled, boxes, train=False)
            boxes = apply_refinements(boxes, out["deltas"])
            a = rcfg.score_alpha
            scores = (scores ** (1 - a)
                      * jax.nn.sigmoid(out["conf"]) ** a)
        keep = ~nms2d(_bev(boxes), scores.astype(jnp.float32),
                      iou_threshold=iou_threshold, iou_method="rbox")
        return boxes, scores, labels, keep, vel

    def detect(points, frame=None, timestamp=0):
        boxes, scores, labels, keep, vel = device(
            jnp.asarray(points, jnp.float32))
        if not cfg.predict_velocity:
            return _to_targets(boxes, scores, labels, keep, classes, frame,
                               timestamp, score_threshold)
        return _to_tracking_targets(boxes, scores, labels, keep, vel,
                                    classes, frame, timestamp,
                                    score_threshold)

    detect.device_fn = device  # exportable pipeline (d3d_tpu.export)
    return detect


def make_second_detector(model, variables, cfg, anchors, classes,
                         score_threshold=0.3, iou_threshold=0.5,
                         top_k=100):
    """Build ``detect(points, frame=None, timestamp=0) -> Target3DArray``
    for a trained SECOND model (head outputs are PointPillars-compatible,
    only the voxelization front-end differs)."""
    from .second import second_voxelize

    return _make_anchor_detector(model, variables, cfg, anchors, classes,
                                 second_voxelize, score_threshold,
                                 iou_threshold, top_k)


def make_voxelnext_detector(model, variables, cfg, classes,
                            score_threshold=0.3, iou_threshold=0.5):
    """Build ``detect(points, frame=None, timestamp=0) -> Target3DArray``
    for a trained VoxelNeXt model (fully sparse: decode reads the active
    BEV sites; top-k set by ``cfg.top_k``). With
    ``cfg.predict_velocity`` the detector emits ``TrackingTarget3D`` and
    its ``device_fn`` the 5-output contract — ready for
    :class:`~d3d_tpu.tracking.CenterTracker` or the fused
    :func:`~d3d_tpu.tracking.make_tracking_step`."""
    from .voxelnext import decode_voxelnext, voxelnext_voxelize

    @jax.jit
    def device(points):
        feats, coords, valid = voxelnext_voxelize(points, cfg)
        outputs = model.apply(variables, feats[None], coords[None],
                              valid[None], train=False)
        outputs = jax.tree.map(lambda x: x[0], outputs)
        dec = decode_voxelnext(cfg, outputs)
        boxes, scores, labels = dec[:3]
        keep = ~nms2d(_bev(boxes), scores.astype(jnp.float32),
                      iou_threshold=iou_threshold, iou_method="rbox")
        if cfg.predict_velocity:
            return boxes, scores, labels, keep, dec[3]
        return boxes, scores, labels, keep

    def detect(points, frame=None, timestamp=0):
        out = device(jnp.asarray(points, jnp.float32))
        if len(out) > 4:
            return _to_tracking_targets(*out, classes, frame, timestamp,
                                        score_threshold)
        return _to_targets(*out, classes, frame, timestamp,
                           score_threshold)

    detect.device_fn = device  # exportable pipeline (d3d_tpu.export)
    return detect
