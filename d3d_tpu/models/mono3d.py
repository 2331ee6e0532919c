"""Monocular camera 3D detection — seventh model family, first camera
modality.

The reference devkit (cmpute/d3d) ships no models; the dataset layer it
defines (and d3d_tpu reimplements) exposes camera images + calibration
for every loader, and this family consumes them: a CenterNet-style
single-stage monocular 3D detector in the SMOKE recipe (Liu et al.,
CVPRW 2020, arXiv:2002.10111; decode geometry shared with KM3D/MonoDLE)
— keypoint heatmap at the PROJECTED 3D center, per-keypoint depth /
dimension-residual / observation-angle regression, and a closed-form
back-projection through the camera intrinsics. Everything is dense
image-space convs and elementwise decode — MXU/XLA native with zero
custom kernels.

Conventions: camera coordinates are the KITTI rectified-camera frame
(x right, y DOWN, z forward); boxes are [x, y, z, l, w, h, ry] with ry
the rotation about the camera y axis and (x, y, z) the BOTTOM center
(the KITTI label convention). The observation angle
``alpha = ry - atan2(x, z)`` is what the network regresses (it is the
appearance-determined quantity); decode restores ``ry``.
"""

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .centerpoint import _gaussian_radius
from .seg2d import _Block

__all__ = ["Mono3DConfig", "Mono3D", "assign_mono3d_targets",
           "mono3d_loss", "decode_mono3d", "make_train_step",
           "mono3d_to_targets", "make_mono3d_detector",
           "mono3d_gt_from_targets"]


@dataclass(frozen=True)
class Mono3DConfig:
    """Static configuration (hashable -> usable as a jit static arg)."""

    image_size: Tuple[int, int] = (384, 1280)   # (H, W), divisible by 16
    stride: int = 4                             # output stride
    backbone_channels: Tuple[int, ...] = (32, 64, 128)
    head_channels: int = 64
    num_classes: int = 3
    top_k: int = 50
    # per-class dimension priors (l, w, h) — KITTI car/ped/cyclist means
    dim_priors: Tuple[Tuple[float, float, float], ...] = (
        (3.88, 1.63, 1.53), (0.84, 0.66, 1.76), (1.76, 0.60, 1.74))
    max_depth: float = 80.0
    gaussian_overlap: float = 0.7
    min_radius: float = 2.0
    window: int = 25              # gaussian splat window (cells); near
                                  # objects project LARGE — too small a
                                  # window truncates the focal discount
    dtype: str = "float32"

    @property
    def out_size(self):
        return (self.image_size[0] // self.stride,
                self.image_size[1] // self.stride)


class Mono3D(nn.Module):
    """Strided conv backbone -> stride-4 feature map -> SMOKE heads.

    Input: (B, H, W, 3) images in [0, 1]. Outputs (batched dicts):
    ``heatmap`` (B, H/4, W/4, C) logits at projected 3D centers,
    ``offset`` (2) sub-cell, ``depth`` (1) sigmoid-transformed,
    ``dim`` (3) log-residuals from the class priors, ``rot`` (2)
    (sin, cos) of the observation angle alpha."""

    cfg: Mono3DConfig

    @nn.compact
    def __call__(self, images, train: bool = False):
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        x = images.astype(dt)
        # /2 stem, then one stride-2 stage per backbone channel entry
        # (the conv+BN+relu block is shared with Seg2D)
        x = _Block(cfg.backbone_channels[0], 2, cfg.dtype)(x, train)
        for ch in cfg.backbone_channels:
            x = _Block(ch, 2, cfg.dtype)(x, train)
        # transpose-conv back up to the output stride
        ups = len(cfg.backbone_channels) + 1 - int(np.log2(cfg.stride))
        for _ in range(ups):
            x = _Block(cfg.head_channels, 2, cfg.dtype,
                       transpose=True)(x, train)

        def head(n_out, name, bias_init=0.0):
            y = nn.Conv(cfg.head_channels, (3, 3), padding="SAME",
                        dtype=dt, name=f"{name}_conv")(x)
            return nn.Conv(n_out, (1, 1), dtype=dt, name=f"{name}_out",
                           bias_init=nn.initializers.constant(
                               bias_init))(nn.relu(y))

        return dict(
            heatmap=head(cfg.num_classes, "hm", -2.19).astype(jnp.float32),
            offset=head(2, "offset").astype(jnp.float32),
            depth=head(1, "depth").astype(jnp.float32),
            dim=head(3, "dim").astype(jnp.float32),
            rot=head(2, "rot").astype(jnp.float32),
        )


def _depth_decode(d):
    """SMOKE's unbounded-positive depth transform."""
    return 1.0 / jax.nn.sigmoid(d) - 1.0


def _depth_encode(z):
    # inverse of _depth_decode: logit(1 / (z + 1))
    p = 1.0 / (z + 1.0)
    return jnp.log(p) - jnp.log1p(-p)


@partial(jax.jit, static_argnames=("cfg",))
def assign_mono3d_targets(cfg: Mono3DConfig, intrinsics, gt_boxes,
                          gt_labels, gt_mask):
    """One frame of SMOKE targets from camera-frame 3D ground truth.

    :param intrinsics: (3, 3) camera matrix for the (resized) image
    :param gt_boxes: (M, 7) [x, y, z, l, w, h, ry] camera-frame boxes
        (bottom-center origin, KITTI label convention)
    :returns: dict(heatmap (h, w, C), vec (M, 8) regression targets
        [du, dv, depth_enc, log-dim residuals (3), sin a, cos a],
        cell (M,) i32 flat center cell (-1 = unassigned), mask (M,))
    """
    h, w = cfg.out_size
    s = float(cfg.stride)
    m = gt_boxes.shape[0]
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]

    x3, y3, z3 = gt_boxes[:, 0], gt_boxes[:, 1], gt_boxes[:, 2]
    yc = y3 - gt_boxes[:, 5] / 2                 # geometric 3D center
    zc = jnp.maximum(z3, 1e-3)
    u = (fx * x3 / zc + cx) / s                  # projected center, cells
    v = (fy * yc / zc + cy) / s
    iu = jnp.floor(u).astype(jnp.int32)
    iv = jnp.floor(v).astype(jnp.int32)
    inside = (z3 > 0.5) & (z3 < cfg.max_depth) & gt_mask \
        & (u >= 0) & (u < w) & (v >= 0) & (v < h)

    # gaussian radius from the projected box extent (cells)
    wpix = fx * gt_boxes[:, 3] / zc / s
    hpix = fy * gt_boxes[:, 5] / zc / s
    radius = jnp.maximum(
        _gaussian_radius(jnp.maximum(wpix, 1.0), jnp.maximum(hpix, 1.0),
                         cfg.gaussian_overlap),
        cfg.min_radius).astype(jnp.float32)
    sigma2 = jnp.maximum((2 * radius / 3.0) ** 2, 1e-6)

    win = cfg.window
    half = win // 2
    dxs = jnp.arange(win, dtype=jnp.int32) - half
    gu = iu[:, None, None] + dxs[None, :, None]
    gv = iv[:, None, None] + dxs[None, None, :]
    d2 = ((gu - iu[:, None, None]) ** 2
          + (gv - iv[:, None, None]) ** 2).astype(jnp.float32)
    val = jnp.exp(-d2 / (2 * sigma2[:, None, None]))
    okw = (inside[:, None, None] & (gu >= 0) & (gu < w)
           & (gv >= 0) & (gv < h) & (val > 1e-4))
    flat = jnp.where(okw, gv * w + gu, w * h)    # row-major (v, u)
    cls = jnp.broadcast_to(
        jnp.maximum(gt_labels, 0)[:, None, None], (m, win, win))
    heat = jnp.zeros((w * h + 1, cfg.num_classes), jnp.float32)
    heat = heat.at[flat.reshape(-1), cls.reshape(-1)].max(
        jnp.where(okw, val, 0.0).reshape(-1))
    heatmap = heat[:-1].reshape(h, w, cfg.num_classes)

    priors = jnp.asarray(cfg.dim_priors, jnp.float32)[
        jnp.maximum(gt_labels, 0)]
    alpha = gt_boxes[:, 6] - jnp.arctan2(x3, zc)
    vec = jnp.stack([
        u - iu.astype(jnp.float32), v - iv.astype(jnp.float32),
        _depth_encode(zc),
        jnp.log(jnp.maximum(gt_boxes[:, 3], 1e-3) / priors[:, 0]),
        jnp.log(jnp.maximum(gt_boxes[:, 4], 1e-3) / priors[:, 1]),
        jnp.log(jnp.maximum(gt_boxes[:, 5], 1e-3) / priors[:, 2]),
        jnp.sin(alpha), jnp.cos(alpha),
    ], axis=-1)
    cell = jnp.where(inside, iv * w + iu, -1)
    return dict(heatmap=heatmap, vec=vec, cell=cell.astype(jnp.int32),
                mask=inside)


def mono3d_loss(outputs, targets):
    """Penalty-reduced focal + masked L1 at center cells (batched)."""
    hm = jnp.clip(jax.nn.sigmoid(outputs["heatmap"]), 1e-5, 1 - 1e-5)
    t = targets["heatmap"]
    pos = t >= 1.0 - 1e-6
    npos = jnp.maximum(jnp.sum(pos), 1).astype(jnp.float32)
    pos_l = -((1 - hm) ** 2) * jnp.log(hm) * pos
    neg_l = -((1 - t) ** 4) * (hm ** 2) * jnp.log(1 - hm) * ~pos
    hm_loss = (jnp.sum(pos_l) + jnp.sum(neg_l)) / npos

    b = outputs["heatmap"].shape[0]
    hw = t.shape[1] * t.shape[2]
    pred = jnp.concatenate(
        [outputs["offset"], outputs["depth"], outputs["dim"],
         outputs["rot"]], axis=-1).reshape(b, hw, 8)
    cell = jnp.maximum(targets["cell"], 0)
    at = jnp.take_along_axis(pred, cell[..., None], axis=1)
    l1 = jnp.abs(at - targets["vec"]) \
        * targets["mask"][..., None].astype(jnp.float32)
    reg_loss = jnp.sum(l1) / npos
    total = hm_loss + reg_loss
    return total, dict(hm=hm_loss, reg=reg_loss, total=total)


@partial(jax.jit, static_argnames=("cfg",))
def decode_mono3d(cfg: Mono3DConfig, outputs, intrinsics):
    """Peak top-k + closed-form back-projection -> (K, 7) camera-frame
    boxes, scores, labels (one frame)."""
    h, w = cfg.out_size
    s = float(cfg.stride)
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]

    hm = jax.nn.sigmoid(outputs["heatmap"])
    pooled = jax.lax.reduce_window(
        hm, -jnp.inf, jax.lax.max, (3, 3, 1), (1, 1, 1), "SAME")
    peaks = jnp.where(hm >= pooled, hm, 0.0)
    scores, idx = jax.lax.top_k(peaks.reshape(-1), cfg.top_k)
    cell = (idx // cfg.num_classes).astype(jnp.int32)
    labels = (idx % cfg.num_classes).astype(jnp.int32)
    iv = cell // w
    iu = cell % w

    hw = h * w
    vec = jnp.concatenate(
        [outputs["offset"], outputs["depth"], outputs["dim"],
         outputs["rot"]], axis=-1).reshape(hw, 8)[cell]
    z = _depth_decode(vec[:, 2])
    u = (iu.astype(jnp.float32) + vec[:, 0]) * s
    v = (iv.astype(jnp.float32) + vec[:, 1]) * s
    x3 = (u - cx) * z / fx
    yc = (v - cy) * z / fy
    priors = jnp.asarray(cfg.dim_priors, jnp.float32)[labels]
    dims = priors * jnp.exp(vec[:, 3:6])
    y3 = yc + dims[:, 2] / 2                     # back to bottom center
    alpha = jnp.arctan2(vec[:, 6], vec[:, 7])
    ry = alpha + jnp.arctan2(x3, jnp.maximum(z, 1e-3))
    boxes = jnp.stack([x3, y3, z, dims[:, 0], dims[:, 1], dims[:, 2],
                       ry], axis=-1)
    return boxes, scores, labels


def make_train_step(model, optimizer, cfg: Mono3DConfig, remat=False):
    """``step(params, batch_stats, opt_state, batch) -> (new..., aux)``.
    ``batch``: images (B, H, W, 3), intrinsics (B, 3, 3), gt_boxes
    (B, M, 7) camera frame, gt_labels (B, M), gt_mask (B, M)."""

    def forward(params, batch_stats, batch):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"], train=True, mutable=["batch_stats"])

    if remat:
        forward = jax.checkpoint(
            forward,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)

    def loss_fn(params, batch_stats, batch):
        outputs, updates = forward(params, batch_stats, batch)
        targets = jax.vmap(
            lambda k, bx, l, m: assign_mono3d_targets(cfg, k, bx, l, m)
        )(batch["intrinsics"], batch["gt_boxes"], batch["gt_labels"],
          batch["gt_mask"])
        loss, aux = mono3d_loss(outputs, targets)
        return loss, (updates["batch_stats"], aux)

    def train_step(params, batch_stats, opt_state, batch):
        (loss, (new_bs, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, new_bs, opt_state, aux

    return train_step


def mono3d_to_targets(boxes, scores, labels, classes, cam_to_velo=None,
                      frame="cam", timestamp=0, score_threshold=0.3):
    """Decoded camera-frame boxes -> ``Target3DArray``.

    Mirrors the KITTI label convention exactly as the object loader's
    ``parse_label`` does (d3d_tpu.dataset.kitti.object): bottom-center
    -> geometric center, camera (l, h, w) axes -> FLU via the
    ``R_x(pi/2)`` append, and — when ``cam_to_velo=(rrect, hr, ht)`` is
    given (see ``_cam_to_velo``) — rectified-camera -> velo transforms
    for positions and orientations. Without it, targets stay in the
    camera frame with the same orientation convention.
    """
    from scipy.spatial.transform import Rotation

    from ..abstraction import ObjectTag, ObjectTarget3D, Target3DArray

    boxes, scores, labels = (np.asarray(a) for a in
                             (boxes, scores, labels))
    sel = (scores >= score_threshold) & np.isfinite(boxes).all(axis=-1)
    boxes, scores, labels = boxes[sel], scores[sel], labels[sel]
    out = Target3DArray(frame=frame, timestamp=timestamp)
    if not len(boxes):
        return out

    pos = boxes[:, :3].copy()
    pos[:, 1] -= boxes[:, 5] / 2          # bottom center -> box center
    base = Rotation.identity()
    if cam_to_velo is not None:
        rrect, hr, ht = cam_to_velo
        pos = pos @ rrect.inv().as_matrix().T
        pos = (pos - ht) @ hr.inv().as_matrix().T
        base = hr.inv() * rrect.inv()
    rot = base * Rotation.from_euler("y", boxes[:, 6:7]) \
        * Rotation.from_euler("x", np.pi / 2)
    if rot.single:  # scipy collapses a length-1 composition
        rot = Rotation.concatenate([rot])
    for i in range(len(boxes)):
        tag = ObjectTag(cls := classes[int(labels[i])], type(cls),
                        float(scores[i]))
        out.append(ObjectTarget3D(
            pos[i], rot[i],
            [boxes[i, 3], boxes[i, 4], boxes[i, 5]], tag))
    return out


def make_mono3d_detector(model, variables, cfg: Mono3DConfig, classes,
                         cam_to_velo=None, score_threshold=0.3):
    """Build ``detect(image, intrinsics, frame=None, timestamp=0) ->
    Target3DArray`` for a trained Mono3D model. The peak max-pool in
    decode is the NMS (CenterNet-style — no box suppression pass).

    :param cam_to_velo: optional ``(rrect, hr, ht)`` rectified-camera ->
        velo calib trio (``d3d_tpu.dataset.kitti.object._cam_to_velo``);
        targets come out in the velo frame when given, camera frame
        otherwise."""

    @jax.jit
    def device(image, intrinsics):
        outputs = model.apply(variables, image[None], train=False)
        outputs = jax.tree.map(lambda x: x[0], outputs)
        return decode_mono3d(cfg, outputs, intrinsics)

    def detect(image, intrinsics, frame=None, timestamp=0):
        boxes, scores, labels = device(
            jnp.asarray(image, jnp.float32),
            jnp.asarray(intrinsics, jnp.float32))
        return mono3d_to_targets(
            boxes, scores, labels, classes, cam_to_velo=cam_to_velo,
            frame=frame or ("velo" if cam_to_velo else "cam"),
            timestamp=timestamp, score_threshold=score_threshold)

    detect.device_fn = device  # exportable pipeline (d3d_tpu.export)
    return detect


def mono3d_gt_from_targets(targets, cam_to_velo=None):
    """Velo-frame ``Target3DArray`` ground truth -> (M, 7) camera-frame
    [x, y, z, l, w, h, ry] bottom-center boxes + (M,) int labels — the
    training-data path from the dataset loaders (which emit velo-frame
    objects) into :func:`assign_mono3d_targets`. Exact inverse of
    :func:`mono3d_to_targets` (roundtrip-tested against the KITTI
    loader's convention).

    :param cam_to_velo: ``(rrect, hr, ht)`` calib trio; None = targets
        already in the camera frame's convention
    """
    from scipy.spatial.transform import Rotation

    n = len(targets)
    boxes = np.zeros((n, 7), np.float32)
    labels = np.zeros(n, np.int64)
    if not n:
        return boxes, labels
    cols = targets.columns()
    pos = cols["position"].astype(np.float64)
    base = Rotation.identity()
    if cam_to_velo is not None:
        rrect, hr, ht = cam_to_velo
        pos = pos @ hr.as_matrix().T + ht
        pos = pos @ rrect.as_matrix().T
        base = hr.inv() * rrect.inv()
    rot = Rotation.from_quat(cols["quat"].astype(np.float64))
    # orientation = base * R_y(ry) * R_x(pi/2)  =>  recover ry
    ry_rot = base.inv() * rot * Rotation.from_euler("x", -np.pi / 2)
    ry = ry_rot.as_euler("yxz")[..., 0]
    dims = cols["dimension"]
    boxes[:, 0] = pos[:, 0]
    boxes[:, 1] = pos[:, 1] + dims[:, 2] / 2     # center -> bottom
    boxes[:, 2] = pos[:, 2]
    boxes[:, 3:6] = dims
    boxes[:, 6] = ry
    labels[:] = cols["label"]
    return boxes, labels
