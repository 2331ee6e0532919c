"""Two-stage CenterPoint: RoI-grid BEV pooling + IoU-aware refinement.

The serving configuration of Yin et al.'s CVPR 2021 paper (§4 two-stage
variant, a.k.a. "CenterPoint++"): the first stage's top-k proposals pool
features from the shared BEV map on a rotated in-box grid, and a small
MLP predicts (a) an IoU-aware confidence used to rectify the heatmap
score and (b) a box residual. Everything is fixed-shape (K proposals per
frame), so the whole two-stage pipeline remains ONE jitted program.

TPU-first mapping:

  * the rotated RoI grid gather is the framework's own
    :func:`d3d_tpu.ops.point.aligned_scatter` bilinear path (the
    reference-parity op, d3d/point/scatter.cpp) — no new gather code;
  * the refinement MLP batches all B*K proposals into one matmul stack
    (MXU) — there is no per-RoI loop anywhere;
  * training targets (best-overlap matching) use the SoA rotated-IoU
    matrix kernel (:func:`d3d_tpu.ops.geometry_soa.rbox_iou_matrix`).

Score fusion at inference follows the CenterPoint++ geometric mean:
``score = score_1st^(1-alpha) * sigmoid(conf)^alpha``.
"""

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.point import aligned_scatter

__all__ = ["RefineConfig", "CenterPointRefine", "roi_grid_features",
           "apply_refinements", "encode_refinement_targets", "refine_loss",
           "make_refine_train_step"]


@dataclass(frozen=True)
class RefineConfig:
    """Static second-stage configuration."""

    grid_points: int = 6          # G: G x G rotated in-box sample grid
    hidden: Tuple[int, ...] = (128, 128)
    fg_iou: float = 0.55          # residual loss gate
    conf_lo: float = 0.25         # conf target ramp: 0 below, 1 above
    conf_hi: float = 0.75
    score_alpha: float = 0.5      # score fusion exponent
    dtype: str = "float32"


def roi_grid_features(feat, boxes, bounds, grid, n_grid):
    """Pool BEV features on a rotated G x G grid inside each box.

    :param feat: (W, H, C) BEV feature map of one frame
    :param boxes: (K, 7) [x, y, z, l, w, h, yaw]
    :param bounds: the model's (xmin, xmax, ymin, ymax, ...) bounds
    :param grid: (W, H) canvas shape
    :param n_grid: G
    :returns: (K, G*G*C) pooled features (bilinear, border-clamped)
    """
    w, h = grid
    vx = (bounds[1] - bounds[0]) / w
    vy = (bounds[3] - bounds[2]) / h
    k = boxes.shape[0]
    u = jnp.linspace(-0.5, 0.5, n_grid, dtype=jnp.float32)
    gu, gv = jnp.meshgrid(u, u, indexing="ij")            # (G, G) box frame
    lu = gu[None] * boxes[:, 3, None, None]               # (K, G, G) meters
    lv = gv[None] * boxes[:, 4, None, None]
    c, s = jnp.cos(boxes[:, 6])[:, None, None], \
        jnp.sin(boxes[:, 6])[:, None, None]
    px = boxes[:, 0, None, None] + lu * c - lv * s
    py = boxes[:, 1, None, None] + lu * s + lv * c
    # cell-center alignment: feature i sits at bmin + (i + 0.5) * v
    cx = (px - bounds[0]) / vx - 0.5
    cy = (py - bounds[2]) / vy - 0.5
    coords = jnp.stack([jnp.zeros_like(cx), cx, cy],
                       axis=-1).reshape(-1, 3)            # (K*G*G, 3)
    fmap = jnp.transpose(feat, (2, 0, 1))[None]           # (1, C, W, H)
    g = aligned_scatter(coords, fmap, method="linear")    # (K*G*G, C)
    return g.reshape(k, n_grid * n_grid * feat.shape[-1])


class CenterPointRefine(nn.Module):
    """Refinement MLP over pooled RoI features + rotation-invariant box
    descriptors. Output per proposal: ``conf`` logit (IoU-aware) and a 7-d
    residual ``[dx, dy, dz, dlog l, dlog w, dlog h, dyaw]`` in box-frame
    units (see :func:`apply_refinements`)."""

    cfg: RefineConfig

    @nn.compact
    def __call__(self, pooled, boxes, train: bool = False):
        dt = jnp.dtype(self.cfg.dtype)
        desc = jnp.stack([
            jnp.log(jnp.maximum(boxes[..., 3], 1e-3)),
            jnp.log(jnp.maximum(boxes[..., 4], 1e-3)),
            jnp.log(jnp.maximum(boxes[..., 5], 1e-3)),
            boxes[..., 2],
        ], axis=-1)
        x = jnp.concatenate([pooled, desc], axis=-1).astype(dt)
        for i, ch in enumerate(self.cfg.hidden):
            x = nn.relu(nn.Dense(ch, dtype=dt, name=f"fc{i}")(x))
        out = nn.Dense(8, dtype=dt, name="out")(x).astype(jnp.float32)
        return dict(conf=out[..., 0], deltas=out[..., 1:])


def apply_refinements(boxes, deltas):
    """Apply box-frame residuals: xy in box axes scaled by (l, w), z by h,
    dims multiplicatively, yaw additively."""
    l, w, h = boxes[:, 3], boxes[:, 4], boxes[:, 5]
    yaw = boxes[:, 6]
    dx, dy = deltas[:, 0] * l, deltas[:, 1] * w
    cy_, sy = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.stack([
        boxes[:, 0] + dx * cy_ - dy * sy,
        boxes[:, 1] + dx * sy + dy * cy_,
        boxes[:, 2] + deltas[:, 2] * h,
        l * jnp.exp(deltas[:, 3]),
        w * jnp.exp(deltas[:, 4]),
        h * jnp.exp(deltas[:, 5]),
        yaw + deltas[:, 6],
    ], axis=-1)


def encode_refinement_targets(cfg: RefineConfig, rois, gt_boxes, gt_mask):
    """Best-overlap targets for one frame's proposals.

    :param rois: (K, 7) first-stage boxes (stop-gradient upstream)
    :param gt_boxes: (M, 7) padded ground truth, ``gt_mask`` (M,)
    :returns: dict(conf (K,) in [0, 1], deltas (K, 7) exact inverse of
        :func:`apply_refinements`, pos (K,) residual-loss gate)
    """
    from ..ops.geometry_soa import rbox_iou_matrix

    bev_r = jnp.concatenate([rois[:, 0:2], rois[:, 3:5], rois[:, 6:7]],
                            axis=-1)
    bev_g = jnp.concatenate([gt_boxes[:, 0:2], gt_boxes[:, 3:5],
                             gt_boxes[:, 6:7]], axis=-1)
    iou = rbox_iou_matrix(bev_r.astype(jnp.float32),
                          bev_g.astype(jnp.float32))
    iou = jnp.where(gt_mask[None, :], iou, -1.0)
    best = jnp.argmax(iou, axis=1)
    biou = jnp.max(iou, axis=1)
    g = gt_boxes[best]

    yaw = rois[:, 6]
    cy_, sy = jnp.cos(yaw), jnp.sin(yaw)
    ex, ey = g[:, 0] - rois[:, 0], g[:, 1] - rois[:, 1]
    l = jnp.maximum(rois[:, 3], 1e-3)
    w = jnp.maximum(rois[:, 4], 1e-3)
    h = jnp.maximum(rois[:, 5], 1e-3)
    dyaw = g[:, 6] - yaw
    dyaw = jnp.arctan2(jnp.sin(dyaw), jnp.cos(dyaw))      # wrap to (-pi, pi]
    deltas = jnp.stack([
        (ex * cy_ + ey * sy) / l,
        (-ex * sy + ey * cy_) / w,
        (g[:, 2] - rois[:, 2]) / h,
        jnp.log(jnp.maximum(g[:, 3], 1e-3) / l),
        jnp.log(jnp.maximum(g[:, 4], 1e-3) / w),
        jnp.log(jnp.maximum(g[:, 5], 1e-3) / h),
        dyaw,
    ], axis=-1)
    conf = jnp.clip((biou - cfg.conf_lo) / (cfg.conf_hi - cfg.conf_lo),
                    0.0, 1.0)
    return dict(conf=conf, deltas=deltas, pos=biou >= cfg.fg_iou)


def refine_loss(out, targets):
    """BCE on the IoU-aware confidence + L1 residuals on positives."""
    conf_l = jnp.mean(optax_sigmoid_bce(out["conf"], targets["conf"]))
    npos = jnp.maximum(jnp.sum(targets["pos"]), 1).astype(jnp.float32)
    l1 = jnp.abs(out["deltas"] - targets["deltas"]) \
        * targets["pos"][..., None]
    reg_l = jnp.sum(l1) / npos
    total = conf_l + reg_l
    return total, dict(conf=conf_l, reg=reg_l, total=total)


def optax_sigmoid_bce(logits, labels):
    """Numerically stable sigmoid BCE (max(x,0) - x*z + log1p(exp(-|x|)))."""
    return (jnp.maximum(logits, 0) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def make_refine_train_step(model_1st, variables_1st, refine_model, cfg_1st,
                           cfg: RefineConfig, optimizer):
    """Second-stage training over a FROZEN first stage.

    ``step(refine_params, opt_state, batch) -> (params, opt_state, aux)``;
    batch is the pillarized batch with padded gt. The first stage runs in
    eval mode under ``stop_gradient``; its top-k decode provides the
    proposals (the standard two-stage recipe: train the refinement on the
    detector's own proposal distribution).
    """
    from .centerpoint import decode_centers

    def proposals(batch):
        outputs = model_1st.apply(variables_1st, batch["features"],
                                  batch["coords"], batch["valid"],
                                  train=False)
        feat = outputs.pop("feat")
        dec = jax.vmap(lambda o: decode_centers(cfg_1st, o))(outputs)
        boxes, scores = dec[0], dec[1]  # (+labels/velocity, unused here)
        return jax.lax.stop_gradient(feat), jax.lax.stop_gradient(boxes), \
            jax.lax.stop_gradient(scores)

    def loss_fn(params, batch):
        feat, boxes, _ = proposals(batch)
        pooled = jax.vmap(
            lambda f, b: roi_grid_features(f, b, cfg_1st.bounds,
                                           cfg_1st.grid, cfg.grid_points)
        )(feat, boxes)
        out = refine_model.apply({"params": params}, pooled, boxes,
                                 train=True)
        targets = jax.vmap(
            lambda r, g, m: encode_refinement_targets(cfg, r, g, m)
        )(boxes, batch["gt_boxes"], batch["gt_mask"])
        return refine_loss(out, targets)

    @jax.jit
    def step(params, opt_state, batch):
        (_, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, aux

    return step
