"""CenterPoint-style anchor-free 3D detector — second model family.

Same pillar encoder and BEV backbone as :mod:`d3d_tpu.models.pointpillars`
(the reference devkit provides the toolchain, not models; see that module's
docstring), but the head is anchor-free: a per-class center heatmap plus
dense regression maps, trained with the penalty-reduced focal loss and
decoded with a 3x3 max-pool peak NMS + top-k — all fixed-shape and
jit-friendly (no dynamic box counts anywhere).

Reference: Yin et al., "Center-based 3D Object Detection and Tracking",
CVPR 2021 (arXiv:2006.11275); CornerNet gaussian targets (Law & Deng,
ECCV 2018).
"""

from dataclasses import dataclass
from functools import partial
from typing import Callable, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .pointpillars import _PFN, _ConvBlock, _Upsample

__all__ = ["CenterPointConfig", "CenterPoint", "assign_center_targets",
           "center_loss", "decode_centers", "make_train_step"]


@dataclass(frozen=True)
class CenterPointConfig:
    """Static model configuration (hashable -> usable as a jit static arg)."""

    bounds: Tuple[float, ...] = (0.0, 69.12, -39.68, 39.68, -3.0, 1.0)
    grid: Tuple[int, int] = (432, 496)
    max_pillars: int = 12000
    max_points_per_pillar: int = 32
    pfn_features: int = 64
    backbone_channels: Tuple[int, ...] = (64, 128, 256)
    backbone_blocks: Tuple[int, ...] = (3, 5, 5)
    upsample_channels: int = 128
    num_classes: int = 1
    head_channels: int = 64
    window: int = 15          # gaussian splat window (odd)
    min_radius: int = 2
    gaussian_overlap: float = 0.1
    top_k: int = 100
    # BEV velocity head (the nuScenes CenterPoint configuration: needs
    # multi-sweep input for motion cues, models/sweeps.py) — feeds the
    # velocity-backcast CenterTracker (d3d_tpu.tracking.center_tracker)
    predict_velocity: bool = False
    dtype: str = "float32"

    @property
    def voxel_size(self):
        b = np.asarray(self.bounds).reshape(3, 2)
        return (b[:, 1] - b[:, 0]) / np.array([*self.grid, 1])


class CenterPoint(nn.Module):
    """PFN -> BEV scatter -> backbone -> center heads. Input is the batched
    output of :func:`d3d_tpu.models.pointpillars.pillarize` (built with a
    pillarize-compatible config). ``constrain`` is the optional
    activation-sharding hook (:func:`d3d_tpu.parallel.spatial_constrain`)
    for running the canvas spatially partitioned over a mesh 'sp' axis."""

    cfg: CenterPointConfig
    constrain: Callable = None
    # also return the shared BEV feature map (key "feat") for the
    # two-stage refinement (models.centerpoint2); off by default so the
    # single-stage train step's output pytree is unchanged
    return_feat: bool = False

    @nn.compact
    def __call__(self, features, coords, valid, train: bool = False):
        cfg = self.cfg
        con = self.constrain or (lambda x, kind: x)
        b = features.shape[0]
        dt = jnp.dtype(cfg.dtype)

        pmask = jnp.any(features != 0, axis=-1)
        pf = _PFN(cfg.pfn_features, cfg.dtype)(features, pmask, train)
        pf = pf * valid[..., None].astype(pf.dtype)

        from .pointpillars import scatter_to_bev
        x = con(scatter_to_bev(pf, coords, valid, cfg.grid), "bev")

        ups = []
        for i, (ch, nb) in enumerate(zip(cfg.backbone_channels,
                                         cfg.backbone_blocks)):
            x = con(_ConvBlock(ch, nb, 2 if i > 0 else 1, cfg.dtype)(
                x, train), "bev")
            ups.append(_Upsample(cfg.upsample_channels, 2 ** i,
                                 cfg.dtype)(x, train))
        feat = con(jnp.concatenate(ups, axis=-1), "bev")

        def head(n_out, name, bias_init=0.0):
            y = nn.Conv(cfg.head_channels, (3, 3), padding="SAME", dtype=dt,
                        name=f"{name}_conv")(feat)
            y = nn.relu(y)
            return nn.Conv(
                n_out, (1, 1), dtype=dt, name=f"{name}_out",
                bias_init=nn.initializers.constant(bias_init))(y)

        # -2.19 = logit(0.1): start with a quiet heatmap (focal-loss trick)
        out = dict(
            heatmap=head(cfg.num_classes, "hm", -2.19).astype(jnp.float32),
            reg=head(2, "reg").astype(jnp.float32),       # sub-cell offset
            height=head(1, "height").astype(jnp.float32),  # z center
            dim=head(3, "dim").astype(jnp.float32),        # log(l, w, h)
            rot=head(2, "rot").astype(jnp.float32),        # (sin, cos) yaw
        )
        if cfg.predict_velocity:
            out["vel"] = head(2, "vel").astype(jnp.float32)  # (vx, vy) m/s
        if self.return_feat:
            out["feat"] = feat.astype(jnp.float32)
        return out


def _gaussian_radius(l_cells, w_cells, min_overlap):
    """Radius such that any center within it keeps IoU >= min_overlap.

    Uses the mathematically correct quadratic roots ``(-b ± sqrt(b²-4ac))
    / (2a)`` for the three CornerNet overlap cases. (The widely copied
    CornerNet code divides every root by 2 regardless of ``a`` — a known
    quirk of the published implementation. Verified by the radius-property
    test: translating the box by the radius keeps IoU >= min_overlap.)
    """
    b1 = l_cells + w_cells
    c1 = l_cells * w_cells * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 - jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * c1, 0.0))) / 2
    a2 = 4.0
    b2 = 2 * (l_cells + w_cells)
    c2 = (1 - min_overlap) * l_cells * w_cells
    r2 = (b2 - jnp.sqrt(jnp.maximum(b2 ** 2 - 4 * a2 * c2, 0.0))) / (2 * a2)
    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (l_cells + w_cells)
    c3 = (min_overlap - 1) * l_cells * w_cells
    r3 = (-b3 + jnp.sqrt(jnp.maximum(b3 ** 2 - 4 * a3 * c3, 0.0))) \
        / (2 * a3)
    return jnp.minimum(jnp.minimum(r1, r2), r3)


@partial(jax.jit, static_argnames=("cfg",))
def assign_center_targets(cfg: CenterPointConfig, gt_boxes, gt_labels,
                          gt_mask, gt_velocity=None):
    """One frame of CenterPoint targets.

    :param gt_boxes: (M, 7) [x, y, z, l, w, h, yaw] padded ground truth
    :param gt_velocity: (M, 2) BEV velocities, required semantics when
        ``cfg.predict_velocity`` (defaults to zeros)
    :return: dict(heatmap (W, H, C), vec (W, H, 8 or 10), mask (W, H));
        ``vec`` is [dx, dy, z, log l, log w, log h, sin yaw, cos yaw]
        (+ [vx, vy] with the velocity head) at centers.
    """
    w, h = cfg.grid
    m = gt_boxes.shape[0]
    vx, vy, _ = [float(v) for v in cfg.voxel_size]
    win = cfg.window
    half = win // 2

    cx = (gt_boxes[:, 0] - cfg.bounds[0]) / vx  # fractional cell coords
    cy = (gt_boxes[:, 1] - cfg.bounds[2]) / vy
    ix = jnp.clip(jnp.floor(cx).astype(jnp.int32), 0, w - 1)
    iy = jnp.clip(jnp.floor(cy).astype(jnp.int32), 0, h - 1)
    inside = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h) & gt_mask

    radius = jnp.maximum(
        _gaussian_radius(gt_boxes[:, 3] / vx, gt_boxes[:, 4] / vy,
                         cfg.gaussian_overlap),
        cfg.min_radius).astype(jnp.float32)
    sigma2 = jnp.maximum((2 * radius / 3.0) ** 2, 1e-6)

    # gaussian splat on a (win, win) window around each center, scatter-max
    dxs = jnp.arange(win, dtype=jnp.int32) - half
    gx = ix[:, None, None] + dxs[None, :, None]          # (M, win, 1)
    gy = iy[:, None, None] + dxs[None, None, :]          # (M, 1, win)
    d2 = ((gx - ix[:, None, None]) ** 2
          + (gy - iy[:, None, None]) ** 2).astype(jnp.float32)
    val = jnp.exp(-d2 / (2 * sigma2[:, None, None]))
    okw = (inside[:, None, None] & (gx >= 0) & (gx < w)
           & (gy >= 0) & (gy < h) & (val > 1e-4))
    gxb = jnp.broadcast_to(gx, (m, win, win))
    gyb = jnp.broadcast_to(gy, (m, win, win))
    flat = jnp.where(okw, gxb * h + gyb, w * h)           # trash cell
    cls = jnp.broadcast_to(
        jnp.maximum(gt_labels, 0)[:, None, None], (m, win, win))
    heat = jnp.zeros((w * h + 1, cfg.num_classes), jnp.float32)
    heat = heat.at[flat.reshape(-1),
                   cls.reshape(-1)].max(jnp.where(okw, val, 0.0).reshape(-1))
    heatmap = heat[:-1].reshape(w, h, cfg.num_classes)

    # regression vector at each center cell (later gt wins on collision,
    # matching the reference implementations' draw order)
    cols = [
        cx - ix.astype(jnp.float32),
        cy - iy.astype(jnp.float32),
        gt_boxes[:, 2],
        jnp.log(jnp.maximum(gt_boxes[:, 3], 1e-3)),
        jnp.log(jnp.maximum(gt_boxes[:, 4], 1e-3)),
        jnp.log(jnp.maximum(gt_boxes[:, 5], 1e-3)),
        jnp.sin(gt_boxes[:, 6]),
        jnp.cos(gt_boxes[:, 6]),
    ]
    if cfg.predict_velocity:
        gv = (jnp.zeros((m, 2), jnp.float32) if gt_velocity is None
              else gt_velocity.astype(jnp.float32))
        cols += [gv[:, 0], gv[:, 1]]
    vec = jnp.stack(cols, axis=-1)                        # (M, 8 or 10)
    nv = vec.shape[-1]
    cflat = jnp.where(inside, ix * h + iy, w * h)
    vbuf = jnp.zeros((w * h + 1, nv), jnp.float32).at[cflat].set(vec)
    mbuf = jnp.zeros(w * h + 1, bool).at[cflat].set(inside)
    return dict(heatmap=heatmap,
                vec=vbuf[:-1].reshape(w, h, nv),
                mask=mbuf[:-1].reshape(w, h))


def center_loss(outputs, targets, reg_weight=2.0):
    """Penalty-reduced focal (CornerNet, alpha=2 beta=4) + masked L1."""
    hm = jnp.clip(jax.nn.sigmoid(outputs["heatmap"]), 1e-5, 1 - 1e-5)
    t = targets["heatmap"]
    pos = t >= 1.0 - 1e-6
    npos = jnp.maximum(jnp.sum(pos), 1).astype(jnp.float32)
    pos_l = -((1 - hm) ** 2) * jnp.log(hm) * pos
    neg_l = -((1 - t) ** 4) * (hm ** 2) * jnp.log(1 - hm) * ~pos
    hm_loss = (jnp.sum(pos_l) + jnp.sum(neg_l)) / npos

    parts = [outputs["reg"], outputs["height"], outputs["dim"],
             outputs["rot"]]
    if "vel" in outputs:
        parts.append(outputs["vel"])
    pred = jnp.concatenate(parts, axis=-1)
    l1 = jnp.abs(pred - targets["vec"]) * targets["mask"][..., None]
    reg_loss = jnp.sum(l1) / npos
    total = hm_loss + reg_weight * reg_loss
    return total, dict(hm=hm_loss, reg=reg_loss, total=total)


@partial(jax.jit, static_argnames=("cfg",))
def decode_centers(cfg: CenterPointConfig, outputs):
    """Peak NMS (3x3 max-pool) + top-k -> (K, 7) boxes, scores, labels
    (+ (K, 2) velocities when ``cfg.predict_velocity``). Fixed output
    shapes; callers mask on ``scores``."""
    w, h = cfg.grid
    vx, vy, _ = [float(v) for v in cfg.voxel_size]
    hm = jax.nn.sigmoid(outputs["heatmap"])               # (W, H, C)
    pooled = jax.lax.reduce_window(
        hm, -jnp.inf, jax.lax.max, (3, 3, 1), (1, 1, 1), "SAME")
    peaks = jnp.where(hm >= pooled, hm, 0.0)
    scores, idx = jax.lax.top_k(peaks.reshape(-1), cfg.top_k)
    cell = (idx // cfg.num_classes).astype(jnp.int32)
    labels = (idx % cfg.num_classes).astype(jnp.int32)
    ix = cell // h
    iy = cell % h

    vec = jnp.concatenate([outputs["reg"], outputs["height"],
                           outputs["dim"], outputs["rot"]],
                          axis=-1).reshape(w * h, 8)[cell]
    boxes = jnp.stack([
        (ix.astype(jnp.float32) + vec[:, 0]) * vx + cfg.bounds[0],
        (iy.astype(jnp.float32) + vec[:, 1]) * vy + cfg.bounds[2],
        vec[:, 2],
        jnp.exp(vec[:, 3]),
        jnp.exp(vec[:, 4]),
        jnp.exp(vec[:, 5]),
        jnp.arctan2(vec[:, 6], vec[:, 7]),
    ], axis=-1)
    if cfg.predict_velocity:
        vel = outputs["vel"].reshape(w * h, 2)[cell]
        return boxes, scores, labels, vel
    return boxes, scores, labels


def prepare_center_targets(cfg: CenterPointConfig, batch):
    """Batched heatmap/regression target rendering as a standalone jitted
    program (parameter-independent — run it in the input pipeline and pass
    ``external_targets=True`` to keep it out of the differentiated step;
    see pointpillars.prepare_targets)."""
    targets = jax.vmap(
        lambda b, l, m, v: assign_center_targets(cfg, b, l, m, v)
    )(batch["gt_boxes"], batch["gt_labels"], batch["gt_mask"],
      _gt_velocity(cfg, batch))
    return dict(batch, targets=targets)


def _gt_velocity(cfg, batch):
    """(B, M, 2) gt velocities when the head is enabled (zeros if the
    batch lacks them), else None."""
    if not cfg.predict_velocity:
        return None
    gv = batch.get("gt_velocity")
    if gv is None:
        import warnings

        # trace-time warning (not inside compiled code): training the
        # velocity head toward silent zeros defeats its purpose
        warnings.warn(
            "predict_velocity=True but the batch has no 'gt_velocity' — "
            "velocity targets default to ZERO. Supply per-box (B, M, 2) "
            "BEV velocities (e.g. Target3DArray.columns()['velocity']"
            "[:, :2] from the nuScenes loader) to actually train the "
            "head.", stacklevel=3)
        gv = jnp.zeros(batch["gt_boxes"].shape[:2] + (2,), jnp.float32)
    return gv


def make_train_step(model, optimizer, cfg: CenterPointConfig, remat=False,
                    external_targets=False):
    """``step(params, batch_stats, opt_state, batch) -> (new..., metrics)``;
    batch: features/coords/valid from ``pillarize`` (batched) plus padded
    gt_boxes (B, M, 7), gt_labels (B, M), gt_mask (B, M).

    :param remat: rematerialize the forward in the backward (see
        pointpillars.make_train_step).
    :param external_targets: consume ``batch["targets"]`` from
        :func:`prepare_center_targets` instead of rendering in-step."""

    def forward(params, batch_stats, batch):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["features"], batch["coords"], batch["valid"],
            train=True, mutable=["batch_stats"],
        )

    if remat:
        forward = jax.checkpoint(
            forward,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)

    def loss_fn(params, batch_stats, batch):
        outputs, updates = forward(params, batch_stats, batch)
        if external_targets:
            targets = jax.lax.stop_gradient(batch["targets"])
        else:
            targets = jax.vmap(
                lambda b, l, m, v: assign_center_targets(cfg, b, l, m, v)
            )(batch["gt_boxes"], batch["gt_labels"], batch["gt_mask"],
              _gt_velocity(cfg, batch))
        loss, aux = center_loss(outputs, targets)
        return loss, (updates["batch_stats"], aux)

    def train_step(params, batch_stats, opt_state, batch):
        (loss, (new_bs, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, new_bs, opt_state, aux

    return train_step
