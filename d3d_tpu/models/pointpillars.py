"""PointPillars-style 3D detector — the flagship model of d3d_tpu.

The reference devkit (cmpute/d3d) provides the *toolchain* for detectors
(voxelization, rotated-box geometry, evaluators) but no model; this module
closes the loop with a TPU-first detector built entirely on the framework's
own kernels:

  * pillarization reuses the sort+segment voxelizer core
    (:mod:`d3d_tpu.ops.voxel`) with fixed shapes, vmapped over the batch;
  * the pillar feature net / BEV backbone / SSD head are jit-friendly flax
    modules in bfloat16-ready NHWC layout (MXU-shaped matmuls and convs);
  * anchor assignment and the rotated-IoU auxiliary loss use the
    differentiable geometry core (:mod:`d3d_tpu.ops.geometry`);
  * the train step shards batch over a ``dp`` mesh axis and feature/channel
    dimensions over ``tp`` (see :mod:`d3d_tpu.parallel`).

Reference: Lang et al., "PointPillars: Fast Encoders for Object Detection
from Point Clouds", CVPR 2019 (arXiv:1812.05784).
"""

from dataclasses import dataclass
from functools import partial
from typing import Callable, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import geometry as G
from ..ops.voxel import voxelize_dense_padded

__all__ = ["PointPillarsConfig", "PointPillars", "pillarize", "scatter_to_bev",
           "make_anchors", "assign_targets", "detection_loss",
           "decode_boxes", "make_train_step"]


@dataclass(frozen=True)
class PointPillarsConfig:
    """Static model configuration (hashable -> usable as a jit static arg)."""

    bounds: Tuple[float, ...] = (0.0, 69.12, -39.68, 39.68, -3.0, 1.0)
    grid: Tuple[int, int] = (432, 496)        # (x cells, y cells)
    max_pillars: int = 12000
    max_points_per_pillar: int = 32
    pfn_features: int = 64
    backbone_channels: Tuple[int, ...] = (64, 128, 256)
    backbone_blocks: Tuple[int, ...] = (3, 5, 5)
    upsample_channels: int = 128
    num_classes: int = 1
    # per-class anchor sizes (l, w, h) and z center
    anchor_sizes: Tuple[Tuple[float, float, float], ...] = ((3.9, 1.6, 1.56),)
    anchor_z: float = -1.0
    anchor_rotations: Tuple[float, ...] = (0.0, 1.5707963)
    pos_iou: float = 0.6
    neg_iou: float = 0.45
    dtype: str = "float32"  # compute dtype for the network ("bfloat16" on TPU)

    @property
    def voxel_size(self):
        b = np.asarray(self.bounds).reshape(3, 2)
        sizes = (b[:, 1] - b[:, 0]) / np.array([*self.grid, 1])
        return sizes

    @property
    def num_anchors_per_cell(self):
        return len(self.anchor_sizes) * len(self.anchor_rotations)


# ---------------------------------------------------------------------------
# pillarization (fixed-shape, vmappable)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",))
def pillarize(points, cfg: PointPillarsConfig):
    """Points (N, 4) -> pillar tensors with static shapes.

    :return: (features (P, K, 9), coords (P, 2) int32 [ix, iy], mask (P,))
        Features per point: x, y, z, intensity, offsets from the pillar
        centroid (3) and from the pillar center (2) — the PointPillars
        decoration.
    """
    bounds = jnp.asarray(cfg.bounds, points.dtype)
    vox = voxelize_dense_padded(
        points, (cfg.grid[0], cfg.grid[1], 1), bounds,
        cfg.max_points_per_pillar, cfg.max_pillars, "none",
        order_mode="sorted",  # cell-key order: single sort, model-agnostic
    )
    feats = vox.voxels              # (P, K, 4)
    pmask = vox.voxel_pmask         # (P, K)
    coords = vox.coords[:, :2].astype(jnp.int32)  # (P, 2)
    npoints = jnp.maximum(vox.voxel_npoints, 1).astype(points.dtype)
    valid = jnp.arange(cfg.max_pillars, dtype=jnp.int32) < vox.nvoxels

    # decorations
    xyz = feats[..., :3]
    centroid = jnp.sum(xyz * pmask[..., None], axis=1) / jnp.minimum(
        npoints, cfg.max_points_per_pillar)[:, None]
    off_centroid = xyz - centroid[:, None, :]
    vsize = jnp.asarray(cfg.voxel_size, points.dtype)
    bmin = jnp.asarray([cfg.bounds[0], cfg.bounds[2]], points.dtype)
    cell_center = (coords.astype(points.dtype) + 0.5) * vsize[:2] + bmin
    off_center = xyz[..., :2] - cell_center[:, None, :]

    out = jnp.concatenate([feats, off_centroid, off_center], axis=-1)
    out = out * pmask[..., None]
    return out, coords, valid


# ---------------------------------------------------------------------------
# network modules
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _bev_gather(pf, flat, grid):
    """Gather-formulated BEV densification with gather-only gradients.

    Pillar cells are UNIQUE per frame (they come out of voxelization), so
    the feature scatter is a permutation: build the (W*H,) inverse index
    with one SMALL int32 scatter (1 word/pillar instead of F), then read
    the whole canvas back as a vectorized gather. The custom backward is
    the mirror gather ``d_pf[p] = d_canvas[flat[p]]`` — no F-wide
    scatter(-add) appears in either direction, which is what made the
    XLA scatter version the train step's hottest non-conv op on TPU."""
    out, _ = _bev_gather_fwd(pf, flat, grid)
    return out


def _bev_gather_fwd(pf, flat, grid):
    b, p, nf = pf.shape
    w, h = grid
    inv = jnp.full((b, w * h + 1), p, jnp.int32)
    inv = jax.vmap(lambda iv, f: iv.at[f].set(
        jnp.arange(p, dtype=jnp.int32)))(inv, flat)
    pf_pad = jnp.concatenate([pf, jnp.zeros((b, 1, nf), pf.dtype)], axis=1)
    canvas = jnp.take_along_axis(pf_pad, inv[:, :w * h, None], axis=1)
    return canvas.reshape(b, w, h, nf), flat


def _bev_gather_bwd(grid, flat, g):
    b = g.shape[0]
    nf = g.shape[-1]
    w, h = grid
    g_pad = jnp.concatenate([g.reshape(b, w * h, nf),
                             jnp.zeros((b, 1, nf), g.dtype)], axis=1)
    d_pf = jnp.take_along_axis(g_pad, flat[..., None], axis=1)
    return d_pf, None


_bev_gather.defvjp(_bev_gather_fwd, _bev_gather_bwd)


def scatter_to_bev(pf, coords, valid, grid):
    """Densify per-pillar features (B, P, F) onto the BEV canvas
    (B, W, H, F); invalid pillars land on a discarded trash row. Pillar
    coords must be unique per frame (voxelizer output — one pillar per
    cell). Shared by every pillar-based family."""
    w, h = grid
    flat = coords[..., 0] * h + coords[..., 1]
    flat = jnp.where(valid, flat, w * h).astype(jnp.int32)
    return _bev_gather(pf, flat, (w, h))


class _PFN(nn.Module):
    """Per-pillar PointNet: linear + BN + ReLU + masked max over points."""

    features: int
    dtype: str

    @nn.compact
    def __call__(self, x, pmask, train: bool):
        dt = jnp.dtype(self.dtype)
        x = nn.Dense(self.features, use_bias=False, dtype=dt)(x.astype(dt))
        # BN in the compute dtype: flax computes the statistics in f32
        # regardless (force_float32_reductions), so bf16 here removes the
        # full-activation f32 round trip between every conv pair without
        # touching the stats numerics (round-4 train-trace finding)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=dt)(x)
        x = nn.relu(x)
        # Masked max over points. Post-relu values are >= 0, so -1 is a
        # safe finite sentinel and empty pillars come out exactly 0 via
        # the final clamp (the old -inf/isfinite pair put +-inf
        # arithmetic in the VJP for no benefit).
        #
        # BACKEND SPLIT (round-5 finding): jnp.max's VJP routes
        # cotangents through a float `x == max` equality; XLA:CPU's
        # fused backward recomputes the operand with different
        # arithmetic than the stored max and the whole PFN gradient
        # comes out 8-30% wrong at every non-power-of-two batch
        # (b=3/5/6/7 vs the unjitted program; b=1/2/4/8 exact —
        # tests/test_train.py pins this). The integer argmax + one-hot
        # contraction has no float equality to break and is used on CPU;
        # on TPU the fused max backward was verified exact against it
        # (b=3..7 on chip) and is ~6 ms/step faster at KITTI b2, so the
        # plain reduction stays the TPU path. Tie semantics differ only
        # in subgradient choice (first argmax takes the full cotangent
        # vs an even split).
        x = jnp.where(pmask[..., None], x, jnp.asarray(-1.0, x.dtype))
        if jax.default_backend() == "cpu":
            idx = jax.lax.stop_gradient(
                jnp.argmax(x, axis=-2).astype(jnp.int32))
            iota = jax.lax.broadcasted_iota(jnp.int32, x.shape,
                                            x.ndim - 2)
            sel = (iota == idx[..., None, :]).astype(x.dtype)
            x = jnp.sum(x * sel, axis=-2)  # (..., P, F)
        else:
            x = jnp.max(x, axis=-2)  # (..., P, F)
        return jnp.where(x >= 0, x, jnp.asarray(0.0, x.dtype))


class _ConvBlock(nn.Module):
    channels: int
    blocks: int
    stride: int
    dtype: str

    @nn.compact
    def __call__(self, x, train: bool):
        dt = jnp.dtype(self.dtype)
        for i in range(self.blocks):
            stride = self.stride if i == 0 else 1
            x = nn.Conv(self.channels, (3, 3), strides=(stride, stride),
                        padding="SAME", use_bias=False, dtype=dt)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=dt)(x)
            x = nn.relu(x)
        return x


class _Upsample(nn.Module):
    channels: int
    factor: int
    dtype: str

    @nn.compact
    def __call__(self, x, train: bool):
        dt = jnp.dtype(self.dtype)
        if self.factor > 1:
            x = nn.ConvTranspose(self.channels, (self.factor, self.factor),
                                 strides=(self.factor, self.factor),
                                 use_bias=False, dtype=dt)(x)
        else:
            x = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=dt)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=dt)(x)
        return nn.relu(x)


class PointPillars(nn.Module):
    """Full network: PFN -> BEV scatter -> multi-scale 2D backbone -> SSD
    head. Input is the batched output of :func:`pillarize`.

    ``constrain`` is an optional activation-sharding hook ``(x, kind) ->
    x`` (see :func:`d3d_tpu.parallel.spatial_constrain`): every
    BEV-shaped activation passes through it with kind="bev", so a mesh
    with a spatial axis runs the conv backbone spatially partitioned
    (XLA SPMD inserts the halo exchanges). ``None`` (default) is the
    single-chip / dp-tp-only path, bit-identical to before."""

    cfg: PointPillarsConfig
    constrain: Callable = None

    @nn.compact
    def __call__(self, features, coords, valid, train: bool = False):
        cfg = self.cfg
        con = self.constrain or (lambda x, kind: x)
        b = features.shape[0]
        dt = jnp.dtype(cfg.dtype)

        # pillar encoder
        pmask = jnp.any(features != 0, axis=-1)  # (B, P, K)
        pf = _PFN(cfg.pfn_features, cfg.dtype)(features, pmask, train)
        pf = pf * valid[..., None].astype(pf.dtype)  # (B, P, F)

        # scatter pillars to the BEV canvas (W, H layout: x -> rows)
        x = con(scatter_to_bev(pf, coords, valid, cfg.grid), "bev")

        # backbone + FPN-style upsampling
        ups = []
        for i, (ch, nb) in enumerate(zip(cfg.backbone_channels,
                                         cfg.backbone_blocks)):
            x = con(_ConvBlock(ch, nb, 2 if i > 0 else 1, cfg.dtype)(
                x, train), "bev")
            ups.append(_Upsample(cfg.upsample_channels, 2 ** i,
                                 cfg.dtype)(x, train))
        feat = con(jnp.concatenate(ups, axis=-1), "bev")  # (B, W, H, 3*U)

        # SSD head (per cell: A anchors)
        a = cfg.num_anchors_per_cell
        cls_logits = nn.Conv(a * cfg.num_classes, (1, 1), dtype=dt,
                             name="head_cls")(feat)
        box_preds = nn.Conv(a * 7, (1, 1), dtype=dt, name="head_box")(feat)
        dir_logits = nn.Conv(a * 2, (1, 1), dtype=dt, name="head_dir")(feat)

        wh = feat.shape[1] * feat.shape[2]
        return (
            cls_logits.reshape(b, wh * a, cfg.num_classes).astype(jnp.float32),
            box_preds.reshape(b, wh * a, 7).astype(jnp.float32),
            dir_logits.reshape(b, wh * a, 2).astype(jnp.float32),
        )


# ---------------------------------------------------------------------------
# anchors, target assignment, loss
# ---------------------------------------------------------------------------

def make_anchors(cfg: PointPillarsConfig):
    """Dense anchor grid (num_anchors, 7) [x, y, z, l, w, h, yaw] at the
    backbone output resolution (matching the head's spatial layout)."""
    w, h = cfg.grid
    vx, vy, _ = cfg.voxel_size
    xs = (np.arange(w) + 0.5) * vx + cfg.bounds[0]
    ys = (np.arange(h) + 0.5) * vy + cfg.bounds[2]
    gx, gy = np.meshgrid(xs, ys, indexing="ij")  # (w, h)
    cells = np.stack([gx, gy], axis=-1).reshape(-1, 2)

    anchors = []
    for size in cfg.anchor_sizes:
        for rot in cfg.anchor_rotations:
            a = np.zeros((cells.shape[0], 7), np.float32)
            a[:, 0:2] = cells
            a[:, 2] = cfg.anchor_z
            a[:, 3:6] = size
            a[:, 6] = rot
            anchors.append(a)
    # interleave anchors per cell: (wh, A, 7) -> (wh*A, 7)
    out = np.stack(anchors, axis=1).reshape(-1, 7)
    return jnp.asarray(out)


@jax.jit
def _bev_iou(anchors, gt):
    """BEV axis-aligned IoU between anchors (N, 7) and gt boxes (M, 7)."""
    a2 = jnp.concatenate([anchors[:, 0:2], anchors[:, 3:5], anchors[:, 6:7]],
                         axis=1)
    g2 = jnp.concatenate([gt[:, 0:2], gt[:, 3:5], gt[:, 6:7]], axis=1)
    return G.aabox_iou(a2[:, None, :], g2[None, :, :])


def encode_boxes(anchors, gt):
    """Standard PointPillars residual encoding (sin/cos for yaw)."""
    da = jnp.sqrt(anchors[..., 3] ** 2 + anchors[..., 4] ** 2)
    out = jnp.stack([
        (gt[..., 0] - anchors[..., 0]) / da,
        (gt[..., 1] - anchors[..., 1]) / da,
        (gt[..., 2] - anchors[..., 2]) / anchors[..., 5],
        jnp.log(jnp.maximum(gt[..., 3], 1e-3) / anchors[..., 3]),
        jnp.log(jnp.maximum(gt[..., 4], 1e-3) / anchors[..., 4]),
        jnp.log(jnp.maximum(gt[..., 5], 1e-3) / anchors[..., 5]),
        jnp.sin(gt[..., 6] - anchors[..., 6]),
    ], axis=-1)
    return out


def decode_boxes(anchors, deltas):
    """Inverse of :func:`encode_boxes` (yaw via asin of the residual)."""
    da = jnp.sqrt(anchors[..., 3] ** 2 + anchors[..., 4] ** 2)
    return jnp.stack([
        deltas[..., 0] * da + anchors[..., 0],
        deltas[..., 1] * da + anchors[..., 1],
        deltas[..., 2] * anchors[..., 5] + anchors[..., 2],
        jnp.exp(deltas[..., 3]) * anchors[..., 3],
        jnp.exp(deltas[..., 4]) * anchors[..., 4],
        jnp.exp(deltas[..., 5]) * anchors[..., 5],
        # clip strictly inside (-1, 1): arcsin' is infinite at the endpoints
        # (sin residual hits +-1 when the yaw residual is +-pi/2) and would
        # produce NaN gradients through the rotated-IoU loss
        jnp.arcsin(jnp.clip(deltas[..., 6], -1 + 1e-4, 1 - 1e-4))
        + anchors[..., 6],
    ], axis=-1)


@partial(jax.jit, static_argnames=("pos_iou", "neg_iou"))
def assign_targets(anchors, gt_boxes, gt_labels, gt_mask,
                   pos_iou=0.6, neg_iou=0.45):
    """Anchor assignment for one frame.

    :param gt_boxes: (M, 7) padded ground truth
    :param gt_labels: (M,) int class ids (0-based)
    :param gt_mask: (M,) validity
    :return: dict(cls_target (N,), reg_target (N, 7), dir_target (N,),
        pos (N,), neg (N,)); cls_target is -1 for ignored anchors
    """
    iou = _bev_iou(anchors, gt_boxes)  # (N, M)
    iou = jnp.where(gt_mask[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)

    pos = best_iou >= pos_iou
    # force-match: every gt gets its best anchor — but ONLY gts that are
    # valid AND actually overlap something: a padded or out-of-range gt's
    # IoU column is uniform (-1 / 0), argmax lands on anchor 0 and the
    # duplicate-index scatter would clobber real matches there / train a
    # corner anchor on garbage residuals (round-2 review finding)
    gt_best_iou = jnp.max(iou, axis=0)  # (M,)
    can_force = gt_mask & (gt_best_iou > 0)
    oob = jnp.int32(anchors.shape[0])
    best_anchor = jnp.where(can_force, jnp.argmax(iou, axis=0), oob)
    force = jnp.zeros(anchors.shape[0], bool).at[best_anchor].set(
        True, mode="drop")
    forced_gt = jnp.zeros(anchors.shape[0], jnp.int32).at[best_anchor].set(
        jnp.arange(gt_boxes.shape[0], dtype=jnp.int32), mode="drop")
    best_gt = jnp.where(force & ~pos, forced_gt, best_gt)
    pos = pos | force
    neg = (best_iou < neg_iou) & ~pos

    matched = gt_boxes[best_gt]
    reg_target = encode_boxes(anchors, matched)
    dir_target = ((matched[..., 6] - anchors[..., 6]) % (2 * jnp.pi)
                  > jnp.pi).astype(jnp.int32)
    cls_target = jnp.where(pos, gt_labels[best_gt], -1)
    return dict(cls_target=cls_target, reg_target=reg_target,
                dir_target=dir_target, pos=pos, neg=neg)


def _focal_loss(logits, labels, pos, neg, num_classes,
                alpha=0.25, gamma=2.0):
    """Sigmoid focal loss over anchors; negatives train all classes to 0."""
    onehot = jax.nn.one_hot(jnp.maximum(labels, 0), num_classes)
    target = jnp.where(pos[..., None], onehot, 0.0)
    weight = (pos | neg)[..., None].astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    ce = -(target * jax.nn.log_sigmoid(logits)
           + (1 - target) * jax.nn.log_sigmoid(-logits))
    pt = jnp.where(target == 1, p, 1 - p)
    af = jnp.where(target == 1, alpha, 1 - alpha)
    loss = af * (1 - pt) ** gamma * ce * weight
    return jnp.sum(loss)


def _smooth_l1(pred, target, beta=1.0 / 9):
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def detection_loss(outputs, targets, cfg: PointPillarsConfig,
                   anchors=None, riou_weight=0.0):
    """Total loss = focal cls + smooth-L1 box + direction CE
    (+ optional differentiable rotated-IoU loss through the geometry core).
    """
    cls_logits, box_preds, dir_logits = outputs
    if "cls_onehot" in targets:
        # dense f32 representation from prepare_targets(dense=True): no
        # int/bool target tensors enter the step, killing the per-iteration
        # layout copies the device trace showed on the s32/u32/pred inputs
        posf = targets["posf"]                  # (B, N) f32
        pos = posf > 0
        npos = jnp.maximum(jnp.sum(posf), 1.0)
        tgt = targets["cls_onehot"]             # (B, N, C) f32
        weight = targets["weight"][..., None]   # (B, N, 1) f32
        p = jax.nn.sigmoid(cls_logits)
        ce = -(tgt * jax.nn.log_sigmoid(cls_logits)
               + (1 - tgt) * jax.nn.log_sigmoid(-cls_logits))
        pt = jnp.where(tgt == 1, p, 1 - p)
        af = jnp.where(tgt == 1, 0.25, 0.75)
        cls_loss = jnp.sum(af * (1 - pt) ** 2 * ce * weight) / npos
        reg = _smooth_l1(box_preds, targets["reg_target"])
        reg_loss = jnp.sum(reg * posf[..., None]) / npos
        dir_ce = -jax.nn.log_softmax(dir_logits)  # (B, N, 2)
        dir_loss = jnp.sum(jnp.sum(dir_ce * targets["dir_onehot"], -1)
                           * posf) / npos
    else:
        pos = targets["pos"]
        npos = jnp.maximum(jnp.sum(pos), 1).astype(jnp.float32)

        cls_loss = _focal_loss(cls_logits, targets["cls_target"], pos,
                               targets["neg"], cfg.num_classes) / npos
        reg = _smooth_l1(box_preds, targets["reg_target"])
        reg_loss = jnp.sum(reg * pos[..., None]) / npos
        dir_ce = -jax.nn.log_softmax(dir_logits)  # (B, N, 2)
        dir_loss = jnp.sum(
            jnp.take_along_axis(dir_ce, targets["dir_target"][..., None],
                                axis=-1)[..., 0] * pos) / npos

    total = cls_loss + 2.0 * reg_loss + 0.2 * dir_loss
    aux = dict(cls=cls_loss, reg=reg_loss, dir=dir_loss)

    if riou_weight > 0.0 and anchors is not None:
        # NaN-safety: replace non-positive anchors' predictions with their
        # targets (zero loss, zero grad) BEFORE the geometry kernel so no
        # degenerate polygon ever enters the clip pipeline, and clamp the
        # size residuals so exp() stays finite
        safe_tgt = jnp.clip(targets["reg_target"], -4.0, 4.0)
        safe_pred = jnp.where(pos[..., None],
                              jnp.clip(box_preds, -4.0, 4.0), safe_tgt)
        dec = decode_boxes(anchors, safe_pred)
        gt_dec = decode_boxes(anchors, safe_tgt)
        bev_p = jnp.concatenate([dec[..., 0:2], dec[..., 3:5],
                                 dec[..., 6:7]], axis=-1)
        bev_g = jnp.concatenate([gt_dec[..., 0:2], gt_dec[..., 3:5],
                                 gt_dec[..., 6:7]], axis=-1)
        # TPU routes through the lane-major SoA kernel (the AoS clip pads
        # its (24, 2) trailing dims ~64x into the vector lanes); CPU keeps
        # the AoS path, whose backward compiles in seconds instead of
        # minutes there. Gradients are identical (tests assert it).
        if jax.default_backend() == "tpu":
            from ..ops import geometry_soa as Gs
            riou = Gs.rbox_iou(bev_p, bev_g)
        else:
            riou = G.rbox_iou(bev_p, bev_g)
        riou_loss = jnp.sum(jnp.where(pos, 1.0 - riou, 0.0)) / npos
        total = total + riou_weight * riou_loss
        aux["riou"] = riou_loss
    aux["total"] = total
    return total, aux


# ---------------------------------------------------------------------------
# training step factory
# ---------------------------------------------------------------------------

def prepare_targets(anchors, batch, pos_iou=None, neg_iou=None,
                    num_classes=None, dense=False, cfg=None):
    """Batched anchor-target assignment as a standalone jitted program.

    Target assignment is parameter-independent — in a production input
    pipeline it runs once per batch (overlapped with the previous step),
    not inside the differentiated train step where its (N_anchors, M)
    IoU matrix and layout copies weigh on the device profile. Returns
    ``batch`` with a ``"targets"`` entry consumable by
    ``make_train_step(..., external_targets=True)``.

    :param dense: emit the all-f32 representation (cls_onehot / weight /
        posf / dir_onehot) that the loss consumes without any int/bool
        inputs — the fastest step path (requires ``num_classes``).
    :param cfg: PointPillarsConfig supplying pos_iou/neg_iou/num_classes
        defaults — thresholds must come from somewhere explicit so this
        path can never silently diverge from the in-step assignment.
    """
    if cfg is not None:
        pos_iou = cfg.pos_iou if pos_iou is None else pos_iou
        neg_iou = cfg.neg_iou if neg_iou is None else neg_iou
        num_classes = (cfg.num_classes if num_classes is None
                       else num_classes)
    if pos_iou is None or neg_iou is None:
        raise ValueError(
            "prepare_targets needs pos_iou/neg_iou — pass them explicitly "
            "or provide cfg= (no silent defaults: they could diverge from "
            "the train step's config)")
    targets = jax.vmap(
        lambda b, l, m: assign_targets(anchors, b, l, m, pos_iou, neg_iou)
    )(batch["gt_boxes"], batch["gt_labels"], batch["gt_mask"])
    if dense:
        assert num_classes is not None
        pos = targets["pos"]
        onehot = jax.nn.one_hot(jnp.maximum(targets["cls_target"], 0),
                                num_classes, dtype=jnp.float32)
        targets = dict(
            reg_target=targets["reg_target"],
            cls_onehot=jnp.where(pos[..., None], onehot, 0.0),
            weight=(pos | targets["neg"]).astype(jnp.float32),
            posf=pos.astype(jnp.float32),
            dir_onehot=jax.nn.one_hot(targets["dir_target"], 2,
                                      dtype=jnp.float32),
        )
    return dict(batch, targets=targets)


def make_train_step(model, optimizer, cfg: PointPillarsConfig, anchors,
                    riou_weight=0.0, remat=False, external_targets=False):
    """Build a pure train-step function
    ``step(params, batch_stats, opt_state, batch) -> (new..., metrics)``.

    ``batch`` carries pre-pillarized tensors plus padded GT:
    features/coords/valid from :func:`pillarize` (batched) and
    gt_boxes (B, M, 7), gt_labels (B, M), gt_mask (B, M).

    :param remat: rematerialize the forward pass in the backward
        (``jax.checkpoint`` keeping only MXU outputs via the
        ``dots_with_no_batch_dims_saveable`` policy) — trades FLOPs for HBM
        so larger per-chip batches fit.
    :param external_targets: consume ``batch["targets"]`` produced by
        :func:`prepare_targets` instead of assigning anchors in-step —
        the fast path when the input pipeline prepares targets on device.
    """

    def forward(params, batch_stats, batch):
        # "losses" collects model-internal auxiliary terms (e.g. the
        # SST-MoE load-balance loss, sown by _WindowBlock)
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["features"], batch["coords"], batch["valid"],
            train=True, mutable=["batch_stats", "losses"],
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
                lambda b, l, m: assign_targets(anchors, b, l, m,
                                               cfg.pos_iou, cfg.neg_iou)
            )(batch["gt_boxes"], batch["gt_labels"], batch["gt_mask"])
        loss, aux = detection_loss(outputs, targets, cfg, anchors,
                                   riou_weight)
        sown = updates.get("losses")
        if sown:
            aux_total = sum(jnp.sum(v)
                            for v in jax.tree.leaves(sown))
            loss = loss + getattr(cfg, "moe_aux_weight", 0.0) * aux_total
            aux = dict(aux, moe_aux=aux_total)
        return loss, (updates["batch_stats"], aux)

    def train_step(params, batch_stats, opt_state, batch):
        (loss, (new_bs, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, new_bs, opt_state, aux

    return train_step
