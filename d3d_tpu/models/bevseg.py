"""BEV point-cloud semantic segmentation — third model family of d3d_tpu.

PolarNet-style pipeline (Zhang et al., CVPR 2020) on the framework's own
kernels: pillarize (sort+segment voxelizer, :mod:`d3d_tpu.ops.voxel`) ->
pillar PointNet -> BEV U-Net -> per-POINT logits by bilinear gather of the
BEV feature map at each point's fractional cell coordinate
(:func:`d3d_tpu.ops.point.aligned_scatter`, method="linear" — the
reference's grid->point interpolation path, d3d/point/scatter.cpp) ->
per-point cross-entropy. Predictions feed
:class:`d3d_tpu.benchmarks.SegmentationEvaluator` directly, closing the
reference's segmentation-evaluation loop (SemanticKITTI-style labels from
the odometry loader) end-to-end on TPU.

Everything is static-shape and jit/vmap/pjit-friendly: batch shards over
``dp`` and conv channels over ``tp`` exactly like the detectors
(:func:`d3d_tpu.parallel.shard_train_step`).
"""

from dataclasses import dataclass
from functools import partial
from typing import Callable, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from ..ops.point import aligned_scatter
from .pointpillars import _PFN, _ConvBlock, pillarize as _pp_pillarize

__all__ = ["BEVSegConfig", "BEVSeg", "bevseg_pillarize", "point_cell_coords",
           "segmentation_loss", "make_train_step", "make_predictor",
           "panoptic_targets", "panoptic_loss", "group_instances",
           "make_panoptic_predictor"]


@dataclass(frozen=True)
class BEVSegConfig:
    """Static configuration (hashable -> usable as a jit static arg)."""

    bounds: Tuple[float, ...] = (-48.0, 48.0, -48.0, 48.0, -3.0, 1.8)
    grid: Tuple[int, int] = (480, 480)
    max_pillars: int = 12000
    max_points_per_pillar: int = 32
    pfn_features: int = 64
    enc_channels: Tuple[int, ...] = (64, 128, 256)
    enc_blocks: Tuple[int, ...] = (2, 2, 2)
    dec_channels: int = 128
    num_classes: int = 20          # SemanticKITTI-style taxonomy size
    ignore_index: int = 0          # unlabeled
    # panoptic extension (Panoptic-PolarNet, Zhou et al. CVPR 2021):
    # center-heatmap + offset heads over the same BEV decoder; instances
    # group by offset-shifted nearest-center assignment
    panoptic: bool = False
    thing_classes: Tuple[int, ...] = ()   # instance-forming class values
    max_instances: int = 64               # per-frame target/center cap
    center_sigma: float = 2.0             # gaussian splat sigma (cells)
    center_radius: float = 2.5            # grouping gate (meters)
    dtype: str = "float32"

    @property
    def voxel_size(self):
        b = np.asarray(self.bounds).reshape(3, 2)
        return (b[:, 1] - b[:, 0]) / np.array([*self.grid, 1])


def bevseg_pillarize(points, cfg: BEVSegConfig):
    """Pillar tensors for the segmentation grid (reuses the PointPillars
    pillarization; the two configs share field names)."""
    return _pp_pillarize(points, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def point_cell_coords(points, cfg: BEVSegConfig):
    """Fractional BEV cell coordinates of each point, in the convention of
    :func:`~d3d_tpu.ops.point.aligned_scatter` (cell centers at integers):
    ``(x - bound_lo) / voxel - 0.5``. Shape (N, 2)."""
    vsize = jnp.asarray(cfg.voxel_size[:2], points.dtype)
    bmin = jnp.asarray([cfg.bounds[0], cfg.bounds[2]], points.dtype)
    return (points[..., :2] - bmin) / vsize - 0.5


class _Up(nn.Module):
    channels: int
    dtype: str

    @nn.compact
    def __call__(self, x, skip, train: bool):
        dt = jnp.dtype(self.dtype)
        x = nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2),
                             use_bias=False, dtype=dt)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=dt)(x)
        x = nn.relu(x)
        return jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)


class BEVSeg(nn.Module):
    """Pillar encoder -> BEV U-Net -> per-point class logits.
    ``constrain`` is the optional activation-sharding hook
    (:func:`d3d_tpu.parallel.spatial_constrain`) for running the canvas
    spatially partitioned over a mesh 'sp' axis."""

    cfg: BEVSegConfig
    constrain: Callable = None

    @nn.compact
    def __call__(self, features, coords, valid, point_coords,
                 train: bool = False):
        """:param features: (B, P, K, 9) pillar point decorations
        :param coords: (B, P, 2) int32 pillar cells
        :param valid: (B, P) pillar mask
        :param point_coords: (B, N, 2) fractional BEV coords of the raw
            points (from :func:`point_cell_coords`)
        :return: (B, N, num_classes) f32 per-point logits
        """
        cfg = self.cfg
        con = self.constrain or (lambda x, kind: x)
        b = features.shape[0]
        dt = jnp.dtype(cfg.dtype)

        pmask = jnp.any(features != 0, axis=-1)
        pf = _PFN(cfg.pfn_features, cfg.dtype)(features, pmask, train)
        pf = pf * valid[..., None].astype(pf.dtype)

        from .pointpillars import scatter_to_bev
        x = con(scatter_to_bev(pf, coords, valid, cfg.grid), "bev")

        # U-Net encoder (stride-2 stages) with skip connections
        skips = []
        for i, (ch, nb) in enumerate(zip(cfg.enc_channels, cfg.enc_blocks)):
            x = con(_ConvBlock(ch, nb, 2 if i > 0 else 1, cfg.dtype)(
                x, train), "bev")
            skips.append(x)
        for skip in skips[-2::-1]:
            x = con(_Up(cfg.dec_channels, cfg.dtype)(x, skip, train), "bev")
        x = con(_ConvBlock(cfg.dec_channels, 1, 1, cfg.dtype)(x, train),
                "bev")
        logits_map = nn.Conv(cfg.num_classes, (1, 1), dtype=dt,
                             name="head_seg")(x)  # (B, W, H, C)
        if cfg.panoptic:
            # -2.19 = logit(0.1): quiet initial heatmap (focal-loss trick)
            heatmap = nn.Conv(
                1, (1, 1), dtype=dt, name="head_center",
                bias_init=nn.initializers.constant(-2.19))(x)
            offset_map = nn.Conv(2, (1, 1), dtype=dt,
                                 name="head_offset")(x)  # meters toward ctr

        # per-point bilinear gather off the BEV map (aligned_scatter wants
        # (B, C, D1, D2) channel-second layout and a leading batch column)
        n = point_coords.shape[1]
        bcol = jnp.repeat(jnp.arange(b, dtype=point_coords.dtype), n)
        flatc = jnp.concatenate([bcol[:, None],
                                 point_coords.reshape(b * n, 2)], axis=1)

        def gather(m):
            fm = jnp.transpose(m.astype(jnp.float32), (0, 3, 1, 2))
            g = aligned_scatter(flatc, fm, method="linear")
            return g.reshape(b, n, m.shape[-1])

        pt_logits = gather(logits_map)
        if not cfg.panoptic:
            return pt_logits
        return dict(sem=pt_logits,
                    heatmap=heatmap[..., 0].astype(jnp.float32),
                    offset=gather(offset_map))


def segmentation_loss(logits, labels, cfg: BEVSegConfig, label_smooth=0.0):
    """Masked per-point cross-entropy; ``ignore_index`` points drop out.

    :param logits: (B, N, C) f32
    :param labels: (B, N) int32
    :return: scalar loss, dict of metrics
    """
    c = cfg.num_classes
    mask = (labels != cfg.ignore_index).astype(jnp.float32)
    onehot = jax.nn.one_hot(labels, c, dtype=jnp.float32)
    if label_smooth > 0:
        onehot = onehot * (1 - label_smooth) + label_smooth / c
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(onehot * logp, axis=-1)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    loss = jnp.sum(ce * mask) / denom
    acc = jnp.sum((jnp.argmax(logits, -1) == labels) * mask) / denom
    return loss, {"seg": loss, "acc": acc}


# ---------------------------------------------------------------------------
# panoptic extension: center/offset targets, loss, instance grouping
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",))
def panoptic_targets(cfg: BEVSegConfig, points, labels, inst_ids):
    """One frame of center-heatmap + offset targets from instance labels.

    Instance centers are the mean BEV position of each instance's points
    (sorted-segment means, capped at ``cfg.max_instances`` in
    first-encounter order); the heatmap is a gaussian splat at each
    center cell and offsets point from each thing point to its center.

    :param points: (N, >=2) frame points
    :param labels: (N,) int semantic labels
    :param inst_ids: (N,) int instance ids (0 = no instance)
    :returns: dict(heatmap (W, H), offset (N, 2) meters,
        offset_mask (N,))
    """
    w, h = cfg.grid
    n = points.shape[0]
    m = cfg.max_instances
    thing = jnp.isin(labels, jnp.asarray(cfg.thing_classes)) \
        & (inst_ids > 0)
    key = jnp.where(thing, inst_ids.astype(jnp.int32), jnp.int32(1 << 30))

    # compact instance index in first-encounter-free (sorted-key) order
    ks, xs, ys, idx = lax.sort(
        (key, points[:, 0].astype(jnp.float32),
         points[:, 1].astype(jnp.float32),
         jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    firstk = jnp.concatenate([jnp.ones(1, bool), ks[1:] != ks[:-1]])
    seg = jnp.cumsum(firstk.astype(jnp.int32)) - 1
    cnt = jax.ops.segment_sum(jnp.ones(n, jnp.int32), seg, num_segments=n,
                              indices_are_sorted=True)
    sx = jax.ops.segment_sum(xs, seg, num_segments=n,
                             indices_are_sorted=True)
    sy = jax.ops.segment_sum(ys, seg, num_segments=n,
                             indices_are_sorted=True)
    cx = sx / jnp.maximum(cnt, 1)
    cy = sy / jnp.maximum(cnt, 1)
    segval = (ks != (1 << 30))
    seg_valid = jax.ops.segment_max(segval.astype(jnp.int32), seg,
                                    num_segments=n,
                                    indices_are_sorted=True) > 0
    inst_ok = seg_valid & (jnp.arange(n) < m)

    # per-point offset target (center - point), back in input order
    off_s = jnp.stack([cx[seg] - xs, cy[seg] - ys], axis=1)
    ok_s = inst_ok[seg] & segval
    offset = jnp.zeros((n, 2), jnp.float32).at[idx].set(off_s)
    omask = jnp.zeros(n, bool).at[idx].set(ok_s)

    # gaussian heatmap at the (up to m) centers
    vx = (cfg.bounds[1] - cfg.bounds[0]) / w
    vy = (cfg.bounds[3] - cfg.bounds[2]) / h
    ccx = (cx[:m] - cfg.bounds[0]) / vx - 0.5
    ccy = (cy[:m] - cfg.bounds[2]) / vy - 0.5
    gx = jnp.arange(w, dtype=jnp.float32)
    gy = jnp.arange(h, dtype=jnp.float32)
    d2 = ((gx[None, :, None] - ccx[:m, None, None]) ** 2
          + (gy[None, None, :] - ccy[:m, None, None]) ** 2)
    val = jnp.exp(-d2 / (2 * cfg.center_sigma ** 2))
    val = jnp.where(inst_ok[:m, None, None], val, 0.0)
    heatmap = jnp.max(val, axis=0)
    return dict(heatmap=heatmap, offset=offset, offset_mask=omask)


def panoptic_loss(outputs, targets, cfg: BEVSegConfig, labels,
                  label_smooth=0.0, center_weight=100.0, offset_weight=1.0):
    """Semantic CE + MSE heatmap + masked-L1 offsets
    (Panoptic-PolarNet's loss mix)."""
    sem_loss, aux = segmentation_loss(outputs["sem"], labels, cfg,
                                      label_smooth)
    hm = jax.nn.sigmoid(outputs["heatmap"])
    hm_loss = jnp.mean(jnp.square(hm - targets["heatmap"]))
    om = targets["offset_mask"][..., None]
    denom = jnp.maximum(jnp.sum(om), 1.0)
    off_loss = jnp.sum(jnp.abs(outputs["offset"] - targets["offset"]) * om) \
        / denom
    total = sem_loss + center_weight * hm_loss + offset_weight * off_loss
    aux = dict(aux, hm=hm_loss, offset=off_loss, total=total)
    return total, aux


@partial(jax.jit, static_argnames=("cfg", "top_k"))
def group_instances(cfg: BEVSegConfig, sem_labels, points, offsets,
                    heatmap, top_k=64):
    """Fixed-shape instance grouping: 3x3 peak-NMS + top-k centers off the
    heatmap, then every thing point votes with its offset-shifted
    position for the nearest center within ``cfg.center_radius``.

    :param sem_labels: (N,) predicted semantic labels
    :param points: (N, >=2)
    :param offsets: (N, 2) predicted center offsets (meters)
    :param heatmap: (W, H) center logits
    :returns: (N,) uint16 instance ids (0 = stuff / unassigned)
    """
    w, h = cfg.grid
    hm = jax.nn.sigmoid(heatmap)
    pooled = lax.reduce_window(hm, -jnp.inf, lax.max, (3, 3), (1, 1),
                               "SAME")
    peaks = jnp.where(hm >= pooled, hm, 0.0)
    scores, idx = lax.top_k(peaks.reshape(-1), top_k)
    vx = (cfg.bounds[1] - cfg.bounds[0]) / w
    vy = (cfg.bounds[3] - cfg.bounds[2]) / h
    ccx = ((idx // h).astype(jnp.float32) + 0.5) * vx + cfg.bounds[0]
    ccy = ((idx % h).astype(jnp.float32) + 0.5) * vy + cfg.bounds[2]
    ok = scores > 0.1

    voted = points[:, :2].astype(jnp.float32) + offsets
    d2 = ((voted[:, 0:1] - ccx[None, :]) ** 2
          + (voted[:, 1:2] - ccy[None, :]) ** 2)
    d2 = jnp.where(ok[None, :], d2, jnp.inf)
    best = jnp.argmin(d2, axis=1)
    bd = jnp.take_along_axis(d2, best[:, None], axis=1)[:, 0]
    thing = jnp.isin(sem_labels, jnp.asarray(cfg.thing_classes))
    gate = thing & (bd <= cfg.center_radius ** 2)
    return jnp.where(gate, best + 1, 0).astype(jnp.uint16)


def make_panoptic_predictor(model, cfg: BEVSegConfig, top_k=64):
    """Jitted points -> (semantic labels, instance ids) closure; feed the
    pair straight into ``device_panoptic_stats`` /
    ``SegmentationEvaluator.calc_stats(..., gt_ids, pred_ids)``."""
    assert cfg.panoptic, "build the model with BEVSegConfig(panoptic=True)"

    @jax.jit
    def predict(variables, points):
        feats, coords, valid = bevseg_pillarize(points, cfg)
        pc = point_cell_coords(points, cfg)
        out = model.apply(variables, feats[None], coords[None],
                          valid[None], pc[None], train=False)
        sem = jnp.argmax(out["sem"][0], axis=-1).astype(jnp.int32)
        ids = group_instances(cfg, sem, points, out["offset"][0],
                              out["heatmap"][0], top_k=top_k)
        return sem, ids

    return predict


def make_train_step(model, optimizer, cfg: BEVSegConfig, remat=False,
                    label_smooth=0.0):
    """``step(params, batch_stats, opt_state, batch) -> (new..., metrics)``;
    batch: features/coords/valid from :func:`bevseg_pillarize` (batched),
    point_coords (B, N, 2) from :func:`point_cell_coords`, labels (B, N).
    With ``cfg.panoptic`` the batch also carries the raw ``points``
    (B, N, >=2) and ``inst_ids`` (B, N) for the center/offset targets."""

    def forward(params, batch_stats, batch):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["features"], batch["coords"], batch["valid"],
            batch["point_coords"], train=True, mutable=["batch_stats"],
        )

    if remat:
        forward = jax.checkpoint(
            forward,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)

    def loss_fn(params, batch_stats, batch):
        out, updates = forward(params, batch_stats, batch)
        if cfg.panoptic:
            targets = jax.vmap(
                lambda p, l, i: panoptic_targets(cfg, p, l, i)
            )(batch["points"], batch["labels"], batch["inst_ids"])
            loss, aux = panoptic_loss(out, targets, cfg, batch["labels"],
                                      label_smooth)
        else:
            loss, aux = segmentation_loss(out, batch["labels"], cfg,
                                          label_smooth)
        return loss, (updates["batch_stats"], aux)

    def train_step(params, batch_stats, opt_state, batch):
        (loss, (new_bs, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        aux = dict(aux, total=loss)
        return params, new_bs, opt_state, aux

    return train_step


def make_predictor(model, cfg: BEVSegConfig):
    """Jitted points -> per-point labels closure for evaluation: feed the
    result straight into SegmentationEvaluator.calc_stats."""

    @jax.jit
    def predict(variables, points):
        feats, coords, valid = bevseg_pillarize(points, cfg)
        pc = point_cell_coords(points, cfg)
        logits = model.apply(variables, feats[None], coords[None],
                             valid[None], pc[None], train=False)
        return jnp.argmax(logits[0], axis=-1).astype(jnp.int32)

    return predict
