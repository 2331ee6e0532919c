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
import flax.linen as nn

from ..ops.point import aligned_scatter
from .pointpillars import _PFN, _ConvBlock, pillarize as _pp_pillarize

__all__ = ["BEVSegConfig", "BEVSeg", "bevseg_pillarize", "point_cell_coords",
           "segmentation_loss", "make_train_step", "make_predictor"]


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
                         epsilon=1e-3, dtype=jnp.float32)(x)
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

        # per-point bilinear gather off the BEV map (aligned_scatter wants
        # (B, C, D1, D2) channel-second layout and a leading batch column)
        fmap = jnp.transpose(logits_map.astype(jnp.float32), (0, 3, 1, 2))
        n = point_coords.shape[1]
        bcol = jnp.repeat(jnp.arange(b, dtype=point_coords.dtype), n)
        flatc = jnp.concatenate([bcol[:, None],
                                 point_coords.reshape(b * n, 2)], axis=1)
        pt_logits = aligned_scatter(flatc, fmap, method="linear")
        return pt_logits.reshape(b, n, cfg.num_classes)


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


def make_train_step(model, optimizer, cfg: BEVSegConfig, remat=False,
                    label_smooth=0.0):
    """``step(params, batch_stats, opt_state, batch) -> (new..., metrics)``;
    batch: features/coords/valid from :func:`bevseg_pillarize` (batched),
    point_coords (B, N, 2) from :func:`point_cell_coords`, labels (B, N)."""

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
        logits, updates = forward(params, batch_stats, batch)
        loss, aux = segmentation_loss(logits, batch["labels"], cfg,
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
