"""2D image semantic segmentation — the camera half of PointPainting.

A compact UNet (encoder/decoder with skip connections, all dense convs
— MXU/XLA native) producing per-pixel class scores. Its softmax output
is exactly what :func:`d3d_tpu.ops.painting.paint_points` consumes, so
camera semantics -> painted cloud -> any lidar family is a fully
in-framework pipeline (PointPainting, arXiv:1911.10150, uses a
DeepLab-class net here; the architecture is a config knob, the
contract is the (H, W, C) score map).
"""

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

__all__ = ["Seg2DConfig", "Seg2D", "make_seg2d_train_step",
           "make_segmenter"]


@dataclass(frozen=True)
class Seg2DConfig:
    """Static configuration (hashable -> usable as a jit static arg)."""

    image_size: Tuple[int, int] = (384, 1280)  # checked at __call__
    channels: Tuple[int, ...] = (16, 32, 64)   # encoder stages (stride 2)
    num_classes: int = 4
    dtype: str = "float32"


class _Block(nn.Module):
    features: int
    stride: int
    dtype: str
    transpose: bool = False

    @nn.compact
    def __call__(self, x, train):
        dt = jnp.dtype(self.dtype)
        conv = nn.ConvTranspose if self.transpose else nn.Conv
        kw = dict(strides=(self.stride,) * 2, padding="SAME",
                  use_bias=False, dtype=dt)
        x = conv(self.features, (4, 4) if self.transpose else (3, 3),
                 **kw)(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         dtype=dt)(x)
        return nn.relu(x)


class Seg2D(nn.Module):
    """UNet: per-pixel class logits (B, H, W, num_classes)."""

    cfg: Seg2DConfig

    @nn.compact
    def __call__(self, images, train: bool = False):
        cfg = self.cfg
        if tuple(images.shape[1:3]) != tuple(cfg.image_size):
            raise ValueError(
                "images %s != cfg.image_size %s"
                % (images.shape[1:3], cfg.image_size))
        if any(v % (2 ** len(cfg.channels)) for v in cfg.image_size):
            raise ValueError("image_size must divide by 2^depth = %d"
                             % (2 ** len(cfg.channels)))
        dt = jnp.dtype(cfg.dtype)
        x = images.astype(dt)
        skips = []
        for ch in cfg.channels:
            x = _Block(ch, 2, cfg.dtype)(x, train)
            skips.append(x)
        for ch, skip in zip(reversed(cfg.channels[:-1]),
                            reversed(skips[:-1])):
            x = _Block(ch, 2, cfg.dtype, transpose=True)(x, train)
            x = jnp.concatenate([x, skip], axis=-1)
            x = _Block(ch, 1, cfg.dtype)(x, train)
        x = _Block(cfg.channels[0], 2, cfg.dtype, transpose=True)(x,
                                                                  train)
        logits = nn.Conv(cfg.num_classes, (1, 1), dtype=dt)(x)
        return logits.astype(jnp.float32)


def make_seg2d_train_step(model, optimizer, cfg: Seg2DConfig):
    """``step(params, batch_stats, opt_state, batch)``; batch: images
    (B, H, W, 3), labels (B, H, W) int32 with -1 = ignore."""

    def loss_fn(params, batch_stats, batch):
        logits, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"], train=True, mutable=["batch_stats"])
        labels = batch["labels"]
        valid = labels >= 0
        oh = jax.nn.one_hot(jnp.maximum(labels, 0), cfg.num_classes)
        ll = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.sum(oh * ll, axis=-1) * valid
        loss = jnp.sum(ce) / jnp.maximum(jnp.sum(valid), 1)
        acc = jnp.sum((jnp.argmax(logits, -1) == labels) & valid) \
            / jnp.maximum(jnp.sum(valid), 1)
        return loss, (updates["batch_stats"],
                      dict(total=loss, acc=acc))

    def train_step(params, batch_stats, opt_state, batch):
        (loss, (new_bs, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, new_bs, opt_state, aux

    return train_step


def make_segmenter(model, variables):
    """``segment(image (H, W, 3)) -> (H, W, num_classes)`` softmax
    scores — the painting feature map (jitted once; also works under a
    leading batch axis via vmap in callers)."""

    @jax.jit
    def segment(image):
        logits = model.apply(variables, image[None], train=False)[0]
        return jax.nn.softmax(logits, axis=-1)

    return segment
