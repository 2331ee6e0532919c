"""Grid -> point feature gathering ("aligned scatter", after the reference's
d3d/point/scatter.cpp — despite the name the forward is a gather; only the
autodiff backward scatters, which JAX derives automatically from the gather).

TPU formulation: the reference loops one thread per (point, channel) over the
2^m neighbor lattice (scatter_cuda.cu:91-143); here the whole lattice is a
fixed (N, 2^m) batched gather + weighted reduce, one fused XLA program.

Border semantics match scatter.cpp:34-77: out-of-range coordinates clamp to
the border cell and halve the interpolation weight per crossing, so a fully
clamped point still sums to exactly the border value.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["aligned_scatter"]


def _neighbor_lattice(coords, spatial_shape):
    """Neighbor cells + linear weights for fractional coords.

    :param coords: (N, m) fractional spatial coordinates
    :param spatial_shape: tuple of m ints (D1..Dm)
    :return: cells (N, 2^m, m) int32, weights (N, 2^m)
    """
    m = len(spatial_shape)
    nb = 1 << m
    cells = []
    weights = jnp.ones((coords.shape[0], nb), coords.dtype)
    for d in range(m):
        dmax = spatial_shape[d] - 1
        dc = coords[:, d]
        over, under = dc > dmax, dc < 0
        lo = jnp.floor(dc)
        hi = jnp.ceil(dc)
        # bit d of the neighbor index selects floor vs ceil
        bit = (jnp.arange(nb) >> d) & 1  # (2^m,)
        cell = jnp.where(bit[None, :] == 1, hi[:, None], lo[:, None])
        cell = jnp.where(over[:, None], dmax, jnp.where(under[:, None], 0, cell))
        w = jnp.where(
            bit[None, :] == 1,
            1 + dc[:, None] - hi[:, None],
            1 - dc[:, None] + lo[:, None],
        )
        w = jnp.where((over | under)[:, None], 0.5, w)
        weights = weights * w
        cells.append(cell.astype(jnp.int32))
    return jnp.stack(cells, axis=-1), weights


@partial(jax.jit, static_argnames=("method",))
def _aligned_gather(feature_map, coordinates, method):
    b = coordinates[:, 0].astype(jnp.int32)
    spatial = feature_map.shape[2:]
    cells, weights = _neighbor_lattice(coordinates[:, 1:], spatial)
    # gather: (N, 2^m, C)
    idx = (b[:, None],) + tuple(cells[..., d] for d in range(len(spatial)))
    vals = feature_map[b[:, None], :, *[cells[..., d] for d in range(len(spatial))]]
    if method == "mean":
        return jnp.mean(vals, axis=1)
    if method == "max":
        return jnp.max(vals, axis=1)
    if method == "linear":
        # weights are functions of the (non-differentiated) coordinates; the
        # reference backward never produces coordinate grads (point/__init__.py:38)
        w = jax.lax.stop_gradient(weights)
        return jnp.sum(vals * w[..., None], axis=1)
    raise ValueError("Unsupported align method!")


def aligned_scatter(coordinates, feature_map, method="drop"):
    """Gather per-point features from a dense feature map at fractional
    coordinates (API per reference d3d/point/__init__.py:41-67).

    :param feature_map: (B, C, D1, ..., Dm)
    :param coordinates: (N, m+1); column 0 is the batch index
    :param method: drop | nearest | mean | linear | max
    :return: (N, C) features
    """
    convert = isinstance(coordinates, np.ndarray)
    coordinates = jnp.asarray(coordinates)
    feature_map = jnp.asarray(feature_map)
    ndim = coordinates.shape[1]
    if feature_map.ndim != ndim + 1:
        raise ValueError(
            "feature_map must have shape B x C x D1..Dm matching coordinates"
        )

    method = (method or "drop").lower()
    if method in ("drop", "nearest"):
        c = coordinates if method == "drop" else jnp.round(coordinates)
        c = c.astype(jnp.int32)
        spatial = feature_map.shape[2:]
        if method == "nearest":  # clamp like the interpolating paths
            c = jnp.concatenate(
                [c[:, :1]]
                + [
                    jnp.clip(c[:, d + 1 : d + 2], 0, spatial[d] - 1)
                    for d in range(len(spatial))
                ],
                axis=1,
            )
        out = feature_map[c[:, 0], :, *[c[:, d] for d in range(1, ndim)]]
    elif method in ("mean", "linear", "max"):
        out = _aligned_gather(feature_map, coordinates, method)
    else:
        raise ValueError("Unsupported align method!")
    return np.asarray(out) if convert else out
