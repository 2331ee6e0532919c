"""Grid -> point feature gathering ("aligned scatter", after the reference's
d3d/point/scatter.cpp — despite the name the forward is a gather; only the
autodiff backward scatters, which JAX derives automatically from the gather).

TPU formulation: the reference loops one thread per (point, channel) over the
2^m neighbor lattice (scatter_cuda.cu:91-143); here the whole lattice is a
fixed (N, 2^m) batched gather + weighted reduce, one fused XLA program.

Border semantics match scatter.cpp:34-77: out-of-range coordinates clamp to
the border cell and halve the interpolation weight per crossing, so a fully
clamped point still sums to exactly the border value. One reference quirk
is reproduced deliberately: at EXACTLY integral in-range coordinates
floor == ceil and both lattice neighbors get weight 1 (scatter.cpp:64-75),
so the "linear" sum doubles per integral axis — measure-zero for real
fractional coordinates but visible on grid-aligned synthetic points.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["aligned_scatter", "nearest_neighbor",
           "farthest_point_sampling"]


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


@partial(jax.jit, static_argnames=("q_chunk", "r_chunk"))
def _nn_padded(query, ref, rvalid, q_chunk, r_chunk):
    """Chunked brute-force nearest neighbor: argmin_j |q_i - r_j|.

    |q-r|^2 = |q|^2 - 2 q.r + |r|^2 with the cross term as a matmul — on
    TPU the O(N*M) distance work rides the MXU instead of scalar loops (the
    reference builds a scipy KDTree per window, kitti360/loader.py:330-360).
    Double-chunked so the (N, M) matrix never materializes.
    """
    rn = jnp.where(rvalid, jnp.sum(ref * ref, axis=1), jnp.inf)
    nq = query.shape[0]
    m = ref.shape[0]

    def one_query_chunk(qc):
        qn = jnp.sum(qc * qc, axis=1)

        def body(j, carry):
            best_d, best_i = carry
            rc = jax.lax.dynamic_slice(ref, (j * r_chunk, 0), (r_chunk, 3))
            rnc = jax.lax.dynamic_slice(rn, (j * r_chunk,), (r_chunk,))
            # full-f32 matmul: bf16 MXU passes lose ~0.1 m at unit scale
            cross = jnp.matmul(qc, rc.T, precision=jax.lax.Precision.HIGHEST)
            d = qn[:, None] - 2.0 * cross + rnc[None, :]
            i = jnp.argmin(d, axis=1).astype(jnp.int32)
            dmin = jnp.take_along_axis(d, i[:, None], axis=1)[:, 0]
            upd = dmin < best_d
            return (jnp.where(upd, dmin, best_d),
                    jnp.where(upd, i + j * r_chunk, best_i))

        init = (jnp.full(qc.shape[0], jnp.inf, query.dtype),
                jnp.zeros(qc.shape[0], jnp.int32))
        return jax.lax.fori_loop(0, m // r_chunk, body, init)

    d2, idx = jax.lax.map(one_query_chunk,
                          query.reshape(-1, q_chunk, 3))
    return (jnp.sqrt(jnp.maximum(d2.reshape(nq), 0.0)),
            idx.reshape(nq))


def nearest_neighbor(query, ref, q_chunk=1024, r_chunk=4096, center=True):
    """Nearest reference point per query point (brute force on device).

    :param query: (N, 3) float array
    :param ref: (M, 3) float array, M >= 1
    :param center: subtract the query centroid from both clouds before the
        f32 distance expansion. At world-frame magnitudes (KITTI-360
        drives sit km from the origin) |q|^2 ~ 1e7 and the f32 ulp of the
        expansion is ~1 m^2 — large-coordinate clouds would match the
        WRONG neighbors without recentering. Distances/indices are
        translation-invariant, so this only removes the error.
    :return: (distance (N,), index (N,) int32) numpy arrays
    """
    query = np.asarray(query, np.float64)
    ref = np.asarray(ref, np.float64)
    if center and len(query):
        origin = query.mean(axis=0)
        query = query - origin
        ref = ref - origin
    query = query.astype(np.float32)
    ref = ref.astype(np.float32)
    n, m = len(query), len(ref)
    if n == 0:
        return np.zeros(0, np.float32), np.zeros(0, np.int32)
    q_chunk = min(q_chunk, max(8, n))
    r_chunk = min(r_chunk, max(8, m))
    npad = -n % q_chunk
    mpad = -m % r_chunk
    qp = np.pad(query, ((0, npad), (0, 0)))
    rp = np.pad(ref, ((0, mpad), (0, 0)))
    rvalid = np.arange(len(rp)) < m
    d, i = _nn_padded(jnp.asarray(qp), jnp.asarray(rp), jnp.asarray(rvalid),
                      q_chunk, r_chunk)
    return np.asarray(d)[:n], np.asarray(i)[:n]


@partial(jax.jit, static_argnames=("k",))
def farthest_point_sampling(xyz, k, valid=None):
    """Greedy farthest-point sampling over the LAST-but-one axis.

    Starts from the first valid point, then repeatedly picks the point
    maximizing the distance to the already-selected set — the standard
    PointNet++-style downsampler, static-shape and vmappable (the
    reference declares but never implements this filter,
    d3d/voxel/voxelize.cpp:469-471).

    :param xyz: (..., K, 3) coordinates
    :param k: static number of samples
    :param valid: optional (..., K) mask; invalid slots are never picked
    :returns: (..., k) int32 indices into the K axis, -1 beyond the valid
        count
    """
    kk = xyz.shape[-2]
    if valid is None:
        valid = jnp.ones(xyz.shape[:-1], bool)
    xyz = xyz.astype(jnp.float32)
    nvalid = jnp.sum(valid.astype(jnp.int32), axis=-1)

    def one(pts, v, nv):
        first = jnp.argmax(v).astype(jnp.int32)  # first valid slot
        d0 = jnp.sum((pts - pts[first]) ** 2, axis=-1)
        # selected slots drop to -inf so exact-duplicate points can never
        # be picked twice
        mind = jnp.where(v, d0, -jnp.inf).at[first].set(-jnp.inf)

        def body(i, state):
            mind, out = state
            nxt = jnp.argmax(mind).astype(jnp.int32)
            d = jnp.sum((pts - pts[nxt]) ** 2, axis=-1)
            mind = jnp.minimum(mind, jnp.where(v, d, -jnp.inf))
            mind = mind.at[nxt].set(-jnp.inf)
            return mind, out.at[i].set(nxt)

        out = jnp.full((k,), -1, jnp.int32).at[0].set(first)
        _, out = jax.lax.fori_loop(1, k, body, (mind, out))
        return jnp.where(jnp.arange(k) < nv, out, -1)

    batch = xyz.shape[:-2]
    flat = xyz.reshape((-1, kk, 3))
    vflat = valid.reshape((-1, kk))
    res = jax.vmap(one)(flat, vflat, nvalid.reshape((-1,)))
    return res.reshape(batch + (k,))
