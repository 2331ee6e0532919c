"""Sparse 3D convolution for TPU — the SECOND-style voxel-backbone story.

GPU frameworks (spconv, the reference's ecosystem) build hash-map "rule
books" mapping kernel offsets to (input, output) index pairs and launch
gather-GEMM-scatter per offset. TPUs have no efficient hash maps or
scatters, but they have fast multi-operand sorts and gathers — and sparse
voxel sets have a property that makes sorting sufficient:

    For a FIXED kernel offset, the linearized neighbor key of every active
    site is ``key + const`` — a constant shift, which PRESERVES sort order.

So both the reference sites and their offset queries are sorted lists, and
an exact-match join needs no hash and no (TPU-emulated, ~14 ms)
``searchsorted``: concatenate ``2*ref_key`` with ``2*query_key + 1``, sort
once (3-operand int32 ``lax.sort``), and a match is exactly "an even
(ref) element immediately precedes an odd (query) element of the same
key" — one shifted compare, fully vectorized on the VPU. Keys are unique
per list (active sites are unique), so no scan is needed.

For moderate grids (the usual case — SECOND-KITTI is 352x400x20 ~ 2.8M
cells) there is an even more TPU-friendly build: scatter the N active row
ids into a dense int32 canvas (one unique-index scatter, 4 bytes/cell in
HBM) and read the whole (N, K) neighbor map back with ONE vectorized
gather. ``build_neighbor_map`` picks the canvas automatically under
``_DENSE_CANVAS_MAX_CELLS`` and falls back to the tagged sort join above
for arbitrarily large grids.

The neighbor maps (N, K) are built ONCE per point cloud (they depend on
geometry, not parameters) and reused by every layer of a stage; the
convolution itself is K gathers + one ``einsum('knc,kcd->nd')`` batched
matmul on the MXU. Submanifold convs (output sites = input sites) and
strided sparse convs (output sites = unique downsampled coords, computed
with the same sort machinery) cover the SECOND backbone's needs.

All shapes are static: active-site counts are padded to ``max_sites``
with invalid entries masked by a sentinel, jit/vmap/pjit-friendly.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["kernel_offsets", "linearize", "match_sorted",
           "build_neighbor_map", "build_neighbor_map_strided",
           "subm_conv_apply", "downsample_coords", "sparse_to_dense"]


def kernel_offsets(kernel_size=3, ndim=3):
    """All integer offsets of a cubic kernel, center-first ordering not
    required — (K, ndim) int32, K = kernel_size**ndim."""
    r = np.arange(kernel_size) - kernel_size // 2
    grids = np.meshgrid(*([r] * ndim), indexing="ij")
    return np.stack([g.ravel() for g in grids], axis=1).astype(np.int32)


def linearize(coords, grid):
    """Linear int32 keys of (N, 3) integer coords on ``grid`` (D tuple).

    The grid volume must stay below 2**30: :func:`match_sorted` reserves
    one bit for the ref/query tag (keys are doubled)."""
    d0, d1, d2 = grid
    assert d0 * d1 * d2 < (1 << 30), \
        f"sparse grid {grid} too large for tagged int32 sort keys"
    return (coords[:, 0] * (d1 * d2) + coords[:, 1] * d2
            + coords[:, 2]).astype(jnp.int32)


def match_sorted(ref_keys, ref_valid, query_keys, query_valid):
    """Exact-match join of two key lists with unique valid keys each.

    :returns: (M,) int32 — for each query, the matching ref ROW or -1.

    Implementation: sort ``[2*ref, 2*query+1]`` with carried (tag, row)
    operands; a query matches iff its immediate predecessor in sort order
    is a ref with the same key.
    """
    n, m = ref_keys.shape[0], query_keys.shape[0]
    big = jnp.int32(2 ** 30 - 1)
    rk = jnp.where(ref_valid, ref_keys, big) * 2
    qk = jnp.where(query_valid, query_keys, big) * 2 + 1
    keys = jnp.concatenate([rk, qk])
    tags = jnp.concatenate([jnp.zeros(n, jnp.int32), jnp.ones(m, jnp.int32)])
    rows = jnp.concatenate([jnp.arange(n, dtype=jnp.int32),
                            jnp.arange(m, dtype=jnp.int32)])
    sk, st, sr = lax.sort((keys, tags, rows), num_keys=1, is_stable=True)

    prev_is_ref = jnp.concatenate([jnp.zeros(1, bool), st[:-1] == 0])
    same_key = jnp.concatenate([jnp.zeros(1, bool),
                                (sk[1:] // 2) == (sk[:-1] // 2)])
    hit = (st == 1) & prev_is_ref & same_key
    matched_ref = jnp.concatenate([jnp.zeros(1, jnp.int32), sr[:-1]])
    val = jnp.where(hit, matched_ref, -1)

    # permute back to query-row order with a second sort (a scatter would
    # serialize on TPU); each query row appears exactly once among tag==1
    qkey = jnp.where(st == 1, sr, jnp.int32(2 ** 30 - 1))
    _, val_sorted = lax.sort((qkey, val), num_keys=1)
    return jnp.where(query_valid, val_sorted[:m], -1)


# below this grid volume the dense-canvas build is used: an int32 canvas of
# V cells is 4V bytes (64 MB at the threshold), one unique-index scatter of
# N rows + ONE (N*K,) gather replaces K tagged sorts entirely
_DENSE_CANVAS_MAX_CELLS = 1 << 24
# On TPU the canvas lives in HBM where 2^26 cells is a 268 MB transient —
# cheap next to the 27-way tagged sort join it replaces (the VoxelNeXt
# nuScenes grid is 1080x1080x40 = 46.7M cells; its sort joins measured
# 25.5 ms/step = 15% of the b1 train step on a v5e, the canvas ~1 ms).
_DENSE_CANVAS_MAX_CELLS_TPU = 1 << 26


def _dense_canvas_max_cells():
    return (_DENSE_CANVAS_MAX_CELLS_TPU
            if jax.default_backend() == "tpu" else _DENSE_CANVAS_MAX_CELLS)


def _dense_row_canvas(keys, valid, volume):
    """(V + 1,) int32 canvas holding the active row index at each occupied
    cell (-1 empty); invalid rows land in the discarded overflow slot."""
    n = keys.shape[0]
    idx = jnp.where(valid, keys, jnp.int32(volume))
    canvas = jnp.full((volume + 1,), -1, jnp.int32)
    canvas = canvas.at[idx].set(jnp.arange(n, dtype=jnp.int32),
                                unique_indices=False)
    # the overflow slot absorbed the invalid rows AND answers every
    # out-of-bounds / invalid query -> restore its "absent" value
    return canvas.at[volume].set(jnp.int32(-1))


def _neighbor_map_impl(query_coords, query_valid, ref_keys, ref_valid, grid,
                       kernel_size, stride=1):
    """Shared neighbor-map core: query site q looks up the input row at
    ``q * stride + off`` for every kernel offset.

    Two strategies (identical results):

    * dense canvas (default for grids under ``_DENSE_CANVAS_MAX_CELLS``):
      scatter row ids into a (V,) canvas once, then the whole (N, K) map
      is ONE vectorized gather — no sorts;
    * tagged sort join (arbitrarily large grids): per offset, concatenate
      ``2*ref`` and ``2*query+1`` keys and sort; a query matches iff its
      predecessor is a ref with the same key (see :func:`match_sorted`).
    """
    offs = jnp.asarray(kernel_offsets(kernel_size), jnp.int32)  # (K, 3)
    gmax = jnp.asarray(grid, jnp.int32)
    volume = int(np.prod(grid))

    if volume <= _dense_canvas_max_cells():
        canvas = _dense_row_canvas(ref_keys, ref_valid, volume)
        qc = query_coords[:, None, :] * stride + offs[None, :, :]  # (N, K, 3)
        inb = jnp.all((qc >= 0) & (qc < gmax[None, None, :]), axis=-1)
        inb = inb & query_valid[:, None]
        d0, d1, d2 = grid
        qk = (qc[..., 0] * (d1 * d2) + qc[..., 1] * d2
              + qc[..., 2]).astype(jnp.int32)
        safe = jnp.where(inb, qk, jnp.int32(volume))
        return canvas[safe]  # (N, K) rows, -1 absent

    def one_offset(off):
        qc = query_coords * stride + off[None, :]
        inb = jnp.all((qc >= 0) & (qc < gmax[None, :]), axis=1) & query_valid
        qk = linearize(qc, grid)
        return match_sorted(ref_keys, ref_valid, qk, inb)

    return jnp.transpose(jax.vmap(one_offset)(offs))  # (N, K)


@partial(jax.jit, static_argnames=("grid", "kernel_size"))
def build_neighbor_map(coords, valid, grid, kernel_size=3):
    """Neighbor map for a submanifold conv on active sites.

    :param coords: (N, 3) int32 active-voxel coords (padded rows arbitrary)
    :param valid: (N,) active mask
    :param grid: (D0, D1, D2) static grid shape
    :returns: (N, K) int32 — input row index of each kernel-offset
        neighbor, -1 where absent / out of bounds / invalid.
    """
    keys = linearize(coords, grid)
    return _neighbor_map_impl(coords, valid, keys, valid, grid, kernel_size)


@partial(jax.jit, static_argnames=("grid", "stride", "kernel_size"))
def build_neighbor_map_strided(out_coords, out_valid, in_coords, in_valid,
                               grid, stride=2, kernel_size=3):
    """Neighbor map of a strided sparse conv: for each OUTPUT site, the
    input row at ``out * stride + off`` per kernel offset (grid is the
    INPUT grid shape). Returns (M, K) int32, -1 where absent."""
    in_keys = linearize(in_coords, grid)
    return _neighbor_map_impl(out_coords, out_valid, in_keys, in_valid,
                              grid, kernel_size, stride=stride)


# VMEM budget for the fused Pallas path: features, gathered rows, indices
# and the output accumulator all live on chip in (C, N) layout (the
# fused_bytes estimate below). 48 MB leaves ~2.5x headroom on a v5e's
# 128 MB VMEM and admits the SECOND-KITTI C64 stage (16.7 MB at 16k
# sites), which a previous 10 MB budget silently excluded.
_FUSED_VMEM_BUDGET = 48 * 1024 * 1024


def _fused_enabled():
    # OPT-IN: real Mosaic (v5e, 2026-08-19) rejects the kernel's lane
    # gather — "Not implemented: Multiple source vregs along gather
    # dimension" on tpu.dynamic_gather(dimensions=[1]) whenever the site
    # axis exceeds one 128-lane vreg. The VPU's dynamic gather is a
    # lane-local shuffle; an arbitrary-reach gather has no vector-unit
    # lowering, so the fused path cannot compile at any realistic N.
    # The kernel stays for interpret-mode tests and future Mosaic
    # releases; set D3D_TPU_FUSED_SPCONV=1 to re-enable the dispatch.
    import os

    return os.environ.get("D3D_TPU_FUSED_SPCONV", "0") == "1"


def subm_conv_apply(features, nbr, weights, valid, symmetric=False):
    """Submanifold sparse conv: K gathers + one batched MXU matmul.

    With ``D3D_TPU_FUSED_SPCONV=1`` (opt-in; see :func:`_fused_enabled`
    for why real Mosaic rejects it today), TPU queries whose operands fit
    VMEM dispatch to the fused on-chip Pallas kernel
    (:func:`d3d_tpu.ops.sparse_conv_pallas.subm_conv_fused`) instead of
    materializing the (N, K, C) gather in HBM.

    :param features: (N, C) active-site features (padded rows zero)
    :param nbr: (N, K) neighbor map from :func:`build_neighbor_map`
    :param weights: (K, C, C') kernel
    :param valid: (N,) active mask
    :param symmetric: static — set True when ``nbr`` is a submanifold map
        from :func:`build_neighbor_map` (NOT a strided map); enables the
        fully fused backward for d/dfeatures.
    :returns: (N, C') features on the SAME active set
    """
    n, c = features.shape
    nq, k = nbr.shape
    d = weights.shape[2]
    fused_bytes = n * 4 * (3 * c + d)
    if (jax.default_backend() == "tpu" and nq <= n
            and fused_bytes <= _FUSED_VMEM_BUDGET and _fused_enabled()):
        from .sparse_conv_pallas import subm_conv_fused
        if nq == n:
            return subm_conv_fused(features, nbr, weights, valid, symmetric)
        # strided map with fewer query rows (downsample cap < N): the
        # Mosaic lane gather needs indices shaped like the operand, so pad
        # the query set with absent rows — same VMEM cost, still skips the
        # (N, K, C) HBM gather — and slice the result
        nbr_full = jnp.concatenate(
            [nbr, jnp.full((n - nq, k), -1, nbr.dtype)])
        valid_full = jnp.concatenate(
            [valid, jnp.zeros(n - nq, bool)])
        return subm_conv_fused(features, nbr_full, weights, valid_full,
                               False)[:nq]
    safe = jnp.where(nbr >= 0, nbr, 0)
    gathered = features[safe]                      # (N, K, C)
    gathered = jnp.where((nbr >= 0)[..., None], gathered, 0.0)
    out = jnp.einsum("nkc,kcd->nd", gathered,
                     weights.astype(gathered.dtype))
    return out * valid[:, None].astype(out.dtype)


@partial(jax.jit, static_argnames=("grid", "stride", "max_out"))
def downsample_coords(coords, valid, grid, stride=2, max_out=None):
    """Active sites of a stride-``s`` sparse conv output: unique
    ``coords // s``, padded to ``max_out`` (defaults to N).

    :returns: (out_coords (M, 3) int32, out_valid (M,)) in sorted key order.
    """
    m = max_out or coords.shape[0]
    og = tuple(-(-g // stride) for g in grid)
    down = coords // stride
    keys = jnp.where(valid, linearize(down, og), jnp.int32(2 ** 30 - 1))
    sk, sc0, sc1, sc2 = lax.sort(
        (keys, down[:, 0], down[:, 1], down[:, 2]), num_keys=1)
    first = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    first = first & (sk < 2 ** 30 - 1)
    # compact the unique rows to the front with a second sort
    order_key = jnp.where(first, jnp.arange(sk.shape[0], dtype=jnp.int32),
                          jnp.int32(2 ** 30 - 1))
    _, c0, c1, c2, f = lax.sort(
        (order_key, sc0, sc1, sc2, first.astype(jnp.int32)), num_keys=1)
    out = jnp.stack([c0[:m], c1[:m], c2[:m]], axis=1)
    return out, f[:m] > 0


@partial(jax.jit, static_argnames=("grid",))
def sparse_to_dense(features, coords, valid, grid):
    """Densify (N, C) site features to (D0, D1, D2, C) (invalid -> 0).
    One scatter at the FINAL (small) stage resolution only."""
    d0, d1, d2 = grid
    flat = jnp.where(valid, linearize(coords, grid), d0 * d1 * d2)
    canvas = jnp.zeros((d0 * d1 * d2 + 1, features.shape[1]),
                       features.dtype)
    canvas = canvas.at[flat].add(
        features * valid[:, None].astype(features.dtype))
    return canvas[:-1].reshape(d0, d1, d2, features.shape[1])
