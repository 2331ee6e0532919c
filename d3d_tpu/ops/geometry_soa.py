"""Structure-of-arrays rotated-IoU kernel for TPU.

The AoS formulation in :mod:`d3d_tpu.ops.geometry` keeps points as
``(..., 24, 2)`` arrays; TPU tiles pad the trailing dimensions to the
(8, 128) vector lanes, wasting ~64x bandwidth and making a 512x512 IoU
matrix cost ~180 ms. Here every candidate coordinate is its own ``(...,)``
array (the *pair batch* is the trailing, lane-tiled dimension) and the
24-candidate angle ordering is a fixed Batcher odd-even merge-sort network
of elementwise compare-selects — no gathers, no argsort, everything fuses
into one VPU-friendly elementwise program. Same math and gradients as the
AoS version (validated against it in tests), ~100x faster on TPU.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["rbox_iou", "rbox_iou_matrix", "intersect_area"]

_NCAND = 24
_NSORT = 32  # power-of-two base size for the Batcher network


def _batcher_pairs(n):
    """Comparator index pairs of Batcher's odd-even mergesort (n = 2^k)."""
    pairs = []

    def merge(lo, hi, r):
        step = r * 2
        if step < hi - lo:
            merge(lo, hi, step)
            merge(lo + r, hi, step)
            for i in range(lo + r, hi - r, step):
                pairs.append((i, i + r))
        else:
            pairs.append((lo, lo + r))

    def sort(lo, hi):
        if hi - lo >= 2:
            mid = lo + (hi - lo) // 2
            sort(lo, mid)
            sort(mid, hi)
            merge(lo, hi, 1)

    sort(0, n)
    return pairs


# Prune the 32-wide network down to the 24 real slots: every comparator is
# ascending (min to the lower index), so the 8 +inf-keyed padding slots can
# never hand their key down — comparators touching an index >= 24 are no-ops
# and the padding slots need not exist at all (191 -> 132 comparators;
# exhaustively validated against sorted() in tests).
_PAIRS24 = [(i, j) for (i, j) in _batcher_pairs(_NSORT) if j < _NCAND]

# invalid/padding sort key: the diamond angle below lies in (-2, 2]
_BIGKEY = 5.0
_KEYCUT = 4.0


def _diamond_angle(dx, dy):
    """Monotone surrogate of atan2(dy, dx) on (-pi, pi] -> (-2, 2].

    The candidate ordering only needs a consistent angular ORDER around the
    centroid, not the angle itself; this costs ~6 VPU ops instead of a
    transcendental. dx = dy = 0 maps to 0 (degenerate single-vertex case,
    area is 0 regardless of order)."""
    # literals pinned to the operand dtype: a weak python float promotes
    # through an f64 convert under jax_enable_x64, which Mosaic cannot
    # lower when this runs inside the Pallas tile kernel (the convert
    # only materializes under jax.export's re-trace)
    one = jnp.asarray(1.0, dx.dtype)
    two = jnp.asarray(2.0, dx.dtype)
    s = jnp.abs(dx) + jnp.abs(dy)
    t = dy / jnp.where(s > 0, s, one)
    return jnp.where(dx >= 0, t, jnp.where(dy >= 0, two - t, -two - t))


def _corners(x, y, w, h, r):
    """4 CCW corners as lists of coordinate arrays."""
    dx, dy = w * 0.5, h * 0.5
    # precise sincos not needed here: this path is f32 throughput-oriented;
    # the f64 `precise` path goes through d3d_tpu.ops.geometry
    c, s = jnp.cos(r), jnp.sin(r)
    lx = (-dx, dx, dx, -dx)
    ly = (-dy, -dy, dy, dy)
    cx = [c * a - s * b + x for a, b in zip(lx, ly)]
    cy = [s * a + c * b + y for a, b in zip(lx, ly)]
    return cx, cy


def _inside(qx, qy, px, py, eps):
    """Point (px, py) inside CCW quad (lists of 4 coord arrays)."""
    ok = None
    for i in range(4):
        j = (i + 1) % 4
        ex, ey = qx[j] - qx[i], qy[j] - qy[i]
        side = ex * (py - qy[i]) - ey * (px - qx[i])
        c = side >= -eps
        ok = c if ok is None else (ok & c)
    return ok


def intersect_area(b1, b2):
    """Intersection area of rotated boxes; ``b1``/``b2`` are ``(..., 5)``
    broadcastable xywhr arrays; returns ``(...)``."""
    x1, y1, w1, h1, r1 = (b1[..., i] for i in range(5))
    x2, y2, w2, h2, r2 = (b2[..., i] for i in range(5))
    shape = jnp.broadcast_shapes(x1.shape, x2.shape)
    dt = jnp.result_type(b1.dtype, b2.dtype)

    ax, ay = _corners(x1, y1, w1, h1, r1)
    bx, by = _corners(x2, y2, w2, h2, r2)

    # relative containment tolerance (see geometry.quad_intersection)
    scale = None
    for arr in ax + ay + bx + by:
        a = jnp.abs(arr)
        scale = a if scale is None else jnp.maximum(scale, a)
    ceps = (scale + 1.0) * (1e-9 if dt == jnp.float64 else 1e-5)

    px, py, valid = [], [], []

    # --- 16 edge-edge crossings -------------------------------------------
    for i in range(4):
        i2 = (i + 1) % 4
        rx, ry = ax[i2] - ax[i], ay[i2] - ay[i]
        for j in range(4):
            j2 = (j + 1) % 4
            sx, sy = bx[j2] - bx[j], by[j2] - by[j]
            denom = rx * sy - ry * sx
            # relative parallelism cutoff (|r x s| = |r||s| sin angle);
            # the old absolute 1e-14 exploded f32 gradients through
            # t = cross/denom on near-parallel edges (see geometry.py)
            par_eps = 1e-12 if denom.dtype == jnp.float64 else 1e-4
            rs = jnp.sqrt(jnp.maximum(
                (rx * rx + ry * ry) * (sx * sx + sy * sy), 1e-30))
            ok = jnp.abs(denom) > par_eps * rs
            dsafe = jnp.where(ok, denom, 1.0)
            acx, acy = bx[j] - ax[i], by[j] - ay[i]
            t = jnp.where(ok, (acx * sy - acy * sx) / dsafe, -1.0)
            u = jnp.where(ok, (acx * ry - acy * rx) / dsafe, -1.0)
            hit = ok & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
            px.append(jnp.where(hit, ax[i] + t * rx, 0.0))
            py.append(jnp.where(hit, ay[i] + t * ry, 0.0))
            valid.append(hit)

    # --- corners of each quad inside the other -----------------------------
    for i in range(4):
        ins = _inside(bx, by, ax[i], ay[i], ceps)
        px.append(jnp.where(ins, ax[i], 0.0))
        py.append(jnp.where(ins, ay[i], 0.0))
        valid.append(ins)
    for j in range(4):
        ins = _inside(ax, ay, bx[j], by[j], ceps)
        px.append(jnp.where(ins, bx[j], 0.0))
        py.append(jnp.where(ins, by[j], 0.0))
        valid.append(ins)

    # --- order by angle around the centroid via a sorting network ----------
    vf = [v.astype(dt) for v in valid]
    cnt = sum(vf)
    cnt_safe = jnp.maximum(cnt, 1.0)
    cx = sum(x * v for x, v in zip(px, vf)) / cnt_safe
    cy = sum(y * v for y, v in zip(py, vf)) / cnt_safe

    # validity rides in the key (invalid -> _BIGKEY, recovered after the
    # sort as key < _KEYCUT), so the network carries 3 values per slot,
    # not 4; keys swap via min/max.
    big = jnp.asarray(_BIGKEY, dt)
    keys, sx_, sy_ = [], [], []
    for k in range(_NCAND):
        ang = _diamond_angle(lax.stop_gradient(px[k] - cx),
                             lax.stop_gradient(py[k] - cy))
        keys.append(jnp.where(valid[k], ang, big))
        sx_.append(px[k])
        sy_.append(py[k])

    for i, j in _PAIRS24:
        swap = keys[i] > keys[j]
        keys[i], keys[j] = (jnp.minimum(keys[i], keys[j]),
                            jnp.maximum(keys[i], keys[j]))
        sx_[i], sx_[j] = (jnp.where(swap, sx_[j], sx_[i]),
                          jnp.where(swap, sx_[i], sx_[j]))
        sy_[i], sy_[j] = (jnp.where(swap, sy_[j], sy_[i]),
                          jnp.where(swap, sy_[i], sy_[j]))

    # invalid slots collapse onto the first (valid) vertex so the cyclic
    # shoelace is exact (zero-length edges)
    fx, fy = sx_[0], sy_[0]
    for k in range(_NCAND):
        ok = keys[k] < _KEYCUT
        sx_[k] = jnp.where(ok, sx_[k], fx) - lax.stop_gradient(cx)
        sy_[k] = jnp.where(ok, sy_[k], fy) - lax.stop_gradient(cy)

    area = jnp.zeros(shape, dt)
    for k in range(_NCAND):
        k2 = (k + 1) % _NCAND
        area = area + (sx_[k] * sy_[k2] - sy_[k] * sx_[k2])
    return jnp.maximum(0.5 * area, 0.0)


@jax.jit
def rbox_iou(b1, b2):
    """Rotated-box IoU, elementwise over broadcast batch dims — the TPU
    throughput path used by NMS, matchers and the IoU losses."""
    inter = intersect_area(b1, b2)
    a1 = b1[..., 2] * b1[..., 3]
    a2 = b2[..., 2] * b2[..., 3]
    union = jnp.maximum(a1 + a2 - inter, 1e-12)
    return inter / union


def rbox_iou_matrix(b1, b2, pair_budget=1 << 22):
    """(N, M) rotated-IoU matrix; dispatches to the Pallas tile kernel on
    TPU (f32, forward-only — NMS and matching never differentiate through
    the matrix) and to the blocked XLA kernel elsewhere / for f64."""
    if (jax.default_backend() == "tpu"
            and jnp.result_type(b1.dtype, b2.dtype) == jnp.float32):
        from . import geometry_pallas
        return geometry_pallas.rbox_iou_matrix(b1, b2)
    return _rbox_iou_matrix_xla(b1, b2, pair_budget=pair_budget)


@partial(jax.jit, static_argnames=("pair_budget",))
def _rbox_iou_matrix_xla(b1, b2, pair_budget=1 << 22):
    """(N, 5) x (M, 5) -> (N, M) IoU matrix with bounded peak memory.

    The elementwise kernel keeps ~128 live pair-shaped temporaries, so an
    unblocked 8k x 8k call needs ~32 GB of HLO temps; rows are processed in
    chunks of ``pair_budget / M`` pairs via ``lax.map`` instead."""
    n, m = b1.shape[0], b2.shape[0]
    rows = max(1, pair_budget // max(m, 1))
    if n <= rows:
        return rbox_iou(b1[:, None, :], b2[None, :, :])
    nblocks = -(-n // rows)
    pad = nblocks * rows - n
    b1p = jnp.concatenate([b1, jnp.ones((pad, 5), b1.dtype)], axis=0)
    blocks = b1p.reshape(nblocks, rows, 5)
    out = lax.map(lambda blk: rbox_iou(blk[:, None, :], b2[None, :, :]),
                  blocks)
    return out.reshape(-1, m)[:n]
