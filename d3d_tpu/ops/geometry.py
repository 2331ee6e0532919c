"""Vectorized rotated-box geometry core (TPU-native replacement for the
reference's `dgal` header library; interface reconstructed in SURVEY.md §2.2.1
from /root/reference/d3d/dgal_wrap.h and d3d/box/*.cpp call sites).

The reference computes polygon intersections with a scalar Sutherland-Hodgman
clip per box pair, one CUDA thread per pair, with per-vertex provenance flags
saved for an exact hand-written backward (d3d/box/iou.cpp:99-141).  On TPU we
instead use a fully data-parallel formulation with *fixed shapes*:

  * the intersection of two convex quads has at most 8 vertices, and every
    vertex is either (a) one of the 16 edge-pair crossing points or (b) one of
    the 8 original corners lying inside the other quad;
  * we therefore materialize all 24 candidates with a validity mask, order the
    valid ones by angle around their centroid (intersection of convex sets is
    convex, so the angular order is the boundary order), and evaluate the
    shoelace formula on the masked, sorted buffer.

This is branch-free, vmap/jit friendly, and exactly differentiable through
JAX autodiff (the sort indices are piecewise constant; gradients flow through
the gathered coordinates), which replaces the reference's nx/xflags
forward-to-backward metadata trick.

All functions take boxes as ``(..., 5)`` arrays ``[x, y, w, h, r]`` and
broadcast over leading dimensions.  Everything here is dtype-polymorphic;
the public API in :mod:`d3d_tpu.ops.box` handles the ``precise`` fp64 upcast.
"""

import jax
import jax.numpy as jnp
from jax import lax

from . import trig

__all__ = [
    "box2poly",
    "poly_area",
    "quad_intersection",
    "intersect_area",
    "convex_hull_area",
    "aabox_iou",
    "rbox_iou",
    "rbox_giou",
    "rbox_diou",
    "poly_contains",
    "poly_signed_distance",
    "seg1d_intersection",
    "box3dr_iou_pair",
    "box3d_iou_pair",
]

# Maximum vertices of the intersection polygon of two convex quads.
# Candidate count: 16 edge crossings + 4 + 4 contained corners.


def _cross2(a, b):
    """2D cross product z-component: a.x*b.y - a.y*b.x (last dim = 2)."""
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]




def box2poly(boxes):
    """``(..., 5)`` xywhr boxes -> ``(..., 4, 2)`` CCW corner polygons.

    Corner order matches a CCW traversal starting at (-w/2, -h/2) in the
    box frame (the reference's dgal ``poly2_from_xywhr``; the exact starting
    corner only matters for vertex provenance, not for any metric).
    """
    x, y, w, h, r = (boxes[..., i] for i in range(5))
    dx, dy = w * 0.5, h * 0.5
    # CCW in local frame
    lx = jnp.stack([-dx, dx, dx, -dx], axis=-1)
    ly = jnp.stack([-dy, -dy, dy, dy], axis=-1)
    s, c = trig.sincos(r)
    s, c = s[..., None], c[..., None]
    px = c * lx - s * ly + x[..., None]
    py = s * lx + c * ly + y[..., None]
    return jnp.stack([px, py], axis=-1)


def poly_area(verts):
    """Shoelace area of CCW polygons ``(..., K, 2)`` (signed; CCW positive)."""
    nxt = jnp.roll(verts, -1, axis=-2)
    return 0.5 * jnp.sum(_cross2(verts, nxt), axis=-1)


def _edge_pairs(poly):
    """(..., 4, 2) -> start (..., 4, 2), end (..., 4, 2) of each edge."""
    return poly, jnp.roll(poly, -1, axis=-2)


@jax.jit
def poly_contains(poly, points, eps=0.0):
    """Test points inside CCW convex polygons.

    :param poly: ``(..., K, 2)`` convex CCW polygons
    :param points: ``(..., 2)`` query points (broadcast against poly batch)
    :return: boolean ``(...)``
    """
    a, b = _edge_pairs(poly)
    # cross(edge, p - a) >= 0 for all edges
    side = _cross2(b - a, points[..., None, :] - a)
    return jnp.all(side >= -eps, axis=-1)


def quad_intersection(poly1, poly2):
    """All candidate vertices of the intersection of two convex CCW quads.

    :param poly1: ``(..., 4, 2)``
    :param poly2: ``(..., 4, 2)``
    :return: ``(pts, mask)`` with ``pts (..., 24, 2)`` and ``mask (..., 24)``.
        Valid points are the vertices of the (convex) intersection polygon,
        possibly with duplicates at touching configurations.
    """
    batch = jnp.broadcast_shapes(poly1.shape[:-2], poly2.shape[:-2])
    poly1 = jnp.broadcast_to(poly1, batch + poly1.shape[-2:])
    poly2 = jnp.broadcast_to(poly2, batch + poly2.shape[-2:])
    a, b = _edge_pairs(poly1)  # (...,4,2)
    c, d = _edge_pairs(poly2)

    # --- 16 edge-edge crossings ------------------------------------------
    # broadcast: edges of poly1 along axis -3, edges of poly2 along axis -2
    a_ = a[..., :, None, :]
    b_ = b[..., :, None, :]
    c_ = c[..., None, :, :]
    d_ = d[..., None, :, :]
    r = b_ - a_
    s = d_ - c_
    denom = _cross2(r, s)  # (...,4,4)
    ac = c_ - a_
    # Parallel edges never produce an interior crossing vertex we need:
    # overlap endpoints are covered by the corner-containment candidates.
    # RELATIVE parallelism cutoff: |r x s| = |r||s| sin(angle), so compare
    # against |r||s|. A dtype-blind absolute 1e-14 let f32 rounding-noise
    # denominators through, exploding the t = cross/denom autodiff gradient
    # to ~1e9 on near-identical boxes (measured; round-2 review finding).
    par_eps = 1e-12 if denom.dtype == jnp.float64 else 1e-4
    rs_scale = jnp.sqrt(jnp.maximum(
        jnp.sum(r * r, -1) * jnp.sum(s * s, -1), 1e-30))
    ok = jnp.abs(denom) > par_eps * rs_scale
    denom_safe = jnp.where(ok, denom, 1.0)
    t = jnp.where(ok, _cross2(ac, s) / denom_safe, -1.0)
    u = jnp.where(ok, _cross2(ac, r) / denom_safe, -1.0)
    hit = ok & (t >= 0.0) & (t <= 1.0) & (u >= 0.0) & (u <= 1.0)
    xpt = a_ + t[..., None] * r  # (...,4,4,2)
    batch = xpt.shape[:-3]
    xpt = xpt.reshape(batch + (16, 2))
    hit = hit.reshape(batch + (16,))

    # --- corners of each quad inside the other ----------------------------
    # Relative tolerance: identical/touching boxes put corners exactly on the
    # other quad's boundary, where an exact >=0 side test flips on rounding
    # (this is why the reference needs fp64, README.md:31). Admitting points
    # within ~eps*scale of the boundary changes the area by O(eps); eps is
    # dtype-aware — 1e-9 is far below f32 resolution and silently dropped
    # boundary corners for near-identical f32 boxes (IoU ~1.0 reported as
    # ~0.33; measured, round-2 review finding — geometry_soa always had the
    # dtype-aware form).
    scale = jnp.max(
        jnp.abs(jnp.concatenate([poly1, poly2], axis=-2)), axis=(-1, -2)
    )
    eps = 1e-9 if poly1.dtype == jnp.float64 else 1e-5
    ceps = ((scale + 1.0) * eps)[..., None, None]
    in12 = poly_contains(poly2[..., None, :, :], poly1, ceps)  # poly1 verts in poly2
    in21 = poly_contains(poly1[..., None, :, :], poly2, ceps)

    pts = jnp.concatenate([xpt, poly1, poly2], axis=-2)  # (...,24,2)
    mask = jnp.concatenate([hit, in12, in21], axis=-1)
    pts = jnp.where(mask[..., None], pts, 0.0)
    return pts, mask


def _order_by_angle(pts, mask):
    """Sort masked points CCW by angle around their centroid.

    Returns points reordered so the valid ones come first in boundary order,
    with every invalid slot replaced by the first valid point (making a
    subsequent shoelace over the full buffer exact).
    """
    n = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1)
    center = jnp.sum(pts * mask[..., None], axis=-2, keepdims=True) / n[..., None]
    rel = pts - center
    # sort keys never need gradients
    rel_ng = lax.stop_gradient(rel)
    ang = jnp.arctan2(rel_ng[..., 1], rel_ng[..., 0])
    big = jnp.asarray(jnp.finfo(ang.dtype).max, ang.dtype)
    key = jnp.where(mask, ang, big)
    order = jnp.argsort(key, axis=-1)
    pts_s = jnp.take_along_axis(pts, order[..., None], axis=-2)
    mask_s = jnp.take_along_axis(mask, order, axis=-1)
    first = pts_s[..., 0:1, :]
    pts_s = jnp.where(mask_s[..., None], pts_s, first)
    return pts_s, mask_s


@jax.jit
def intersect_area(poly1, poly2):
    """Intersection area of two convex CCW quads, batched. (..., 4, 2) x2 -> (...)."""
    pts, mask = quad_intersection(poly1, poly2)
    pts, mask = _order_by_angle(pts, mask)
    # recenter for numerical stability (area is translation invariant)
    n = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1)
    c = jnp.sum(pts * mask[..., None], axis=-2, keepdims=True) / n[..., None]
    area = poly_area(pts - lax.stop_gradient(c))
    return jnp.maximum(area, 0.0)


@jax.jit
def convex_hull_area(points):
    """Area of the convex hull of ``(..., N, 2)`` point sets (N static, small).

    Batched Andrew monotone chain with a fixed-size stack; the inner
    pop-loop is unrolled to N steps, so everything is branch-free vector
    code (the per-pair point count is tiny: N=8 for GIoU hulls).
    """
    n = points.shape[-2]
    batch = points.shape[:-2]
    dt = points.dtype

    # lexicographic sort by (x, y); indices carry no gradient
    keys = lax.stop_gradient(points)
    # two-pass stable sort == lexsort by primary x, secondary y
    order_y = jnp.argsort(keys[..., 1], axis=-1, stable=True)
    x_by_y = jnp.take_along_axis(keys[..., 0], order_y, axis=-1)
    order_x = jnp.argsort(x_by_y, axis=-1, stable=True)
    order = jnp.take_along_axis(order_y, order_x, axis=-1)
    p = jnp.take_along_axis(points, order[..., None], axis=-2)  # sorted

    def half_hull(pts):
        """One monotone chain (lower hull of pts in sorted order)."""
        stack = jnp.zeros(batch + (n, 2), dt)
        size = jnp.zeros(batch, jnp.int32)
        slot = jnp.arange(n)

        def push_point(t, carry):
            stack, size = carry
            pt = lax.dynamic_index_in_dim(pts, t, axis=-2, keepdims=False)

            def pop_once(_, carry2):
                stack, size = carry2
                top = jnp.take_along_axis(
                    stack, jnp.maximum(size - 1, 0)[..., None, None], axis=-2
                )[..., 0, :]
                sec = jnp.take_along_axis(
                    stack, jnp.maximum(size - 2, 0)[..., None, None], axis=-2
                )[..., 0, :]
                bad = (size >= 2) & (_cross2(top - sec, pt - sec) <= 0)
                size = jnp.where(bad, size - 1, size)
                return stack, size

            stack, size = lax.fori_loop(0, n, pop_once, (stack, size))
            onehot = (slot == size[..., None])[..., None]
            stack = jnp.where(onehot, pt[..., None, :], stack)
            size = size + 1
            return stack, size

        stack, size = lax.fori_loop(0, n, push_point, (stack, size))
        # area contribution of the chain: sum of cross(v_i, v_{i+1}) over
        # consecutive stack entries (invalid tail slots repeat last point).
        last = jnp.take_along_axis(stack, (size - 1)[..., None, None], axis=-2)
        valid = slot < size[..., None]
        v = jnp.where(valid[..., None], stack, last)
        nxt = jnp.concatenate([v[..., 1:, :], last], axis=-2)
        return jnp.sum(_cross2(v, nxt), axis=-1), v[..., 0, :], last[..., 0, :]

    lo_sum, lo_first, lo_last = half_hull(p)
    hi_sum, hi_first, hi_last = half_hull(p[..., ::-1, :])
    # close the polygon: lower chain runs first->last (leftmost->rightmost),
    # upper chain runs rightmost->leftmost; the two joining edges.
    join = _cross2(lo_last, hi_first) + _cross2(hi_last, lo_first)
    area = 0.5 * (lo_sum + hi_sum + join)
    return jnp.maximum(area, 0.0)


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------

def _union(area1, area2, inter, eps=1e-12):
    u = area1 + area2 - inter
    return jnp.maximum(u, eps)


@jax.jit
def aabox_iou(boxes1, boxes2):
    """Axis-aligned IoU: boxes are replaced by the AABB of their rotated
    corners (reference ``iou(aabox2_from_poly2(..), ..)``, d3d/box/iou.cpp:30).
    Elementwise with broadcasting over leading dims."""
    p1 = box2poly(boxes1)
    p2 = box2poly(boxes2)
    lo1, hi1 = jnp.min(p1, axis=-2), jnp.max(p1, axis=-2)
    lo2, hi2 = jnp.min(p2, axis=-2), jnp.max(p2, axis=-2)
    ilo = jnp.maximum(lo1, lo2)
    ihi = jnp.minimum(hi1, hi2)
    iwh = jnp.maximum(ihi - ilo, 0.0)
    inter = iwh[..., 0] * iwh[..., 1]
    a1 = jnp.prod(hi1 - lo1, axis=-1)
    a2 = jnp.prod(hi2 - lo2, axis=-1)
    return inter / _union(a1, a2, inter)


@jax.jit
def rbox_iou(boxes1, boxes2):
    """Rotated-box IoU, elementwise with broadcasting over leading dims."""
    p1 = box2poly(boxes1)
    p2 = box2poly(boxes2)
    inter = intersect_area(p1, p2)
    a1 = boxes1[..., 2] * boxes1[..., 3]
    a2 = boxes2[..., 2] * boxes2[..., 3]
    return inter / _union(a1, a2, inter)


def _broadcast_polys(p1, p2):
    batch = jnp.broadcast_shapes(p1.shape[:-2], p2.shape[:-2])
    return (
        jnp.broadcast_to(p1, batch + p1.shape[-2:]),
        jnp.broadcast_to(p2, batch + p2.shape[-2:]),
    )


@jax.jit
def rbox_giou(boxes1, boxes2):
    """Rotated-box GIoU: ``iou - (hull - union) / hull`` with the enclosing
    convex hull of both quads (Rezatofighi et al. 2019; the reference's dgal
    ``giou`` merges the convex hulls, d3d/box/iou.cpp:225)."""
    p1, p2 = _broadcast_polys(box2poly(boxes1), box2poly(boxes2))
    inter = intersect_area(p1, p2)
    a1 = boxes1[..., 2] * boxes1[..., 3]
    a2 = boxes2[..., 2] * boxes2[..., 3]
    union = _union(a1, a2, inter)
    hull = jnp.maximum(convex_hull_area(jnp.concatenate([p1, p2], axis=-2)), union)
    return inter / union - (hull - union) / hull


@jax.jit
def rbox_diou(boxes1, boxes2):
    """Rotated-box DIoU: ``iou - d^2/c^2`` with d the center distance and c
    the diagonal of the axis-aligned box enclosing both quads (Zheng et al.
    2020; dgal's source is absent so the standard enclosing-box definition is
    used — reference interface at d3d/box/iou.cpp:334)."""
    iou = rbox_iou(boxes1, boxes2)
    d2 = jnp.sum((boxes1[..., 0:2] - boxes2[..., 0:2]) ** 2, axis=-1)
    p = jnp.concatenate(_broadcast_polys(box2poly(boxes1), box2poly(boxes2)), axis=-2)
    lo, hi = jnp.min(p, axis=-2), jnp.max(p, axis=-2)
    c2 = jnp.maximum(jnp.sum((hi - lo) ** 2, axis=-1), 1e-12)
    return iou - d2 / c2


@jax.jit
def poly_signed_distance(poly, points):
    """Signed distance from points to convex CCW polygon boundary.

    Positive inside, negative outside (reference ``dgal::distance``, sign
    convention per d3d/dgal_wrap.h:21-42). Gradient flows through the
    nearest edge only (autodiff through the min), matching the reference's
    ``iedge`` backward replay (d3d/box/dist.cpp:31,75).

    :param poly: ``(..., K, 2)``
    :param points: ``(..., 2)`` broadcastable
    """
    a, b = _edge_pairs(poly)
    p = points[..., None, :]
    ab = b - a
    ap = p - a
    len2 = jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-30)
    t = jnp.clip(jnp.sum(ap * ab, axis=-1) / len2, 0.0, 1.0)
    proj = a + t[..., None] * ab
    d = jnp.linalg.norm(p - proj, axis=-1)
    dmin = jnp.min(d, axis=-1)
    inside = jnp.all(_cross2(ab, ap) >= 0, axis=-1)
    return jnp.where(inside, dmin, -dmin)


def seg1d_intersection(c1, w1, c2, w2, eps=1e-6):
    """1D segment intersection / union lengths for (center, width) segments.

    Returns ``(i, u)`` with i clamped at 0 and u clamped at ``eps``
    (reference d3d/dgal_wrap.h:52-63)."""
    s1max, s1min = c1 + w1 * 0.5, c1 - w1 * 0.5
    s2max, s2min = c2 + w2 * 0.5, c2 - w2 * 0.5
    i = jnp.maximum(jnp.minimum(s1max, s2max) - jnp.maximum(s1min, s2min), 0.0)
    u = jnp.maximum(jnp.maximum(s1max, s2max) - jnp.minimum(s1min, s2min), eps)
    return i, u


@jax.jit
def box3dr_iou_pair(b1, b2):
    """Rotated 3D box IoU = BEV polygon IoU x z-interval IoU.

    Boxes are ``(..., 7)`` ``[x, y, z, lx, ly, lz, rz]`` (the layout the
    matchers consume, reference d3d/dgal_wrap.h:44-71)."""
    from . import geometry_soa as _soa

    bev1 = jnp.concatenate([b1[..., 0:2], b1[..., 3:5], b1[..., 6:7]], axis=-1)
    bev2 = jnp.concatenate([b2[..., 0:2], b2[..., 3:5], b2[..., 6:7]], axis=-1)
    iou2d = _soa.rbox_iou(bev1, bev2)  # SoA kernel (TPU-lane friendly)
    zi, zu = seg1d_intersection(b1[..., 2], b1[..., 5], b2[..., 2], b2[..., 5])
    return iou2d * (zi / zu)


@jax.jit
def box3d_iou_pair(b1, b2):
    """Axis-aligned 3D box IoU (AABB of rotated BEV footprint x z interval,
    reference d3d/dgal_wrap.h:73-91)."""
    bev1 = jnp.concatenate([b1[..., 0:2], b1[..., 3:5], b1[..., 6:7]], axis=-1)
    bev2 = jnp.concatenate([b2[..., 0:2], b2[..., 3:5], b2[..., 6:7]], axis=-1)
    iou2d = aabox_iou(bev1, bev2)
    zi, zu = seg1d_intersection(b1[..., 2], b1[..., 5], b2[..., 2], b2[..., 5])
    return iou2d * (zi / zu)
