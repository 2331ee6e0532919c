"""Pallas TPU kernel for the rotated-box IoU matrix.

The XLA SoA kernel (:mod:`d3d_tpu.ops.geometry_soa`) is a ~1300-op
elementwise chain over the flattened pair batch; XLA splits it into several
fusions whose pair-shaped intermediates (tens of MB for a 512x512 matrix)
round-trip through HBM between fusions. Here the pair batch is tiled into
``(block_n, block_m)`` output blocks and the WHOLE chain — corner loads,
16 edge crossings, 8 containment tests, the 132-comparator pruned Batcher
sort, shoelace — runs on one VMEM-resident tile, so the only HBM traffic is
the box descriptors in and the IoU tile out.

Same math as ``geometry_soa.intersect_area`` (same candidates, tolerances,
diamond-angle keys and sort network), so the two paths agree to f32
rounding; parity is asserted in tests. Forward-only (NMS / matching); the
differentiable losses keep the XLA path, which autodiff handles.

Replaces the one-thread-per-pair CUDA evaluation the reference uses for
box_2d_iou (d3d/box/geometry.cu via d3d/box/utils.py:balanced grid) with a
lane-tiled formulation; TPU has no per-thread scatter/branching, so the
branch-free candidate enumeration + sorting network runs on (8, 128) VPU
registers instead.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .geometry_soa import _PAIRS24, _BIGKEY, _KEYCUT, _diamond_angle

__all__ = ["rbox_iou_matrix", "box_descriptors"]

_BLOCK_N = 8
_BLOCK_M = 128


def box_descriptors(boxes):
    """(K, 5) xywhr -> (K, 10) [x0..x3, y0..y3, area, |corner| scale]."""
    x, y, w, h, r = (boxes[..., i] for i in range(5))
    dx, dy = w * 0.5, h * 0.5
    c, s = jnp.cos(r), jnp.sin(r)
    lx = (-dx, dx, dx, -dx)
    ly = (-dy, -dy, dy, dy)
    cx = [c * a - s * b + x for a, b in zip(lx, ly)]
    cy = [s * a + c * b + y for a, b in zip(lx, ly)]
    scale = jnp.zeros_like(x)
    for arr in cx + cy:
        scale = jnp.maximum(scale, jnp.abs(arr))
    return jnp.stack(cx + cy + [w * h, scale], axis=-1)


def _iou_tile_kernel(a_ref, b_ref, o_ref):
    """One (block_n, block_m) IoU tile; a_ref (bn, 10), b_ref (10, bm)."""
    ax = [a_ref[:, k:k + 1] for k in range(4)]      # (bn, 1)
    ay = [a_ref[:, 4 + k:5 + k] for k in range(4)]
    bx = [b_ref[k:k + 1, :] for k in range(4)]      # (1, bm)
    by = [b_ref[4 + k:5 + k, :] for k in range(4)]
    area_a, scale_a = a_ref[:, 8:9], a_ref[:, 9:10]
    area_b, scale_b = b_ref[8:9, :], b_ref[9:10, :]

    # every scalar literal is pinned f32: under jax_enable_x64 a weak
    # python float can promote through an f64 convert_element_type, which
    # has no Mosaic lowering (jax.export's re-trace materializes exactly
    # that convert; plain jit constant-folds it)
    f32 = jnp.float32
    zero, one, neg1 = f32(0.0), f32(1.0), f32(-1.0)

    ceps = (jnp.maximum(scale_a, scale_b) + one) * f32(1e-5)

    px, py, valid = [], [], []

    # 16 edge-edge crossings (see geometry_soa.intersect_area)
    for i in range(4):
        i2 = (i + 1) % 4
        rx, ry = ax[i2] - ax[i], ay[i2] - ay[i]
        for j in range(4):
            j2 = (j + 1) % 4
            sx, sy = bx[j2] - bx[j], by[j2] - by[j]
            denom = rx * sy - ry * sx
            # relative parallelism cutoff, mirroring geometry_soa (the
            # kernel runs f32: an absolute 1e-14 admits rounding noise)
            rs = jnp.sqrt(jnp.maximum(
                (rx * rx + ry * ry) * (sx * sx + sy * sy), f32(1e-30)))
            ok = jnp.abs(denom) > f32(1e-4) * rs
            dsafe = jnp.where(ok, denom, one)
            acx, acy = bx[j] - ax[i], by[j] - ay[i]
            t = jnp.where(ok, (acx * sy - acy * sx) / dsafe, neg1)
            u = jnp.where(ok, (acx * ry - acy * rx) / dsafe, neg1)
            hit = ok & (t >= zero) & (t <= one) & (u >= zero) & (u <= one)
            px.append(jnp.where(hit, ax[i] + t * rx, zero))
            py.append(jnp.where(hit, ay[i] + t * ry, zero))
            valid.append(hit)

    # corners of each box inside the other
    def inside(qx, qy, ptx, pty):
        ok = None
        for i in range(4):
            j = (i + 1) % 4
            ex, ey = qx[j] - qx[i], qy[j] - qy[i]
            side = ex * (pty - qy[i]) - ey * (ptx - qx[i])
            c = side >= -ceps
            ok = c if ok is None else (ok & c)
        return ok

    for i in range(4):
        ins = inside(bx, by, ax[i], ay[i])
        px.append(jnp.where(ins, ax[i], zero))
        py.append(jnp.where(ins, ay[i], zero))
        valid.append(ins)
    for j in range(4):
        ins = inside(ax, ay, bx[j], by[j])
        px.append(jnp.where(ins, bx[j], zero))
        py.append(jnp.where(ins, by[j], zero))
        valid.append(ins)

    vf = [v.astype(jnp.float32) for v in valid]
    cnt_safe = jnp.maximum(sum(vf), one)
    cx = sum(x * v for x, v in zip(px, vf)) / cnt_safe
    cy = sum(y * v for y, v in zip(py, vf)) / cnt_safe

    keys, sx_, sy_ = [], [], []
    bigkey = f32(_BIGKEY)
    for k in range(24):
        ang = _diamond_angle(px[k] - cx, py[k] - cy)
        keys.append(jnp.where(valid[k], ang, bigkey))
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

    fx, fy = sx_[0], sy_[0]
    keycut = f32(_KEYCUT)
    for k in range(24):
        ok = keys[k] < keycut
        sx_[k] = jnp.where(ok, sx_[k], fx) - cx
        sy_[k] = jnp.where(ok, sy_[k], fy) - cy

    area2 = sx_[23] * sy_[0] - sy_[23] * sx_[0]
    for k in range(23):
        area2 = area2 + (sx_[k] * sy_[k + 1] - sy_[k] * sx_[k + 1])
    inter = jnp.maximum(f32(0.5) * area2, zero)

    union = jnp.maximum(area_a + area_b - inter, f32(1e-12))
    o_ref[:, :] = inter / union


@partial(jax.jit, static_argnames=("interpret",))
def rbox_iou_matrix(b1, b2, interpret=False):
    """(N, 5) x (M, 5) xywhr -> (N, M) f32 IoU via the Pallas tile kernel.

    Forward-only. Pads N/M up to the (8, 128) tile grid with unit boxes at
    the origin and slices the result back.
    """
    b1 = b1.astype(jnp.float32)
    b2 = b2.astype(jnp.float32)
    n, m = b1.shape[0], b2.shape[0]
    npad = -n % _BLOCK_N
    mpad = -m % _BLOCK_M
    pad_box = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 0.0]], jnp.float32)
    if npad:
        b1 = jnp.concatenate([b1, jnp.tile(pad_box, (npad, 1))], axis=0)
    if mpad:
        b2 = jnp.concatenate([b2, jnp.tile(pad_box, (mpad, 1))], axis=0)

    da = box_descriptors(b1)                      # (N', 10)
    db = box_descriptors(b2).T                    # (10, M')
    grid = (da.shape[0] // _BLOCK_N, db.shape[1] // _BLOCK_M)

    out = pl.pallas_call(
        _iou_tile_kernel,
        grid=grid,
        in_specs=[
            # the literal 0 must be i32: the package enables jax_enable_x64,
            # and Mosaic cannot return an i64 from an index map
            pl.BlockSpec((_BLOCK_N, 10), lambda i, j: (i, jnp.int32(0))),
            pl.BlockSpec((10, _BLOCK_M), lambda i, j: (jnp.int32(0), j)),
        ],
        out_specs=pl.BlockSpec((_BLOCK_N, _BLOCK_M), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((da.shape[0], db.shape[1]),
                                       jnp.float32),
        interpret=interpret,
    )(da, db)
    return out[:n, :m]
