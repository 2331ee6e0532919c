"""Pallas TPU kernel for the greedy NMS suppression cascade.

The scan is serial per box (box i's aliveness depends on every earlier
decision), so as an XLA ``fori_loop`` each of the N steps pays a loop-body
dispatch (~0.7 us -> ~0.37 ms at N=512). Here the serial steps are the
kernel GRID: step i DMAs overlap row i into VMEM while the running
suppression mask lives in a VMEM scratch across steps, so each step is a
handful of VPU register ops and the row loads pipeline with compute.

Mirrors the mask semantics of the reference's serial collect
(d3d/box/nms_cuda.cu:83-106) and the XLA fallback in d3d_tpu.ops.nms —
parity is asserted in tests.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["nms_scan", "nms_scan_blocked", "soft_nms_scan"]


def _nms_scan_kernel(ov_blk_ref, pre_ref, o_ref, sup_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        sup_ref[:, :] = pre_ref[:, :]

    iota = lax.broadcasted_iota(jnp.int32, (1, ov_blk_ref.shape[1]), 1)
    sup = sup_ref[:, :]
    # 8 serial box steps per grid step (TPU blocks tile in sublanes of 8)
    for r in range(8):
        i = b * 8 + r
        # sup[0, i] == 0 via a masked reduce (no scalar vector indexing);
        # every scalar is pinned to i32 — under jax_enable_x64 a bare `0`
        # traces as i64 and the i64 convert sends Mosaic's lowering into
        # unbounded recursion
        zero = jnp.int32(0)
        alive = jnp.max(jnp.where(iota == i, sup, zero)) == zero
        sup = sup | jnp.where(alive & (iota > i),
                              ov_blk_ref[r:r + 1, :], zero)
    sup_ref[:, :] = sup

    @pl.when(b == pl.num_programs(0) - 1)
    def _finish():
        o_ref[:, :] = sup


@partial(jax.jit, static_argnames=("interpret",))
def nms_scan(overlap, pre, interpret=False):
    """(N, N) bool overlap + (N,) bool pre-suppression -> (N,) bool
    suppressed, identical to the sequential greedy scan."""
    n = overlap.shape[0]
    pad = -n % 8
    ov = overlap.astype(jnp.int32)
    prev = pre.astype(jnp.int32)[None, :]
    if pad:
        # padding boxes are pre-suppressed: they never become alive, so
        # their (zero) overlap rows are never applied
        ov = jnp.pad(ov, ((0, pad), (0, pad)))
        prev = jnp.pad(prev, ((0, 0), (0, pad)), constant_values=1)
    npd = n + pad
    out = pl.pallas_call(
        _nms_scan_kernel,
        grid=(npd // 8,),
        in_specs=[
            pl.BlockSpec((8, npd), lambda i: (i, jnp.int32(0))),
            pl.BlockSpec((1, npd), lambda i: (jnp.int32(0), jnp.int32(0))),
        ],
        out_specs=pl.BlockSpec((1, npd), lambda i: (jnp.int32(0),
                                                    jnp.int32(0))),
        out_shape=jax.ShapeDtypeStruct((1, npd), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, npd), jnp.int32)],
        interpret=interpret,
    )(ov, prev)
    return out[0, :n] > 0


_BLK = 128  # lane width: dynamic lane slices must be 128-aligned


def _nms_blocked_kernel(ov_blk_ref, diag_ref, pre_ref, o_ref, sup_ref):
    """Block-parallel greedy cascade (the reference's CUDA decomposition,
    d3d/box/nms_cuda.cu:16-106, mapped to TPU): per grid step, resolve the
    128-box block's INTRA-block chain serially on its (128, 128) diagonal
    tile, then apply every alive row to all LATER columns as one full-width
    masked reduce — the expensive (1, N) ops run N/128 times instead of N."""
    b = pl.program_id(0)
    n = ov_blk_ref.shape[1]

    @pl.when(b == 0)
    def _init():
        sup_ref[:, :] = pre_ref[:, :]

    start = b * jnp.int32(_BLK)
    local = sup_ref[0:1, pl.ds(start, _BLK)]
    iota = lax.broadcasted_iota(jnp.int32, (1, _BLK), 1)
    zero, one = jnp.int32(0), jnp.int32(1)
    alive = jnp.zeros((1, _BLK), jnp.int32)
    for r in range(_BLK):
        a_r = jnp.max(jnp.where(iota == r, local, zero)) == zero
        local = local | jnp.where(a_r & (iota > r), diag_ref[r:r + 1, :],
                                  zero)
        alive = alive | jnp.where(a_r & (iota == r), one, zero)

    # one vectorized apply of the whole block to every later column
    contrib = jnp.max(jnp.where(alive.reshape(_BLK, 1) > 0,
                                ov_blk_ref[:, :], zero),
                      axis=0, keepdims=True)
    col = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    later = col >= start + jnp.int32(_BLK)
    sup_ref[:, :] = sup_ref[:, :] | jnp.where(later, contrib, zero)
    sup_ref[0:1, pl.ds(start, _BLK)] = local

    @pl.when(b == pl.num_programs(0) - 1)
    def _finish():
        o_ref[:, :] = sup_ref[:, :]


@partial(jax.jit, static_argnames=("interpret",))
def nms_scan_blocked(overlap, pre, interpret=False):
    """(N, N) bool overlap + (N,) bool pre-suppression -> (N,) suppressed;
    keep-mask identical to :func:`nms_scan` / the sequential greedy scan,
    with the serial cascade shortened to N/128 full-width steps."""
    n = overlap.shape[0]
    pad = -n % _BLK
    ov = overlap.astype(jnp.int32)
    prev = pre.astype(jnp.int32)[None, :]
    if pad:
        ov = jnp.pad(ov, ((0, pad), (0, pad)))
        prev = jnp.pad(prev, ((0, 0), (0, pad)), constant_values=1)
    npd = n + pad
    out = pl.pallas_call(
        _nms_blocked_kernel,
        grid=(npd // _BLK,),
        in_specs=[
            pl.BlockSpec((_BLK, npd), lambda i: (i, jnp.int32(0))),
            pl.BlockSpec((_BLK, _BLK), lambda i: (i, i)),
            pl.BlockSpec((1, npd), lambda i: (jnp.int32(0), jnp.int32(0))),
        ],
        out_specs=pl.BlockSpec((1, npd), lambda i: (jnp.int32(0),
                                                    jnp.int32(0))),
        out_shape=jax.ShapeDtypeStruct((1, npd), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, npd), jnp.int32)],
        interpret=interpret,
    )(ov, ov, prev)
    return out[0, :n] > 0


def _soft_nms_kernel(method):
    """Kernel factory; `method` (linear/gaussian) is compile-time, the
    numeric parameters ride in SMEM."""

    def kernel(iou_ref, sc0_ref, pre_ref, par_ref, o_ref,
               sc_ref, fr_ref, su_ref):
        b = pl.program_id(0)
        n = iou_ref.shape[1]

        @pl.when(b == 0)
        def _init():
            sc_ref[:, :] = sc0_ref[:, :]
            fr_ref[:, :] = jnp.zeros_like(fr_ref)
            su_ref[:, :] = pre_ref[:, :]

        iou_t = par_ref[0, 0]
        score_t = par_ref[0, 1]
        param = par_ref[0, 2]

        iota = lax.broadcasted_iota(jnp.int32, (1, n), 1)
        zero, one = jnp.int32(0), jnp.int32(1)
        sc, fr, su = sc_ref[:, :], fr_ref[:, :], su_ref[:, :]

        avail = (fr == zero) & (su == zero)
        any_avail = jnp.max(jnp.where(avail, one, zero)) > zero
        masked = jnp.where(avail, sc, jnp.float32(-jnp.inf))
        top = jnp.max(masked)
        # first argmax, like jnp.argmax in the XLA fallback
        pick = jnp.min(jnp.where(masked == top, iota, jnp.int32(n)))
        pick = jnp.minimum(pick, jnp.int32(n - 1))

        row = iou_ref[pl.ds(pick, 1), :]
        mask_row = (row > iou_t) & (fr == zero) & (iota != pick)
        if method == "linear":
            # x**p via exp/log with the XLA convention power(0, 0) == 1
            # (literals pinned f32: weak python floats can promote through
            # an f64 convert under jax_enable_x64, which Mosaic rejects)
            pw = jnp.where(param == jnp.float32(0.0), jnp.float32(1.0),
                           jnp.exp(param * jnp.log(
                               jnp.maximum(row, jnp.float32(1e-38)))))
            decay = jnp.float32(1.0) - pw
        else:  # gaussian
            decay = jnp.exp(-(row * row) / param)

        nsc = jnp.where(mask_row & any_avail, sc * decay, sc)
        dead = mask_row & (nsc < score_t)
        su = su | jnp.where(any_avail & dead, one, zero)
        fr = fr | jnp.where((iota == pick) & any_avail, one, zero)
        sc_ref[:, :] = nsc
        fr_ref[:, :] = fr
        su_ref[:, :] = su

        @pl.when(b == pl.num_programs(0) - 1)
        def _finish():
            o_ref[:, :] = su

    return kernel


@partial(jax.jit, static_argnames=("method", "interpret"))
def soft_nms_scan(iou, scores0, pre, iou_threshold, score_threshold,
                  param, method, interpret=False):
    """Soft-NMS pick/decay cascade in one Pallas kernel; semantics of the
    XLA fallback loop in d3d_tpu.ops.nms.soft_nms2d (Bodla et al. 2017,
    reference d3d/box/nms.cpp:32-96)."""
    n = iou.shape[0]
    pars = jnp.stack([iou_threshold, score_threshold, param]
                     ).astype(jnp.float32)[None, :]
    out = pl.pallas_call(
        _soft_nms_kernel(method),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((n, n), lambda i: (jnp.int32(0), jnp.int32(0))),
            pl.BlockSpec((1, n), lambda i: (jnp.int32(0), jnp.int32(0))),
            pl.BlockSpec((1, n), lambda i: (jnp.int32(0), jnp.int32(0))),
            pl.BlockSpec((1, 3), lambda i: (jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, n), lambda i: (jnp.int32(0),
                                                  jnp.int32(0))),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, n), jnp.float32),
                        pltpu.VMEM((1, n), jnp.int32),
                        pltpu.VMEM((1, n), jnp.int32)],
        interpret=interpret,
    )(iou.astype(jnp.float32), scores0.astype(jnp.float32)[None, :],
      pre.astype(jnp.int32)[None, :], pars)
    return out[0] > 0
