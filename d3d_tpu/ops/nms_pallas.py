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

__all__ = ["nms_scan"]


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
