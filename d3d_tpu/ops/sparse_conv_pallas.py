"""Fused gather+matmul Pallas kernel for the submanifold sparse conv.

The XLA formulation in :func:`d3d_tpu.ops.sparse_conv.subm_conv_apply`
materializes the gathered neighborhood tensor ``(N, K, C)`` in HBM before
the einsum — at SECOND-KITTI scale (16k sites, K=27, C=64, f32) that is
~113 MB written and read back per layer, despite the matmul itself being
only ~3.6 GFLOP. The op is purely HBM-bandwidth-bound.

This kernel keeps everything on chip. Arrays live in a TRANSPOSED,
lane-major layout — features ``(C, N)``, neighbor map ``(K, N)``, output
``(Cout, N)`` — so the channel axis sits on sublanes (no lane padding for
the narrow early stages, C=16/32) and the site axis fills the 128-wide
lanes. The grid iterates over the K kernel offsets; each step

  1. broadcasts that offset's neighbor row to ``(C, N)`` indices,
  2. gathers neighbor features along lanes with ONE
     ``tpu.dynamic_gather`` (``jnp.take_along_axis(..., axis=1)`` — the
     only gather form Mosaic lowers, operand/indices shapes equal),
  3. multiplies on the MXU: ``(Cout, C) @ (C, N)`` into a ``(Cout, N)``
     VMEM accumulator that is only flushed to HBM once.

Total HBM traffic ≈ one read of features + neighbor map + one write of
the output (~10 MB at the shapes above) instead of ~226 MB: a ~20x
traffic cut on the op the SECOND middle extractor spends its time in.

The backward is a custom VJP (``pallas_call`` has no autodiff):

* ``d/dweights`` is a second fused kernel — the same per-offset gather
  followed by a ``(C, N) @ (N, Cout)`` contraction over sites (large
  contraction dim: the MXU-friendliest matmul in the whole op).
* ``d/dfeatures`` needs the TRANSPOSED neighbor relation. For
  submanifold maps (query set == reference set) the cubic offset list of
  :func:`d3d_tpu.ops.sparse_conv.kernel_offsets` is centrosymmetric
  (``offs[K-1-k] == -offs[k]``), so ``nbr[i, k] == j  <=>
  nbr[j, K-1-k] == i`` and the cotangent flows through the SAME forward
  kernel with the weights flipped and transposed — pass
  ``symmetric=True`` to use it (asserted by the grad-parity tests).
  For general maps (e.g. strided down-convolutions) an XLA scatter-add
  fallback is used.

Reference counterpart: spconv-style rule-book gather-GEMM-scatter used by
the SECOND family the reference ecosystem targets (the reference itself,
cmpute/d3d, ships only the data/eval layers — see
``/root/reference/d3d/voxel/voxelize.cpp`` for its voxel story).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["subm_conv_fused", "fused_supported"]


def fused_supported(features, nbr):
    """Whether :func:`subm_conv_fused` handles these operand shapes.

    The Mosaic gather requires indices shaped exactly like the operand,
    so the output site list must be the input site list (submanifold
    convs; strided maps have fewer query rows and fall back to XLA).
    """
    return features.shape[0] == nbr.shape[0]


def _fwd_kernel(featT_ref, nbr_ref, wT_ref, outT_ref):
    """One kernel offset: lane-gather neighbors, matmul, accumulate."""
    # Trace the body with x64 OFF: the package enables jax_enable_x64
    # globally, under which a bare `0` literal traces as i64 and
    # lax.gather promotes its start_indices to i64 — both emit
    # convert_element_type eqns whose i64 operands send Mosaic's
    # _convert_helper into unbounded recursion (the TPU has no 64-bit
    # vector types). Everything in the kernel is f32/i32 regardless.
    with jax.enable_x64(False):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            outT_ref[:] = jnp.zeros_like(outT_ref)

        c, n = featT_ref.shape
        idx = jnp.broadcast_to(nbr_ref[0], (c, n))    # (C, N) per-lane rows
        mask = idx >= 0
        safe = jnp.where(mask, idx, 0)
        g = jnp.take_along_axis(featT_ref[:], safe, axis=1,
                                mode="promise_in_bounds")
        g = jnp.where(mask, g, 0.0)
        outT_ref[:] += jnp.dot(wT_ref[0], g,
                               preferred_element_type=jnp.float32)


def _dw_kernel(featT_ref, nbr_ref, gradT_ref, dw_ref):
    """One kernel offset: re-gather neighbors, contract over the N sites."""
    with jax.enable_x64(False):                       # see _fwd_kernel
        c, n = featT_ref.shape
        idx = jnp.broadcast_to(nbr_ref[0], (c, n))
        mask = idx >= 0
        safe = jnp.where(mask, idx, 0)
        g = jnp.take_along_axis(featT_ref[:], safe, axis=1,
                                mode="promise_in_bounds")
        g = jnp.where(mask, g, 0.0)
        # dW[k] = gathered_k^T @ grad : (C, N) x (Cout, N) -> (C, Cout)
        dw_ref[0] = lax.dot_general(g, gradT_ref[:],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)


def _fwd_call(featT, nbrT, wT, interpret):
    k = nbrT.shape[0]
    c, n = featT.shape
    cout = wT.shape[1]
    # nbr rides as (K, 1, N): Mosaic requires a block's last two dims be
    # (8, 128)-divisible OR equal the array dims — a (1, N) block of a
    # (K, N) array fails the sublane rule, but a (1, 1, N) block of a
    # (K, 1, N) array matches its last two dims exactly
    return pl.pallas_call(
        _fwd_kernel,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((c, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cout, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cout, n), jnp.float32),
        interpret=interpret,
    )(featT, nbrT.reshape(k, 1, n), wT)


def _dw_call(featT, nbrT, gradT, interpret):
    k = nbrT.shape[0]
    c, n = featT.shape
    cout = gradT.shape[0]
    return pl.pallas_call(
        _dw_kernel,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((c, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, c, cout), jnp.float32),
        interpret=interpret,
    )(featT, nbrT.reshape(k, 1, n), gradT)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def subm_conv_fused(features, nbr, weights, valid, symmetric=False,
                    interpret=False):
    """Fused sparse conv: per-offset lane gather + MXU matmul, on chip.

    Drop-in for :func:`d3d_tpu.ops.sparse_conv.subm_conv_apply` when the
    query set equals the input site set (:func:`fused_supported`).

    :param features: (N, C) active-site features (padded rows zero)
    :param nbr: (N, K) neighbor map (-1 absent)
    :param weights: (K, C, Cout) kernel
    :param valid: (N,) active mask
    :param symmetric: static — True iff ``nbr`` is a submanifold map
        (same site set, cubic offsets); enables the fused backward for
        ``d/dfeatures`` via the centrosymmetric-offset identity.
    :param interpret: static — run the Pallas interpreter (CPU tests).
    :returns: (N, Cout) features on the same active set, ``features``'s
        dtype, accumulated in float32.
    """
    out, _ = _fused_fwd(features, nbr, weights, valid, symmetric, interpret)
    return out


def _fused_fwd(features, nbr, weights, valid, symmetric, interpret):
    featT = features.astype(jnp.float32).T
    nbrT = nbr.T
    wT = jnp.transpose(weights, (0, 2, 1)).astype(jnp.float32)
    outT = _fwd_call(featT, nbrT, wT, interpret)
    out = outT.T * valid[:, None].astype(jnp.float32)
    return out.astype(features.dtype), (features, nbr, weights, valid)


def _fused_bwd(symmetric, interpret, res, grad):
    features, nbr, weights, valid = res
    gm = grad.astype(jnp.float32) * valid[:, None].astype(jnp.float32)

    # d/dweights: fused re-gather + site contraction
    featT = features.astype(jnp.float32).T
    nbrT = nbr.T
    dw = _dw_call(featT, nbrT, gm.T, interpret).astype(weights.dtype)

    if symmetric:
        # cotangent flows through the mirrored offsets: the forward
        # kernel on gm with effective weights W'[k] = W[K-1-k]^T, whose
        # (Cout_new, Cin_new) transpose — what _fwd_call takes — is just
        # weights[::-1]
        dfT = _fwd_call(gm.T, nbrT, weights[::-1].astype(jnp.float32),
                        interpret)
        dfeat = dfT.T
    else:
        # general transpose map: XLA scatter-add (materializes (N, K, C)
        # once, in the backward only)
        contrib = jnp.einsum("nd,kcd->nkc", gm,
                             weights.astype(jnp.float32))
        contrib = jnp.where((nbr >= 0)[..., None], contrib, 0.0)
        safe = jnp.where(nbr >= 0, nbr, features.shape[0])
        dfeat = jnp.zeros((features.shape[0] + 1, features.shape[1]),
                          jnp.float32)
        dfeat = dfeat.at[safe.ravel()].add(
            contrib.reshape(-1, features.shape[1]))[:-1]

    # padded/invalid input rows carry no gradient
    dfeat = dfeat.astype(features.dtype)
    return dfeat, None, dw, None


subm_conv_fused.defvjp(_fused_fwd, _fused_bwd)
