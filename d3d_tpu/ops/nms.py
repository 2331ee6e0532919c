"""Rotated/axis-aligned 2D NMS on TPU.

The reference implements NMS as a greedy scalar loop (CPU,
d3d/box/nms.cpp:32-96) and a 64-bit bitmask block kernel + serial collect on
CUDA (d3d/box/nms_cuda.cu:16-106).  Sequential-in-score-order suppression is
inherently serial, so the TPU formulation precomputes the full pairwise IoU
matrix with the vectorized geometry core (one big fused XLA program feeding
the VPU) and then runs the greedy scan as a ``lax.fori_loop`` of O(N) cheap
masked vector ops — O(N^2) total work, identical keep-masks.

Semantics matched to the reference:
  * boxes with ``score <= score_threshold`` are pre-suppressed, except the
    top-scoring box is never pre-suppressed (an artifact of the reference's
    bottom-up pre-pass loop, nms.cpp:23-29 — kept for bit-exact parity);
  * hard NMS: scanning boxes in descending-score order, an unsuppressed box
    suppresses every lower-scored box with ``iou > iou_threshold``;
  * soft NMS (Bodla et al. 2017): iteratively pick the highest currently
    scored unfrozen/unsuppressed box, decay the scores of overlapping boxes
    (``linear``: ``s *= 1 - iou**p``; ``gaussian``: ``s *= exp(-iou^2/p)``),
    and suppress boxes whose decayed score falls below ``score_threshold``.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from . import geometry as G
from . import geometry_soa as GS

__all__ = ["nms2d", "soft_nms2d"]


def _iou_matrix(boxes, method):
    if method == "box":
        return G.aabox_iou(boxes[:, None, :], boxes[None, :, :])
    # rotated: SoA kernel with bounded-memory row blocking (TPU hot path)
    return GS.rbox_iou_matrix(boxes, boxes)


@partial(jax.jit, static_argnames=("iou_method",))
def nms2d(boxes, scores, iou_threshold=0.0, score_threshold=0.0, iou_method="rbox"):
    """Hard NMS. Returns the *suppressed* mask (callers invert, matching the
    reference's ``nms2d`` returning ``suppressed``, d3d/box/nms.cpp:99-119).

    :param boxes: (N, 5) xywhr
    :param scores: (N,)
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores, stable=True)  # descending
    # compute the matrix directly in score order (one tiny (N, 5) gather
    # instead of permuting the (N, N) matrix twice)
    iou_o = _iou_matrix(boxes[order], iou_method)
    overlap = iou_o > iou_threshold

    # pre-suppression by score (in score order); rank 0 exempt (see docstring)
    scores_o = scores[order]
    pre = scores_o <= score_threshold
    pre = pre.at[0].set(False)

    if jax.default_backend() == "tpu" and n <= 1024:  # (N, N) i32 in VMEM
        # the whole greedy cascade in one Pallas kernel: the matrix stays
        # VMEM-resident and the per-box serial steps cost VPU ops instead of
        # an XLA loop dispatch each (~0.37 ms -> ~0.04 ms at N=512)
        from .nms_pallas import nms_scan
        suppressed_o = nms_scan(overlap, pre)
    elif jax.default_backend() == "tpu":
        # large n: block-parallel cascade (the reference's CUDA bitmask
        # decomposition, nms_cuda.cu:16-106) — N/128 full-width steps
        from .nms_pallas import nms_scan_blocked
        suppressed_o = nms_scan_blocked(overlap, pre)
    else:
        def body(i, suppressed):
            alive = ~suppressed[i]
            # suppress all later boxes overlapping box i (if box i is alive)
            later = jnp.arange(n, dtype=jnp.int32) > i
            return suppressed | (alive & later & overlap[i])

        suppressed_o = lax.fori_loop(0, n, body, pre)
    # scatter back to original index order
    out = jnp.zeros(n, bool).at[order].set(suppressed_o)
    return out


@partial(jax.jit, static_argnames=("iou_method", "supression_method"))
def soft_nms2d(
    boxes,
    scores,
    iou_threshold=0.0,
    score_threshold=0.0,
    supression_param=0.0,
    iou_method="rbox",
    supression_method="linear",
):
    """Soft-NMS; returns the suppressed mask (scores are decayed internally
    only, like the reference which discards its mutated score copy)."""
    n = boxes.shape[0]
    iou = _iou_matrix(boxes, iou_method)
    overlap = iou > iou_threshold

    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)

    # pre-suppression identical to hard NMS
    order = jnp.argsort(-scores, stable=True)
    pre = (scores <= score_threshold).at[order[0]].set(False)

    if (jax.default_backend() == "tpu" and n <= 1024
            and iou.dtype == jnp.float32 and scores.dtype == jnp.float32):
        # whole pick/decay cascade in one Pallas kernel (VMEM-resident
        # matrix + state; one data-dependent row slice per grid step)
        from .nms_pallas import soft_nms_scan
        return soft_nms_scan(iou, jnp.where(pre, neg_inf, scores), pre,
                             iou_threshold, score_threshold,
                             supression_param, supression_method)

    def body(_, state):
        cur_scores, frozen, suppressed = state
        avail = ~(frozen | suppressed)
        any_avail = jnp.any(avail)
        pick = jnp.argmax(jnp.where(avail, cur_scores, neg_inf))
        row = overlap[pick] & ~frozen & (jnp.arange(n) != pick)
        iou_row = iou[pick]
        if supression_method == "linear":
            decay = 1.0 - jnp.power(iou_row, supression_param)
        else:  # gaussian
            decay = jnp.exp(-(iou_row * iou_row) / supression_param)
        new_scores = jnp.where(row & any_avail, cur_scores * decay, cur_scores)
        newly_dead = row & (new_scores < score_threshold)
        suppressed = suppressed | jnp.where(any_avail, newly_dead, False)
        frozen = frozen.at[pick].set(frozen[pick] | any_avail)
        return new_scores, frozen, suppressed

    init = (jnp.where(pre, neg_inf, scores), jnp.zeros(n, bool), pre)
    _, _, suppressed = lax.fori_loop(0, n, body, init)
    return suppressed
