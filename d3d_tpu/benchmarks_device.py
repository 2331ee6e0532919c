"""On-device batched detection evaluation.

The reference evaluates detections with a compiled Cython loop over the 40
PR-sample thresholds, re-running a greedy score match per threshold per
frame (reference d3d/benchmarks.pyx:176-286) and flags its own per-pair
scipy logpdf accuracy stats as a bottleneck (benchmarks.pyx:259 "FIXME:
these operations slow down the evaluator").

TPU-first redesign (SURVEY.md §7 stage 5): the whole per-frame evaluation
becomes ONE jitted XLA program —

  * the DT x GT rotated-IoU matrix comes from the batched geometry kernels
    (bit-identical to :class:`~d3d_tpu.tracking.matcher.ScoreMatcher`,
    which calls the same ``box3dr_iou_pair``);
  * the 40 score thresholds are evaluated as a ``vmap`` over a masked
    greedy match implemented as a ``lax.fori_loop`` over detections in
    descending-score order — exactly the reference's assignment semantics
    including its quirk of ranking GT candidates by the distance row of
    the *loop-position-th* subset element rather than the processed
    detection's own row (matcher.pyx:155-158, replicated from
    ``ScoreMatcher.match``);
  * the per-pair accuracy stats (center distance, box-dimension distance,
    quaternion angle, multivariate-normal + von-Mises log-likelihood) are
    dense (D, G) matrices computed once per frame on the MXU/VPU instead
    of scipy calls per matched pair per threshold;
  * frames batch over a leading axis with another ``vmap`` and merge into
    a single mergeable :class:`~d3d_tpu.benchmarks.DetectionEvalStats` with
    a weighted-mean reduction on device.

Counter outputs (ngt/ndt/tp/fp/fn) are integer-exact vs the host
``DetectionEvaluator.calc_stats``; accuracy stats agree to f32 precision
(the host path accumulates in f64 numpy / scipy).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .abstraction import Target3DArray

__all__ = ["pack_frames", "eval_frames_device", "device_calc_stats",
           "match_subsets_device", "matching_tables_device",
           "match_subsets_with_tables", "max_dist_arrays",
           "tracking_match_scan",
           "device_semantic_stats", "device_panoptic_stats"]

_LOG_2PI = float(np.log(2.0 * np.pi))
_BIG_RANK = np.int32(2 ** 30)


def max_dist_arrays(evaluator):
    """(max_dist f32 (C,), strict-tie bool (C,)) for an evaluator — the
    f32 threshold plus the flag marking thresholds whose f32 rounding went
    UP, where an exact f32 tie must be rejected to reproduce the host's
    f64 comparison. Shared by the detection and tracking device paths."""
    md64 = np.array([evaluator._max_distance[c] for c in evaluator._classes],
                    np.float64)
    md = md64.astype(np.float32)
    return md, md.astype(np.float64) > md64


# ---------------------------------------------------------------------------
# host-side packing: Target3DArray pairs -> padded dense arrays
# ---------------------------------------------------------------------------

def _bucket(n, minimum=8):
    """Round up to a power of two to bound jit recompiles across frames."""
    b = minimum
    while b < n:
        b *= 2
    return b


def _pack_one(arr: Target3DArray, class_to_idx, n, want_var):
    """One Target3DArray -> fixed-size arrays. Padding rows are unit boxes
    far outside the scene (IoU exactly 0 with everything) with label -1.

    Extraction is fully columnar: ``Target3DArray.columns()`` exposes the
    array's struct-of-arrays backing, so packing is a handful of dense
    numpy copies — no per-object Python loop and no scipy calls (the
    column quats and f32 box layout are the exact values
    ``to_numpy``/ScoreMatcher consume, so the distance matrix stays
    bit-identical to the host path)."""
    labels = np.full(n, -1, np.int32)
    scores = np.zeros(n, np.float32)
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0:3] = 1e4
    boxes[:, 3:6] = 1.0
    quats = np.zeros((n, 4), np.float32)
    quats[:, 3] = 1.0
    if want_var:
        pos_var = np.zeros((n, 3, 3), np.float32)
        dim_var = np.zeros((n, 3, 3), np.float32)
        ori_var = np.zeros(n, np.float32)

    m = len(arr)
    if m > 0:
        c = arr.columns()
        boxes[:m, 0:3] = c["position"]
        boxes[:m, 3:6] = c["dimension"]
        boxes[:m, 6] = c["yaw"]
        scores[:m] = c["score"]
        uniq, inv = np.unique(c["label"], return_inverse=True)
        labels[:m] = np.array([class_to_idx.get(int(u), -1) for u in uniq],
                              np.int32)[inv]
        quats[:m] = c["quat"]
        if want_var:
            pos_var[:m] = c["position_var"]
            dim_var[:m] = c["dimension_var"]
            ori_var[:m] = c["orientation_var"]

    out = dict(labels=labels, scores=scores, boxes=boxes, quats=quats)
    if want_var:
        out.update(pos_var=pos_var, dim_var=dim_var, ori_var=ori_var)
    return out


def pack_frames(gt_arrays, dt_arrays, class_values, pad_dt=None, pad_gt=None,
                gt_ignored=None):
    """Pack lists of (gt, dt) Target3DArray pairs into stacked padded numpy
    arrays with a leading frame axis, ready for :func:`eval_frames_device`.

    :param class_values: ordered list of class *values* under evaluation
        (``DetectionEvaluator._classes``); labels outside it pack as -1 and
        are ignored, matching the host evaluator's tag filtering.
    :param gt_ignored: optional per-frame boolean masks (KITTI IGNORE
        semantics; see ``DetectionEvaluator.calc_stats``)
    """
    assert len(gt_arrays) == len(dt_arrays)
    class_to_idx = {v: i for i, v in enumerate(class_values)}
    nd = pad_dt or _bucket(max((len(a) for a in dt_arrays), default=1))
    ng = pad_gt or _bucket(max((len(a) for a in gt_arrays), default=1))

    dt = [_pack_one(a, class_to_idx, nd, want_var=True) for a in dt_arrays]
    gt = [_pack_one(a, class_to_idx, ng, want_var=False) for a in gt_arrays]
    stack = lambda packs, k: np.stack([p[k] for p in packs])
    return {
        "dt_label": stack(dt, "labels"), "dt_score": stack(dt, "scores"),
        "dt_box": stack(dt, "boxes"), "dt_quat": stack(dt, "quats"),
        "dt_pos_var": stack(dt, "pos_var"),
        "dt_dim_var": stack(dt, "dim_var"),
        "dt_ori_var": stack(dt, "ori_var"),
        "gt_label": stack(gt, "labels"), "gt_box": stack(gt, "boxes"),
        "gt_quat": stack(gt, "quats"),
        "gt_ignore": np.stack([
            np.pad(np.asarray(m, bool), (0, ng - len(m)))
            if gt_ignored is not None and m is not None
            else np.zeros(ng, bool)
            for m in (gt_ignored if gt_ignored is not None
                      else [None] * len(gt_arrays))]),
    }


# ---------------------------------------------------------------------------
# device kernel
# ---------------------------------------------------------------------------

def _mvn_logpdf(delta, cov):
    """Multivariate-normal log-density of residual ``delta`` under ``cov``
    (scipy.stats.multivariate_normal.logpdf equivalent, batched 3x3)."""
    sign, logdet = jnp.linalg.slogdet(cov)
    sol = jnp.linalg.solve(cov, delta[..., None])[..., 0]
    maha = jnp.sum(delta * sol, axis=-1)
    return -0.5 * (3.0 * _LOG_2PI + logdet + maha)


def _vonmises_logpdf(x, kappa):
    """von-Mises log-density: kappa*cos(x) - log(2 pi I0(kappa)); log I0 via
    the exponentially-scaled native op (log I0 = log i0e + kappa)."""
    return kappa * jnp.cos(x) - _LOG_2PI - (jnp.log(jax.scipy.special.i0e(kappa)) + kappa)


def _greedy_match_masked(dist_ok, rank, m, dt_label, dt_score,
                         gt_label, gt_valid):
    """Greedy score match over an arbitrary dt subset mask ``m``; returns
    per-GT matched dt index (-1 unmatched). Exactly ScoreMatcher.match +
    _match_by_order semantics: sources in descending score (ties:
    descending subset position), each trying GT candidates by ascending
    distance rank of the loop-position-th subset element (the reference
    quirk), first free compatible GT wins."""
    D = dt_label.shape[0]
    G = gt_label.shape[0]

    # subset-position -> dt index (survivors in index order first)
    arange_d = jnp.arange(D, dtype=jnp.int32)
    idx_by_pos = jnp.argsort(jnp.where(m, arange_d, jnp.int32(D)), stable=True)
    # processing order: survivors by (-score, -index); composed stable sorts
    order = arange_d[::-1]
    order = order[jnp.argsort(-dt_score[order], stable=True)]
    order = order[jnp.argsort(~m[order], stable=True)]
    n_live = jnp.sum(m.astype(jnp.int32))

    def body(i, gt_match):
        src = order[i]
        rr = rank[idx_by_pos[i]]  # reference quirk: row of subset[i]
        adm = (gt_valid & (gt_label == dt_label[src]) & (gt_match < 0)
               & dist_ok[src] & (i < n_live))
        key = jnp.where(adm, rr, _BIG_RANK)
        g = jnp.argmin(key)
        found = key[g] < _BIG_RANK
        hit = (jnp.arange(G, dtype=jnp.int32) == g) & found
        return jnp.where(hit, src, gt_match)

    init = jnp.full((G,), -1, jnp.int32)
    return m, lax.fori_loop(0, D, body, init)


def _greedy_match(dist_ok, rank, dt_label, dt_score, dt_valid,
                  gt_label, gt_valid, thres):
    """Score-threshold wrapper around :func:`_greedy_match_masked`."""
    m = dt_valid & (dt_score >= thres)
    return _greedy_match_masked(dist_ok, rank, m, dt_label, dt_score,
                                gt_label, gt_valid)


def _matching_tables(dt_box, gt_box, gt_label, gt_valid, max_dist,
                     max_dist_strict, metric="riou"):
    """Distance matrix + acceptance mask + stable distance ranks shared by
    the detection evaluator and the tracking match helper. Identical
    computation to ScoreMatcher.prepare_boxes (bit-identical distances for
    the riou metric; the position metric is euclidean center distance —
    the nuScenes matching protocol)."""
    from .ops.geometry import box3dr_iou_pair

    if metric == "position":
        delta = dt_box[:, None, 0:3] - gt_box[None, :, 0:3]
        dist = jnp.sqrt(jnp.sum(delta * delta, -1)).astype(jnp.float32)
    else:
        b1 = dt_box.at[:, 3:6].set(jnp.clip(dt_box[:, 3:6], -1e3, 1e3))
        b2 = gt_box.at[:, 3:6].set(jnp.clip(gt_box[:, 3:6], -1e3, 1e3))
        iou = box3dr_iou_pair(b1[:, None, :], b2[None, :, :])
        dist = (1.0 - iou).astype(jnp.float32)

    safe_gtl = jnp.where(gt_valid, gt_label, 0)
    md = max_dist[safe_gtl]
    le = dist <= md[None, :]
    tie = (dist == md[None, :]) & max_dist_strict[safe_gtl][None, :]
    dist_ok = le & ~tie

    rank_key = jnp.where(gt_valid[None, :], dist, jnp.float32(np.inf))
    order_g = jnp.argsort(rank_key, axis=1, stable=True)
    rank = jnp.argsort(order_g, axis=1, stable=True).astype(jnp.int32)
    return dist, dist_ok, rank


@jax.jit
def matching_tables_device(dt_box, gt_box, gt_label, max_dist,
                           max_dist_strict):
    """Distance matrix + acceptance mask + ranks as one device call; the
    ``dist`` output doubles as the TrackingEvaluator's host distance
    cache (bit-identical to ScoreMatcher.prepare_boxes), so the rotated
    IoU matrix is computed once per frame, not once per consumer."""
    return _matching_tables(dt_box, gt_box, gt_label, gt_label >= 0,
                            max_dist, max_dist_strict)


# One module-level jit wrapper so every precompute_tables call (e.g. one
# per sequence of a 21-sequence benchmark) shares a single trace/compile
# cache instead of re-tracing the chunked program per call.
batched_matching_tables = jax.jit(
    jax.vmap(matching_tables_device, in_axes=(0, 0, 0, None, None)))


@jax.jit
def match_subsets_with_tables(dist_ok, rank, dt_label, dt_score, gt_label,
                              subset_masks):
    """Greedy-match every per-threshold dt subset given precomputed
    tables from :func:`matching_tables_device`.

    :param subset_masks: (S, D) bool — dt rows participating per threshold
    :returns: match (S, G) int32 dt row or -1
    """
    gt_valid = gt_label >= 0
    _, match = jax.vmap(
        lambda m: _greedy_match_masked(dist_ok, rank, m, dt_label,
                                       dt_score, gt_label, gt_valid)
    )(subset_masks)
    return match


def match_subsets_device(dt_box, dt_label, dt_score, gt_box, gt_label,
                         subset_masks, max_dist, max_dist_strict):
    """One-call composition of the two phases above (kept for callers
    that don't need the distance matrix separately)."""
    dist, dist_ok, rank = matching_tables_device(
        dt_box, gt_box, gt_label, max_dist, max_dist_strict)
    match = match_subsets_with_tables(dist_ok, rank, dt_label, dt_score,
                                      gt_label, subset_masks)
    return match, dist


# ---------------------------------------------------------------------------
# tracking: whole-chunk CLEAR-MOT matching as one scanned device program
# ---------------------------------------------------------------------------

def _tracking_scan_step(md, md_strict, carry, xs):
    """One frame of the CLEAR-MOT matching chain (TrackingEvaluator
    pass 1 + greedy re-match, reference benchmarks.pyx:560-700): preserve
    last frame's assignments that still pass the dt-class distance cap,
    greedy-match the rest, and carry this frame's assignment forward.

    Carry is the previous frame's per-dt-slot state: the compact
    trajectory id per slot (``prev_ctid``, 0 = padding) and the assigned
    gt's compact-id code per (threshold, slot) (``prev_assign``, 0 =
    unassigned) — only the immediately-previous frame matters, exactly
    like the host's ``_last_dt_gt`` matrix which is rewritten per frame."""
    prev_ctid, prev_assign = carry
    dist, dist_ok, rank, dtl, dts, gtl, passing, dct, gct = xs
    D = dtl.shape[0]
    G = gtl.shape[0]
    S = passing.shape[0]
    gt_valid = gtl >= 0

    # tid join: current dt slot -> same-trajectory slot of the prev frame
    eq = (dct[:, None] == prev_ctid[None, :]) & (dct > 0)[:, None]
    has_prev = eq.any(axis=1)
    prev_slot = jnp.argmax(eq, axis=1)
    code = jnp.where(has_prev[None, :], prev_assign[:, prev_slot], 0)

    # prev gt code -> current-frame gt index (host dict semantics: the
    # LAST eligible gt with that trajectory id wins)
    eqg = ((code - 1)[:, :, None] == gct[None, None, :]) \
        & gt_valid[None, None, :] & (code > 0)[:, :, None]
    gi = jnp.where(eqg.any(-1),
                   G - 1 - jnp.argmax(eqg[:, :, ::-1], axis=-1), -1)

    # preserved: still within the dt class's max distance (f32 cap with
    # the strict-tie rejection reproducing the host's f64 compare)
    safe_dtl = jnp.where(dtl >= 0, dtl, 0)
    maxd = md[safe_dtl]
    strict = md_strict[safe_dtl]
    dval = dist[jnp.arange(D, dtype=jnp.int32)[None, :],
                jnp.where(gi >= 0, gi, 0)]
    ok = (dval <= maxd[None, :]) & ~((dval == maxd[None, :])
                                     & strict[None, :])
    pres = passing & (gi >= 0) & ok

    # cur_gt (S, G): preserved dt per gt (largest dt index wins, matching
    # the host's write order)
    dt_idx = jnp.arange(D, dtype=jnp.int32)
    cur_gt = jnp.full((S, G), -1, jnp.int32).at[
        jnp.arange(S)[:, None], jnp.where(pres, gi, 0)
    ].max(jnp.where(pres, dt_idx[None, :], -1))

    rematch = passing & ~pres
    new_match = jax.vmap(
        lambda m: _greedy_match_masked(dist_ok, rank, m, dtl, dts,
                                       gtl, gt_valid)[1])(rematch)

    # carry: this frame's final dt -> gt-code assignment per slot
    final = jnp.where(new_match >= 0, new_match, cur_gt)
    g_idx = jnp.arange(G, dtype=jnp.int32)
    best_g = jnp.full((S, D), -1, jnp.int32).at[
        jnp.arange(S)[:, None], jnp.where(final >= 0, final, 0)
    ].max(jnp.where(final >= 0, g_idx[None, :], -1))
    new_assign = jnp.where(best_g >= 0,
                           gct[jnp.where(best_g >= 0, best_g, 0)] + 1, 0)
    return (dct, new_assign), (new_match, cur_gt)


@jax.jit
def tracking_match_scan(dist, dist_ok, rank, dt_label, dt_score, gt_label,
                        passing, dt_ctid, gt_ctid, max_dist, max_dist_strict,
                        prev_ctid, prev_assign):
    """Chain :func:`_tracking_scan_step` over a chunk of frames: ONE
    device dispatch (and one host fetch) per chunk replaces the
    per-frame pass-1 + match round trips of
    ``TrackingEvaluator.calc_stats``.

    :param dist/dist_ok/rank: (F, D, G) stacked matching tables
    :param passing: (F, S, D) bool — host-computed score/tag admission
        (f64 threshold semantics preserved exactly)
    :param dt_ctid/gt_ctid: (F, D)/(F, G) int32 compact trajectory ids
        (host-assigned, 0 = padding; equality within a sequence is all
        the chain needs)
    :returns: (prev_ctid, prev_assign, new_match (F, S, G),
        cur_gt (F, S, G)) — the first two feed the next chunk's carry
    """
    step = partial(_tracking_scan_step, max_dist, max_dist_strict)
    (pc, pa), (nm, cg) = lax.scan(
        step, (prev_ctid, prev_assign),
        (dist, dist_ok, rank, dt_label, dt_score, gt_label, passing,
         dt_ctid, gt_ctid))
    return pc, pa, nm, cg


@partial(jax.jit, static_argnames=("nclasses", "metric"))
def eval_frames_device(packed, thresholds, max_dist, max_dist_strict,
                       nclasses, metric="riou"):
    """Evaluate a batch of frames entirely on device.

    :param packed: dict from :func:`pack_frames` (leading frame axis F)
    :param thresholds: (S,) f32 PR-sample score thresholds
    :param max_dist: (C,) f32 per-class max distance (1 - min IoU overlap)
    :param max_dist_strict: (C,) bool — True where the f32 rounding of the
        f64 threshold rounded up, so an exact f32 tie must be rejected to
        match the host's f64 comparison
    :param nclasses: static class count C
    :returns: dict of per-frame dense stats — ``ngt`` (F, C); ``ndt``,
        ``tp``, ``fp``, ``fn`` (F, C, S) i32; ``acc_{iou,angular,dist,box,
        var}`` (F, C, S) f32 sums over matched GT (divide by ``tp`` for the
        host evaluator's per-frame means).
    """
    def one_frame(p):
        dtl, dts, dtb = p["dt_label"], p["dt_score"], p["dt_box"]
        gtl, gtb = p["gt_label"], p["gt_box"]
        D, G = dtl.shape[0], gtl.shape[0]
        dv, gv = dtl >= 0, gtl >= 0
        # ignored gt stay matchable (absorbing detections from FP) but are
        # excluded from every counter and accuracy
        counted = gv & ~p["gt_ignore"]

        dist, dist_ok, rank = _matching_tables(
            dtb, gtb, gtl, gv, max_dist, max_dist_strict, metric)

        # (D, G) accuracy-value matrices, computed once on the VPU
        d_pos = gtb[None, :, 0:3] - dtb[:, None, 0:3]
        v_dist = jnp.linalg.norm(d_pos, axis=-1)
        d_dim = gtb[None, :, 3:6] - dtb[:, None, 3:6]
        v_box = jnp.linalg.norm(d_dim, axis=-1)
        qdot = jnp.clip(jnp.abs(jnp.sum(p["dt_quat"][:, None, :]
                                        * p["gt_quat"][None, :, :], -1)), 0, 1)
        v_ang = 2.0 * jnp.arccos(qdot)
        ov = p["dt_ori_var"]
        lp = _mvn_logpdf(d_pos, p["dt_pos_var"][:, None])
        lp = lp + _mvn_logpdf(d_dim, p["dt_dim_var"][:, None])
        kappa = 1.0 / jnp.where(ov > 0, ov, 1.0)
        lp = lp + _vonmises_logpdf(v_ang, kappa[:, None])
        v_var = jnp.where((ov > 0)[:, None], lp, -jnp.inf)

        # all thresholds at once: vmap over the masked greedy match
        m_all, match_all = jax.vmap(
            lambda t: _greedy_match(dist_ok, rank, dtl, dts, dv, gtl, gv, t)
        )(thresholds)  # (S, D), (S, G)

        cls = jnp.arange(nclasses, dtype=jnp.int32)
        oh_dt = (dtl[None, :] == cls[:, None])  # (C, D)
        oh_gt = (gtl[None, :] == cls[:, None])  # (C, G)

        matched = match_all >= 0  # (S, G)
        dt_matched = jnp.zeros((thresholds.shape[0], D), jnp.int32).at[
            jnp.arange(thresholds.shape[0])[:, None],
            jnp.where(matched, match_all, 0)
        ].add(matched.astype(jnp.int32)) > 0  # (S, D)

        i32 = lambda x: x.astype(jnp.int32)
        ngt = i32(oh_gt) @ i32(counted)                            # (C,)
        ndt = jnp.einsum("cd,sd->cs", i32(oh_dt), i32(m_all))      # (C, S)
        tp = jnp.einsum("cg,sg->cs", i32(oh_gt),
                        i32(matched & counted[None, :]))
        fp = jnp.einsum("cd,sd->cs", i32(oh_dt), i32(m_all & ~dt_matched))
        fn = ngt[:, None] - tp

        safe = jnp.where(matched, match_all, 0)  # (S, G)
        g_idx = jnp.arange(G)[None, :]

        def acc(v):
            vals = jnp.where(matched & counted[None, :],
                             v[safe, g_idx], 0.0)  # (S, G)
            return jnp.einsum("cg,sg->cs", oh_gt.astype(v.dtype), vals)

        return dict(ngt=ngt, ndt=ndt, tp=tp, fp=fp, fn=fn,
                    acc_iou=acc(1.0 - dist), acc_dist=acc(v_dist),
                    acc_box=acc(v_box), acc_angular=acc(v_ang / np.pi),
                    acc_var=acc(v_var))

    return jax.vmap(one_frame)(packed)


# ---------------------------------------------------------------------------
# DetectionEvaluator integration
# ---------------------------------------------------------------------------

def _merge_stats(evaluator, parts):
    """Combine mergeable partial DetectionEvalStats: counters sum,
    accuracies tp-weighted mean (NaN where no TPs) — the same semantics
    as the in-kernel frame merge and evaluator.add_stats."""
    from .benchmarks import DetectionEvalStats

    classes = evaluator._classes
    s = DetectionEvalStats(classes, evaluator._pr_nsamples)
    acc_fields = ("acc_iou", "acc_angular", "acc_dist", "acc_box", "acc_var")
    for k in classes:
        s.ngt[k] = int(sum(p.ngt[k] for p in parts))
        for fld in ("ndt", "tp", "fp", "fn"):
            getattr(s, fld)[k][:] = np.sum(
                [getattr(p, fld)[k] for p in parts], axis=0)
        tp_tot = np.sum([p.tp[k] for p in parts], axis=0)
        with np.errstate(invalid="ignore"):
            for fld in acc_fields:
                num = np.zeros_like(s.acc_iou[k])
                for p in parts:
                    v = getattr(p, fld)[k]
                    num += np.where(p.tp[k] > 0, v * p.tp[k], 0.0)
                getattr(s, fld)[k][:] = np.where(
                    tp_tot > 0, num / np.maximum(tp_tot, 1), np.nan)
    return s


def device_calc_stats(evaluator, gt_arrays, dt_arrays, calib=None,
                      merge=True, mesh=None, packed=None, gt_ignored=None,
                      chunk_frames=None):
    """Evaluate many frames with :func:`eval_frames_device` and return
    either one merged ``DetectionEvalStats`` (``merge=True``) or a list of
    per-frame stats identical to ``evaluator.calc_stats`` outputs.

    Drop-in replacement for the per-frame host loop::

        stats = device_calc_stats(evaluator, gt_list, dt_list)
        evaluator.add_stats(stats)

    :param mesh: optional ``jax.sharding.Mesh`` with a ``dp`` axis — the
        frame batch shards over data-parallel chips (frames are padded to a
        multiple of dp with empty frames, which contribute zero counters),
        replacing the reference's multiprocess evaluation fan-out.
    :param packed: optional precomputed :func:`pack_frames` output for
        these (gt, dt) lists — packing is threshold-independent, so
        multi-threshold protocols (KITTI strata, nuScenes distances) pack
        once and evaluate many times.
    :param chunk_frames: optional chunk size bounding device memory on
        long streams (the kernel holds F x S x D x G intermediates):
        chunks are evaluated sequentially and their mergeable stats
        combined — identical results, bounded peak memory. Requires
        ``merge=True``; chunks are rounded up to dp multiples on a mesh.
    """
    from .benchmarks import DetectionEvalStats

    gt_arrays = list(gt_arrays)
    dt_arrays = list(dt_arrays)
    nframes = len(gt_arrays)
    if nframes == 0:
        return ([] if not merge
                else DetectionEvalStats(evaluator._classes,
                                        evaluator._pr_nsamples))
    if chunk_frames is not None and nframes > chunk_frames:
        if not merge:
            raise ValueError("chunk_frames requires merge=True")
        if packed is not None:
            raise ValueError("chunk_frames cannot reuse a prepacked batch")
        parts = []
        for lo in range(0, nframes, chunk_frames):
            hi = min(lo + chunk_frames, nframes)
            parts.append(device_calc_stats(
                evaluator, gt_arrays[lo:hi], dt_arrays[lo:hi], calib=calib,
                merge=True, mesh=mesh,
                gt_ignored=None if gt_ignored is None
                else list(gt_ignored)[lo:hi]))
        return _merge_stats(evaluator, parts)
    if mesh is not None and merge:
        dp = mesh.shape["dp"]
        pad = (-nframes) % dp
        if pad:
            empty = Target3DArray([], frame=gt_arrays[0].frame
                                  if gt_arrays else None)
            gt_arrays += [empty] * pad
            dt_arrays += [empty] * pad
            if gt_ignored is not None:
                gt_ignored = list(gt_ignored) + [None] * pad
    for i, (g, d) in enumerate(zip(gt_arrays, dt_arrays)):
        if g.frame != d.frame:
            if calib is None:
                raise ValueError("Calibration is not provided when dt_boxes "
                                 "and gt_boxes are in different frames!")
            gt_arrays[i] = calib.transform_objects(g, frame_to=d.frame)

    classes = evaluator._classes
    nsamples = evaluator._pr_nsamples
    if packed is None:
        packed = pack_frames(gt_arrays, dt_arrays, classes,
                             gt_ignored=gt_ignored)
    md, md_strict = max_dist_arrays(evaluator)
    if mesh is not None and merge:
        from jax.sharding import NamedSharding, PartitionSpec as P

        frame_sh = NamedSharding(mesh, P("dp"))
        packed = {k: jax.device_put(jnp.asarray(v), frame_sh)
                  for k, v in packed.items()}
    else:
        packed = {k: jnp.asarray(v) for k, v in packed.items()}
    from .tracking.matcher import DistanceTypes

    metric = ("position" if getattr(evaluator, "_distance_metric", None)
              == DistanceTypes.Position else "riou")
    out = eval_frames_device(
        packed,
        jnp.asarray(evaluator._pr_thresholds, jnp.float32),
        jnp.asarray(md), jnp.asarray(md_strict),
        nclasses=len(classes), metric=metric)
    out = {k: np.asarray(v) for k, v in out.items()}

    acc_fields = ("acc_iou", "acc_angular", "acc_dist", "acc_box", "acc_var")

    def frame_stats(f):
        s = DetectionEvalStats(classes, nsamples)
        tp = out["tp"][f]
        for i, k in enumerate(classes):
            s.ngt[k] = int(out["ngt"][f, i])
            for fld in ("ndt", "tp", "fp", "fn"):
                getattr(s, fld)[k][:] = out[fld][f, i]
            with np.errstate(invalid="ignore"):
                for fld in acc_fields:
                    getattr(s, fld)[k][:] = np.where(
                        tp[i] > 0, out[fld][f, i] / np.maximum(tp[i], 1),
                        np.nan)
        return s

    if not merge:
        return [frame_stats(f) for f in range(len(gt_arrays))]

    # merge across frames: counters sum, accuracies tp-weighted mean
    s = DetectionEvalStats(classes, nsamples)
    tp_tot = out["tp"].sum(0)  # (C, S)
    for i, k in enumerate(classes):
        s.ngt[k] = int(out["ngt"][:, i].sum())
        for fld in ("ndt", "tp", "fp", "fn"):
            getattr(s, fld)[k][:] = out[fld][:, i].sum(0)
        with np.errstate(invalid="ignore"):
            for fld in acc_fields:
                getattr(s, fld)[k][:] = np.where(
                    tp_tot[i] > 0,
                    out[fld][:, i].sum(0) / np.maximum(tp_tot[i], 1), np.nan)
    return s


# ---------------------------------------------------------------------------
# semantic segmentation: confusion counting as MXU matmuls
# ---------------------------------------------------------------------------

@jax.jit
def _semantic_confusion(gt, pred):
    """(F, N) uint8 label batches -> (256, 256) int32 confusion matrix.

    One-hot bf16 operands contracted over points on the MXU with f32
    accumulation (exact for per-frame counts < 2^24), summed over frames
    in int32 — no scatters, so it vectorizes on TPU where bincount-style
    scatter-adds serialize.
    """
    def frame_conf(args):
        g, p = args
        g1 = jax.nn.one_hot(g, 256, dtype=jnp.bfloat16)
        p1 = jax.nn.one_hot(p, 256, dtype=jnp.bfloat16)
        c = lax.dot_general(g1, p1, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        return c.astype(jnp.int32)

    return jnp.sum(lax.map(frame_conf, (gt, pred)), axis=0)


def device_semantic_stats(evaluator, gt_labels_list, pred_labels_list,
                          mesh=None):
    """Semantic confusion counting for many frames in one device call.

    Computes the tp/fp/fn counters of
    :meth:`~d3d_tpu.benchmarks.SegmentationEvaluator.calc_stats` (semantic
    part — the panoptic instance matching is host-side, per-segment) for a
    batch of frames, integer-exactly, as 256-wide one-hot matmuls.

    :param evaluator: a ``SegmentationEvaluator`` (classes/background read)
    :param gt_labels_list: per-frame int label arrays (ragged allowed —
        frames pad with the background label, which counts nowhere)
    :param mesh: optional ``jax.sharding.Mesh`` with a ``dp`` axis: frames
        shard over data-parallel devices, partial confusions psum — the
        segmentation analogue of :func:`device_calc_stats`'s mesh path
    :returns: a mergeable ``SegmentationStats`` (instance counters zero)
    """
    from .benchmarks import SegmentationStats

    bg = evaluator._background
    frames = [(np.asarray(g, np.uint8), np.asarray(p, np.uint8))
              for g, p in zip(gt_labels_list, pred_labels_list)]
    nmax = max((len(g) for g, _ in frames), default=1)
    f = len(frames)
    gt = np.full((max(f, 1), nmax), bg, np.uint8)
    pr = np.full((max(f, 1), nmax), bg, np.uint8)
    for i, (g, p) in enumerate(frames):
        if len(g) != len(p):
            raise ValueError("gt/pred label lengths differ in frame %d" % i)
        gt[i, :len(g)] = g
        pr[i, :len(p)] = p

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = mesh.shape["dp"]
        pad = (-len(gt)) % dp
        if pad:
            filler = np.full((pad, nmax), bg, np.uint8)
            gt = np.concatenate([gt, filler])
            pr = np.concatenate([pr, filler])
        # shard_map (not GSPMD auto-partitioning): the per-frame lax.map
        # is a scan, which XLA would gather if scanned over a sharded
        # axis — inside shard_map each shard scans its LOCAL frames and
        # one psum merges the 256x256 partials
        sh = NamedSharding(mesh, P("dp"))
        gt_d = jax.device_put(jnp.asarray(gt), sh)
        pr_d = jax.device_put(jnp.asarray(pr), sh)
        conf = np.asarray(jax.jit(jax.shard_map(
            lambda g, p: jax.lax.psum(_semantic_confusion(g, p), "dp"),
            mesh=mesh, in_specs=(P("dp"), P("dp")),
            out_specs=P()))(gt_d, pr_d))
    else:
        conf = np.asarray(_semantic_confusion(jnp.asarray(gt),
                                              jnp.asarray(pr)))

    stats = SegmentationStats(evaluator._classes)
    for k in evaluator._classes:
        if k == bg:
            continue
        stats.tp[k] = int(conf[k, k])
        stats.fn[k] = int(conf[k, :].sum() - conf[k, k])
        stats.fp[k] = int(conf[:, k].sum() - conf[k, k])
    return stats



# ---------------------------------------------------------------------------
# panoptic segmentation: per-segment matching as sorted segment reductions
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("min_points", "bg_label"))
def _panoptic_frames(gt_key, pred_key, min_points, bg_label):
    """(F, N) int32 segment keys (``label << 16 | id``; out-of-class and
    padding points carry ``bg_label << 16``) -> per-class (256,) panoptic
    counters (itp, ifn, ifp int32; cumiou f64) summed over frames.

    Per frame: one carried sort by (gt, pred) yields the joint pair
    histogram AND the gt-segment sizes as run lengths; a second sort by
    pred yields pred-segment sizes and their VOID (gt==bg) overlaps;
    everything else is segmented reductions + gathers at run starts — no
    hash maps and no per-segment Python (host counterpart:
    ``SegmentationEvaluator._collect_labels_pano``). IoU tests run in
    f64, like the host's Python floats.
    """
    n = gt_key.shape[1]
    iota = jnp.arange(n, dtype=jnp.int32)
    ones = jnp.ones(n, jnp.int32)
    bg = jnp.int32(bg_label)

    def frame_stats(args):
        gk, pk = args
        # ---- sort 1: (gt, pred) pair runs inside gt runs
        gs, ps, idx0 = lax.sort((gk, pk, iota), num_keys=2)
        first = jnp.concatenate([jnp.ones(1, bool), (gs[1:] != gs[:-1])
                                 | (ps[1:] != ps[:-1])])
        pair_id = jnp.cumsum(first.astype(jnp.int32)) - 1
        pair_count = jax.ops.segment_sum(ones, pair_id, num_segments=n,
                                         indices_are_sorted=True)
        c_pt = pair_count[pair_id]
        firstg = jnp.concatenate([jnp.ones(1, bool), gs[1:] != gs[:-1]])
        g_id = jnp.cumsum(firstg.astype(jnp.int32)) - 1
        g_size = jax.ops.segment_sum(ones, g_id, num_segments=n,
                                     indices_are_sorted=True)
        gsz_pt = g_size[g_id]

        # ---- sort 2: pred segments (sizes + VOID overlap)
        ps2, gs2, idx2 = lax.sort((pk, gk, iota), num_keys=1)
        firstp = jnp.concatenate([jnp.ones(1, bool), ps2[1:] != ps2[:-1]])
        p_id = jnp.cumsum(firstp.astype(jnp.int32)) - 1
        p_size = jax.ops.segment_sum(ones, p_id, num_segments=n,
                                     indices_are_sorted=True)
        void2 = ((gs2 >> 16) == bg).astype(jnp.int32)
        p_void = jax.ops.segment_sum(void2, p_id, num_segments=n,
                                     indices_are_sorted=True)
        psz_pt2 = p_size[p_id]
        bo_pt2 = p_void[p_id]
        # to original point order, then into sort-1 order
        psz_pt = jnp.zeros(n, jnp.int32).at[idx2].set(psz_pt2)[idx0]
        bo_pt = jnp.zeros(n, jnp.int32).at[idx2].set(bo_pt2)[idx0]

        # ---- match test (same value at every point of a pair run)
        gl = gs >> 16
        pl = ps >> 16
        denom = (gsz_pt + psz_pt - c_pt - bo_pt).astype(jnp.float64)
        iou = jnp.where(denom > 0,
                        c_pt.astype(jnp.float64) / jnp.maximum(denom, 1),
                        0.0)
        match_pt = ((gl == pl) & (gl != bg) & (pl != bg)
                    & (gsz_pt >= min_points) & (iou > 0.5))

        cls_rows = jnp.where(first, gl, 256)
        itp = jnp.zeros(257, jnp.int32).at[cls_rows].add(
            (first & match_pt).astype(jnp.int32))[:256]
        cumiou = jnp.zeros(257, jnp.float64).at[cls_rows].add(
            jnp.where(first & match_pt, iou, 0.0))[:256]

        # ---- unmatched gt segments (ifn)
        g_matched = jax.ops.segment_max(match_pt.astype(jnp.int32), g_id,
                                        num_segments=n,
                                        indices_are_sorted=True)
        g_rows = jnp.where(firstg, gl, 256)
        g_cnt = (firstg & (gl != bg) & (gsz_pt >= min_points)
                 & (g_matched[g_id] == 0))
        ifn = jnp.zeros(257, jnp.int32).at[g_rows].add(
            g_cnt.astype(jnp.int32))[:256]

        # ---- unmatched pred segments (ifp): pair match flag -> point
        # order -> pred-sorted order -> per-pred-segment max
        pairm = jax.ops.segment_max(match_pt.astype(jnp.int32), pair_id,
                                    num_segments=n, indices_are_sorted=True)
        m2 = jnp.zeros(n, jnp.int32).at[idx0].set(pairm[pair_id])[idx2]
        p_matched = jax.ops.segment_max(m2, p_id, num_segments=n,
                                        indices_are_sorted=True)
        pl2 = ps2 >> 16
        p_rows = jnp.where(firstp, pl2, 256)
        p_cnt = (firstp & (pl2 != bg) & (psz_pt2 >= min_points)
                 & (p_matched[p_id] == 0))
        ifp = jnp.zeros(257, jnp.int32).at[p_rows].add(
            p_cnt.astype(jnp.int32))[:256]
        return itp, ifn, ifp, cumiou

    itp, ifn, ifp, cumiou = lax.map(frame_stats, (gt_key, pred_key))
    return itp.sum(0), ifn.sum(0), ifp.sum(0), cumiou.sum(0)


def _panoptic_keys(evaluator, labels, ids, nmax, bg):
    """Host packing: (label << 16 | id) int32 keys, out-of-class labels
    and padding routed to the background segment (host counterpart:
    the ``np.where(in_cls, ...)`` key build in _collect_labels_pano)."""
    cls = np.asarray(evaluator._classes)
    f = len(labels)
    out = np.full((max(f, 1), nmax), np.int32(bg) << 16, np.int32)
    for i, (lab, sid) in enumerate(zip(labels, ids)):
        lab = np.asarray(lab, np.uint8)
        sid = np.asarray(sid)
        if sid.dtype != np.uint16:
            raise ValueError("Please convert ids to uint16!")
        key = np.where(np.isin(lab, cls),
                       (lab.astype(np.int32) << 16) | sid.astype(np.int32),
                       np.int32(bg) << 16)
        out[i, :len(key)] = key
    return out


def device_panoptic_stats(evaluator, gt_labels_list, pred_labels_list,
                          gt_ids_list, pred_ids_list, mesh=None):
    """Full panoptic + semantic stats for many frames on device.

    Equivalent to summing ``SegmentationEvaluator.calc_stats(gt, pred,
    gt_ids, pred_ids)`` over the frames — semantic tp/fp/fn from the MXU
    confusion matrix (:func:`device_semantic_stats`) and instance
    itp/ifn/ifp/cumiou from sorted segment reductions — with integer
    counters exact and cumiou accumulated in f64 like the host.

    :param mesh: optional ``jax.sharding.Mesh`` with a ``dp`` axis: frames
        shard over data-parallel devices (shard_map + psum, like the
        semantic path).
    :returns: a mergeable ``SegmentationStats``
    """
    stats = device_semantic_stats(evaluator, gt_labels_list,
                                  pred_labels_list, mesh=mesh)
    bg = evaluator._background
    nmax = max((len(g) for g in gt_labels_list), default=1)
    gk = _panoptic_keys(evaluator, gt_labels_list, gt_ids_list, nmax, bg)
    pk = _panoptic_keys(evaluator, pred_labels_list, pred_ids_list, nmax, bg)
    mp = evaluator._min_points

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = mesh.shape["dp"]
        pad = (-len(gk)) % dp
        if pad:
            filler = np.full((pad, nmax), np.int32(bg) << 16, np.int32)
            gk = np.concatenate([gk, filler])
            pk = np.concatenate([pk, filler])
        sh = NamedSharding(mesh, P("dp"))
        gk_d = jax.device_put(jnp.asarray(gk), sh)
        pk_d = jax.device_put(jnp.asarray(pk), sh)
        out = jax.jit(jax.shard_map(
            lambda g, p: jax.tree.map(
                lambda x: jax.lax.psum(x, "dp"),
                _panoptic_frames(g, p, mp, bg)),
            mesh=mesh, in_specs=(P("dp"), P("dp")), out_specs=P()))(
                gk_d, pk_d)
    else:
        out = _panoptic_frames(jnp.asarray(gk), jnp.asarray(pk), mp, bg)
    itp, ifn, ifp, cumiou = (np.asarray(v) for v in out)

    for k in evaluator._classes:
        if k == bg:
            continue
        stats.itp[k] = int(itp[k])
        stats.ifn[k] = int(ifn[k])
        stats.ifp[k] = int(ifp[k])
        stats.cumiou[k] = float(cumiou[k])
    return stats
