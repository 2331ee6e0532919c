"""Frozen-oracle regression test for the TrackingEvaluator.

``fixtures/tracking_eval_oracle.npz`` stores every counter and metric the
evaluator produced on a deterministic 22-frame synthetic sequence (seed 7,
including empty-gt and empty-dt frames) at the time the fixture was
recorded. Any rewrite of the evaluator internals must reproduce the
integer counters identically and the float metrics to 1e-12 — this pins
the CLEAR-MOT semantics (reference benchmarks.pyx:488-889) across
refactors much harder than the handcrafted scenario tests alone.

Re-record only for an intentional change via
``python tests/tracking_sequence.py`` after proving integer counters are
unchanged against the previous fixture. Record history: re-recorded once
in round 3 when the batched accuracy table replaced per-pair
``np.linalg.norm`` calls — integer counters verified identical, float
metrics moved <= 1.5e-8 (one f32 ulp in the norm inputs).
"""

import os

import numpy as np
import pytest

from tracking_sequence import evaluator_fingerprint, make_tracking_sequence

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "tracking_eval_oracle.npz")


@pytest.mark.parametrize("device_match", [False, True])
def test_tracking_evaluator_matches_frozen_oracle(device_match):
    from d3d_tpu.benchmarks import TrackingEvaluator

    classes, gts, dts = make_tracking_sequence(seed=7, nframes=20)
    ev = TrackingEvaluator(classes, [0.7, 0.5, 0.5])
    for g, d in zip(gts, dts):
        ev.add_stats(ev.calc_stats(g, d, device_match=device_match))
    got = evaluator_fingerprint(ev)

    want = dict(np.load(FIXTURE))
    assert set(got) == set(want)
    # the device path computes the f32 IoU matrix with a different (but
    # equally valid) op ordering — accuracy aggregates may differ in the
    # last f32 bits; every integer counter must still match exactly
    atol = 1e-6 if device_match else 1e-12
    for key in sorted(want):
        g, w = got[key], want[key]
        assert g.shape == w.shape, key
        if np.issubdtype(w.dtype, np.integer):
            np.testing.assert_array_equal(g, w, err_msg=key)
        else:
            np.testing.assert_allclose(g, w, rtol=0, atol=atol,
                                       equal_nan=True, err_msg=key)


def test_sequence_batched_tables_identical():
    """calc_stats_sequence (all frames' device tables precomputed in
    chunked vmapped dispatches) must produce the IDENTICAL evaluator
    fingerprint as the per-frame device_match loop."""
    from d3d_tpu.benchmarks import TrackingEvaluator

    classes, gts, dts = make_tracking_sequence(seed=11, nframes=14)
    ev_a = TrackingEvaluator(classes, [0.5, 0.5, 0.5])
    for g, d in zip(gts, dts):
        ev_a.add_stats(ev_a.calc_stats(g, d, device_match=True))
    ev_b = TrackingEvaluator(classes, [0.5, 0.5, 0.5])
    ev_b.calc_stats_sequence(gts, dts, chunk=5)  # non-divisor chunk

    fa = evaluator_fingerprint(ev_a)
    fb = evaluator_fingerprint(ev_b)
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=k)


def test_sequence_tables_respect_calib():
    """Tables must be computed AFTER the dt->gt frame transform: with dt
    frames handed over in a shifted 'ego' frame plus a calib, the
    sequence path must fingerprint-match the per-frame device path (which
    transforms inside calc_stats). Regression: precompute_tables used to
    read the untransformed dt boxes, silently mis-matching."""
    from d3d_tpu.abstraction import TransformSet
    from d3d_tpu.benchmarks import TrackingEvaluator

    classes, gts, dts = make_tracking_sequence(seed=3, nframes=8)
    ts = TransformSet("velo")
    ts.set_intrinsic_lidar("velo")
    ts.set_intrinsic_lidar("ego")
    t = np.eye(4)
    t[:3, 3] = [5.0, -2.0, 0.25]
    ts.set_extrinsic(t, frame_to="ego")
    dts_ego = [ts.transform_objects(d, frame_to="ego") for d in dts]
    assert all(d.frame == "ego" for d in dts_ego)

    ev_a = TrackingEvaluator(classes, [0.5, 0.5, 0.5])
    for g, d in zip(gts, dts_ego):
        ev_a.add_stats(ev_a.calc_stats(g, d, calib=ts, device_match=True))
    ev_b = TrackingEvaluator(classes, [0.5, 0.5, 0.5])
    ev_b.calc_stats_sequence(gts, dts_ego, calib=ts, chunk=3)

    fa = evaluator_fingerprint(ev_a)
    fb = evaluator_fingerprint(ev_b)
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=k)

    with pytest.raises(ValueError, match="Calibration"):
        TrackingEvaluator(classes, [0.5, 0.5, 0.5]).calc_stats_sequence(
            gts, dts_ego, calib=None)


def test_multi_sequence_no_id_leak():
    """Two sequences with OVERLAPPING tid spaces (KITTI restarts ids per
    sequence) evaluated back-to-back on one evaluator must equal two
    fresh evaluators merged via add_stats — no fabricated switches at
    the boundary."""
    from d3d_tpu.benchmarks import TrackingEvaluator

    classes, gts1, dts1 = make_tracking_sequence(seed=21, nframes=6)
    _, gts2, dts2 = make_tracking_sequence(seed=22, nframes=6)

    ev = TrackingEvaluator(classes, [0.5, 0.5, 0.5])
    ev.calc_stats_sequence(gts1, dts1)
    ev.calc_stats_sequence(gts2, dts2)

    ref = TrackingEvaluator(classes, [0.5, 0.5, 0.5])
    ref.calc_stats_sequence(gts1, dts1)
    ref2 = TrackingEvaluator(classes, [0.5, 0.5, 0.5])
    ref2.calc_stats_sequence(gts2, dts2)
    # merge the second evaluator's accumulated stats into the first
    ref.add_stats(ref2._stats)

    fa = evaluator_fingerprint(ev)
    fb = evaluator_fingerprint(ref)
    assert fa.keys() == fb.keys()
    for k in fa:
        a, b = fa[k], fb[k]
        if np.issubdtype(np.asarray(b).dtype, np.integer):
            np.testing.assert_array_equal(a, b, err_msg=k)
        else:
            # the wmean accuracy merge reorders f64 ops vs per-frame
            # accumulation — identical to rounding
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-9,
                                       equal_nan=True, err_msg=k)


@pytest.mark.parametrize("seed", [41, 42])
def test_device_bookkeeping_scan_identical(seed):
    """The lax.scan CLEAR-MOT chain (device_bookkeeping=True, the
    default) must fingerprint-match the per-frame host-pass-1 path
    (device_bookkeeping=False) exactly — the scan reproduces pass-1
    preservation, greedy matching and the carried assignment state on
    device."""
    from d3d_tpu.benchmarks import TrackingEvaluator

    classes, gts, dts = make_tracking_sequence(seed=seed, nframes=10)
    ev_a = TrackingEvaluator(classes, [0.5, 0.5, 0.5])
    ev_a.calc_stats_sequence(gts, dts, chunk=4, device_bookkeeping=False)
    ev_b = TrackingEvaluator(classes, [0.5, 0.5, 0.5])
    ev_b.calc_stats_sequence(gts, dts, chunk=4, device_bookkeeping=True)

    fa = evaluator_fingerprint(ev_a)
    fb = evaluator_fingerprint(ev_b)
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=k)


def test_duplicate_tid_fallback_chunk():
    """A frame with duplicate dt tids routes its whole chunk through the
    proven per-frame path (host dict bookkeeping is order-dependent
    there) while neighboring chunks still use the scan — the mixed run
    must fingerprint-match the all-per-frame run, including the carry
    reconstruction across the fallback boundary."""
    from d3d_tpu.benchmarks import TrackingEvaluator

    classes, gts, dts = make_tracking_sequence(seed=51, nframes=12,
                                               with_empty_frames=False)
    # duplicate a dt tid mid-sequence (frame 5 lands in chunk [4:8))
    dup = dts[5][0]
    clone = type(dup)(
        np.asarray(dup.position) + 0.1, dup.orientation,
        np.asarray(dup.dimension), dup.velocity, dup.angular_velocity,
        dup.tag, tid=dup.tid)
    dts[5].append(clone)

    ev_a = TrackingEvaluator(classes, [0.5, 0.5, 0.5])
    ev_a.calc_stats_sequence(gts, dts, chunk=4, device_bookkeeping=False)
    ev_b = TrackingEvaluator(classes, [0.5, 0.5, 0.5])
    ev_b.calc_stats_sequence(gts, dts, chunk=4, device_bookkeeping=True)

    fa = evaluator_fingerprint(ev_a)
    fb = evaluator_fingerprint(ev_b)
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=k)


def test_windowed_continuation():
    """continue_sequence=True: streaming one sequence through windowed
    calc_stats_sequence calls must fingerprint-match the single call
    (id state carries across the window boundary)."""
    from d3d_tpu.benchmarks import TrackingEvaluator

    classes, gts, dts = make_tracking_sequence(seed=31, nframes=12)
    ev_a = TrackingEvaluator(classes, [0.5, 0.5, 0.5])
    ev_a.calc_stats_sequence(gts, dts)
    ev_b = TrackingEvaluator(classes, [0.5, 0.5, 0.5])
    ev_b.calc_stats_sequence(gts[:6], dts[:6])
    ev_b.calc_stats_sequence(gts[6:], dts[6:], continue_sequence=True)

    fa = evaluator_fingerprint(ev_a)
    fb = evaluator_fingerprint(ev_b)
    for k in fa:
        a, b = fa[k], fb[k]
        if np.issubdtype(np.asarray(b).dtype, np.integer):
            np.testing.assert_array_equal(a, b, err_msg=k)
        else:
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-9,
                                       equal_nan=True, err_msg=k)
