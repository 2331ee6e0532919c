"""Device-resident velocity-backcast tracker: track state as fixed-slot
arrays, update as ONE jitted program.

:class:`~d3d_tpu.tracking.CenterTracker` keeps its track table in a
Python dict, so every frame pays a host round-trip between the detector
(on device) and the association. This module keeps the whole loop on
the TPU: the state is a pytree of fixed-capacity slot arrays, and
:func:`tracker_update` is a ``lax.scan`` over score-ordered detections
(greedy association is inherently sequential — the scan IS the
algorithm, not a compromise), so detect → track → report is one device
program per frame. Composed with a detector's ``device_fn`` it also
exports to a serving artifact (see :func:`make_tracking_step` and
``d3d_tpu.export``).

Semantics mirror CenterTracker (the CenterPoint velocity-backcast
recipe): detections backcast by ``dt * velocity``, confidence-ordered
greedy nearest-center match gated per class, matched tracks adopt the
detection state, unmatched tracks coast on their last velocity for
``lost_time`` seconds. The one deliberate divergence: the slot table is
finite, so when all ``capacity`` slots are live, the LOWEST-score
leftover detections are dropped instead of growing the table (score
order allocates high-confidence tracks first).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["tracker_init", "tracker_update", "tracker_report",
           "tracker_scan_sequence", "make_tracking_step",
           "DeviceCenterTracker"]


def tracker_init(capacity=128):
    """Empty slot-table state (a pytree of device arrays)."""
    return dict(
        boxes=jnp.zeros((capacity, 7), jnp.float32),
        vel=jnp.zeros((capacity, 3), jnp.float32),
        label=jnp.full((capacity,), -1, jnp.int32),
        score=jnp.zeros((capacity,), jnp.float32),
        tid=jnp.zeros((capacity,), jnp.int32),
        lost=jnp.zeros((capacity,), jnp.float32),
        history=jnp.zeros((capacity,), jnp.float32),
        active=jnp.zeros((capacity,), bool),
        next_tid=jnp.int32(1),
    )


@jax.jit
def tracker_update(state, boxes, scores, labels, vel, valid, dt,
                   thresholds, lost_time):
    """One frame: associate, adopt, coast, prune — all on device.

    :param boxes: (D, 7) [x y z l w h yaw] detections (padded rows ok)
    :param vel: (D, 3) velocities — xy drive the backcast, the full
        vector drives coasting (a (D, 2) input is zero-padded)
    :param valid: (D,) bool admission mask (score threshold, NMS keep)
    :param dt: seconds since the previous frame (0 on the first)
    :param thresholds: (L,) per-class-label association gates (m);
        labels clip into it, so a scalar-broadcast array also works
    :param lost_time: scalar seconds before an unmatched track is pruned
    :returns: the new state
    """
    cap = state["boxes"].shape[0]
    active0 = state["active"]
    dt = jnp.asarray(dt, jnp.float32)
    if vel.shape[-1] == 2:
        vel = jnp.concatenate(
            [vel, jnp.zeros((vel.shape[0], 1), vel.dtype)], axis=-1)
    order = jnp.argsort(jnp.where(valid, -scores, jnp.inf), stable=True)

    def step(carry, i):
        st, consumed = carry
        b, v = boxes[i], vel[i]
        lab, sc, ok_det = labels[i].astype(jnp.int32), scores[i], valid[i]
        back = b[:2] - dt * v[:2]
        dist = jnp.linalg.norm(back[None, :] - st["boxes"][:, :2], axis=-1)
        cand = jnp.where(st["active"] & ~consumed & (st["label"] == lab),
                         dist, jnp.inf)
        j = jnp.argmin(cand)
        thr = thresholds[jnp.clip(lab, 0, thresholds.shape[0] - 1)]
        is_match = jnp.isfinite(cand[j]) & (cand[j] <= thr) & ok_det
        free = jnp.argmin(st["active"])            # first inactive slot
        have_free = ~jnp.all(st["active"])
        is_new = ok_det & ~is_match & have_free
        slot = jnp.where(is_match, j, free)
        write = is_match | is_new

        def w(field, val):
            return st[field].at[slot].set(
                jnp.where(write, val, st[field][slot]))

        st = dict(
            st,
            boxes=w("boxes", b), vel=w("vel", v), label=w("label", lab),
            score=w("score", sc),
            tid=w("tid", jnp.where(is_match, st["tid"][slot],
                                   st["next_tid"])),
            lost=w("lost", 0.0),
            history=w("history",
                      jnp.where(is_match, st["history"][slot] + dt, 0.0)),
            active=st["active"].at[slot].set(st["active"][slot] | write),
            next_tid=st["next_tid"] + is_new.astype(jnp.int32),
        )
        # a slot touched this frame (matched OR freshly allocated) is
        # not associable again — new tracks don't exist for this frame's
        # later detections, exactly like the host tracker
        consumed = consumed.at[slot].set(consumed[slot] | write)
        return (st, consumed), None

    (st, consumed), _ = jax.lax.scan(
        step, (state, jnp.zeros(cap, bool)), order)

    # unmatched pre-existing tracks coast on their last (3D) velocity
    coast = active0 & ~consumed
    xyz = st["boxes"][:, :3] + dt * st["vel"]
    st["boxes"] = jnp.where(coast[:, None],
                            st["boxes"].at[:, :3].set(xyz), st["boxes"])
    st["lost"] = jnp.where(coast, st["lost"] + dt, st["lost"])
    st["history"] = jnp.where(coast, 0.0, st["history"])
    st["active"] = st["active"] & ~(st["lost"] > lost_time)
    return st


def tracker_report(state, classes, frame=None, timestamp=0):
    """Current tracks as a ``Target3DArray`` of ``TrackingTarget3D``
    (one host fetch of the slot table; columnar assembly)."""
    from ..abstraction import ObjectTag, Target3DArray, TrackingTarget3D

    st = jax.tree.map(np.asarray, state)
    m = st["active"]
    boxes = st["boxes"][m]
    n = len(boxes)
    y = boxes[:, 6].astype(np.float64)
    quats = np.zeros((n, 4), np.float32)
    quats[:, 2] = np.sin(y / 2)
    quats[:, 3] = np.cos(y / 2)
    vel3 = np.ascontiguousarray(st["vel"][m], np.float32)
    cols = dict(
        position=np.ascontiguousarray(boxes[:, 0:3], np.float32),
        dimension=np.ascontiguousarray(boxes[:, 3:6], np.float32),
        quat=quats,
        position_var=np.zeros((n, 3, 3), np.float32),
        dimension_var=np.zeros((n, 3, 3), np.float32),
        velocity=vel3,
        angular_velocity=np.zeros((n, 3), np.float32),
        velocity_var=np.zeros((n, 3, 3), np.float32),
        angular_velocity_var=np.zeros((n, 3, 3), np.float32),
    )
    tags = [ObjectTag(cls := classes[int(l)], type(cls), float(s))
            for l, s in zip(st["label"][m], st["score"][m])]
    return Target3DArray._from_backed_columns(
        TrackingTarget3D, cols, tags, np.zeros(n, np.float32),
        tids=st["tid"][m].astype(np.uint64),
        histories=st["history"][m],
        frame=frame, timestamp=timestamp)


@jax.jit
def tracker_scan_sequence(state, boxes, scores, labels, vel, valid, dts,
                          thresholds, lost_time):
    """Track a WHOLE sequence in one device dispatch: ``lax.scan`` of
    :func:`tracker_update` over the frame axis.

    :param boxes: (F, D, 7); ``scores``/``labels``/``valid`` (F, D);
        ``vel`` (F, D, 2 or 3); ``dts`` (F,) seconds since the previous
        frame (0 for the first)
    :returns: ``(final_state, per_frame_states)`` — the per-frame states
        are stacked snapshots AFTER each frame (slot tables; fetch once
        and slice per frame for reports/evaluation)
    """
    thresholds = jnp.asarray(thresholds, jnp.float32).reshape(-1)
    lost_time = jnp.asarray(lost_time, jnp.float32)

    def step(st, frame):
        b, s, l, v, va, dt = frame
        st = tracker_update(st, b, s, l, v, va, dt, thresholds,
                            lost_time)
        return st, st

    return jax.lax.scan(step, state,
                        (boxes, scores, labels, vel, valid, dts))


def make_tracking_step(device_fn, thresholds, lost_time=0.3,
                       capacity=128, score_threshold=0.3):
    """Fuse a detector's ``device_fn`` with the tracker into ONE jitted
    ``step(state, points, dt) -> (state, (boxes, scores, labels, keep,
    vel))`` — the serving loop body (exportable via ``d3d_tpu.export``,
    state threaded by the caller). The detector must emit the 5-output
    velocity contract (``predict_velocity`` CenterPoint or a TTA wrap
    of one).

    :param score_threshold: admission gate on top of the detector's NMS
        ``keep`` — the device_fn's keep mask carries NO score cut (that
        normally happens host-side in ``_to_targets``), and without one
        every low-score candidate would allocate a track and saturate
        the slot table."""
    thresholds = jnp.asarray(thresholds, jnp.float32).reshape(-1)
    lt = jnp.float32(lost_time)
    st_gate = jnp.float32(score_threshold)

    @jax.jit
    def step(state, points, dt):
        out = device_fn(points)
        boxes, scores, labels, keep = out[:4]
        vel = out[4] if len(out) > 4 else jnp.zeros(
            (boxes.shape[0], 3), jnp.float32)
        scores = scores.astype(jnp.float32)
        admit = keep & (scores >= st_gate)
        state = tracker_update(state, boxes, scores, labels,
                               vel, admit, dt, thresholds, lt)
        return state, (boxes, scores, labels, keep, vel)

    step.init = partial(tracker_init, capacity)
    return step


class DeviceCenterTracker:
    """Drop-in :class:`~d3d_tpu.tracking.CenterTracker` API over the
    device state (same constructor contract; per-class dict thresholds
    are densified over the class values seen in ``classes``)."""

    def __init__(self, classes, distance_threshold=1.0, lost_time=0.3,
                 capacity=128):
        self._classes = list(classes)
        # device labels index into classes -> index-aligned gate array
        self._thr = jnp.asarray(
            [float(distance_threshold[int(getattr(c, "value", c))]
                   if isinstance(distance_threshold, dict)
                   else distance_threshold)
             for c in self._classes], jnp.float32)
        self._lost_time = jnp.float32(lost_time)
        self._state = tracker_init(capacity)
        self._last_ts = None
        self._last_ts_us = 0
        self._last_frame = None

    @property
    def tracked_ids(self):
        st = jax.tree.map(np.asarray, self._state)
        return [int(t) for t in st["tid"][st["active"]]]

    def reset(self):
        """Start a fresh sequence: empty slot table, timestamps
        cleared (tids keep counting up — uniqueness across sequences)."""
        nt = self._state["next_tid"]
        cap = self._state["boxes"].shape[0]
        self._state = dict(tracker_init(cap), next_tid=nt)
        self._last_ts = None
        self._last_ts_us = 0
        self._last_frame = None

    def update(self, detections):
        """Feed a frame (``Target3DArray``, timestamp in microseconds;
        elements with a ``velocity`` attribute backcast by it).
        Detections whose class is not in ``classes`` are ignored (the
        device label table is fixed at construction)."""
        ts = detections.timestamp / 1e6
        self._last_ts_us = detections.timestamp
        self._last_frame = detections.frame
        dt = 0.0 if self._last_ts is None else ts - self._last_ts
        self._last_ts = ts

        cols = detections.columns() if len(detections) else None
        lut = {int(getattr(c, "value", c)): i
               for i, c in enumerate(self._classes)}
        if cols is not None:
            known = np.asarray([int(l) in lut for l in cols["label"]],
                               bool)
        n = int(known.sum()) if cols is not None else 0
        # bucket the row count so variable-length frames share compiles
        npad = int(np.ceil(max(n, 1) / 32) * 32)
        boxes = np.zeros((npad, 7), np.float32)
        vel = np.zeros((npad, 3), np.float32)
        labels = np.zeros(npad, np.int32)
        scores = np.zeros(npad, np.float32)
        valid = np.zeros(npad, bool)
        valid[:n] = True
        if n:
            boxes[:n, :3] = cols["position"][known]
            boxes[:n, 3:6] = cols["dimension"][known]
            boxes[:n, 6] = cols["yaw"][known]
            if "velocity" in cols:
                vel[:n] = cols["velocity"][known]
            labels[:n] = [lut[int(l)]
                          for l in cols["label"][known]]
            scores[:n] = cols["score"][known]
        self._state = tracker_update(
            self._state, jnp.asarray(boxes), jnp.asarray(scores),
            jnp.asarray(labels), jnp.asarray(vel),
            jnp.asarray(valid), jnp.float32(dt), self._thr,
            self._lost_time)

    def report(self):
        return tracker_report(self._state, self._classes,
                              self._last_frame, self._last_ts_us)
