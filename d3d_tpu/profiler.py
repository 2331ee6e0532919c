"""Profiling utilities (reference d3d/profiler.py — its timer synchronizes
CUDA; here the device sync is ``jax.block_until_ready`` over live arrays and
the leak tracker walks jax arrays instead of torch tensors). For full device
traces use :func:`trace` which wraps ``jax.profiler``."""

import gc
import logging
import time
import weakref
from contextlib import contextmanager

_timers = {}
_logger = logging.getLogger("d3d_tpu.profiler")

__all__ = ["tap_time", "tap_arrays", "trace", "ArrayRef"]


def tap_time(name, clear=True, report=True, sync=None):
    """Paired-call wall timer: the first call with a name starts the timer,
    the second stops it and returns the elapsed seconds.

    :param sync: optional array (tree) to ``block_until_ready`` before
        sampling the clock — pass your step outputs for accurate device time
    """
    if sync is not None:
        import jax

        jax.block_until_ready(sync)
    if name not in _timers:
        _timers[name] = time.perf_counter()
        return 0
    elapsed = time.perf_counter() - _timers[name]
    if clear:
        del _timers[name]
    if report:
        _logger.debug("Elapsed time for %s: %.4f", name, elapsed)
    return elapsed


class ArrayRef:
    """Weak-ish reference to a jax array with a printable summary.

    Arrays that reject weakref are marked untracked — treating them as
    permanently released made tap_arrays report a live array as released
    on one call and new on the next, forever (round-2 review finding)."""

    def __init__(self, array):
        try:
            self._ref = weakref.ref(array)
            self.trackable = True
        except TypeError:  # jax arrays are not always weakref-able
            self._ref = lambda: None
            self.trackable = False
        self._id = id(array)
        self._summary = (f"<Array, dtype={array.dtype}, "
                         f"shape={list(array.shape)}>")

    def __hash__(self):
        return self._id

    def __eq__(self, other):
        if isinstance(other, ArrayRef):
            return self._id == other._id
        return self._ref() is other

    def __str__(self):
        return self._summary

    def released(self):
        return self.trackable and self._ref() is None


_arrays = {}  # id -> ArrayRef (jax arrays are unhashable)


def tap_arrays(report=False):
    """Diff live jax arrays since the last call (device-memory leak hunting,
    the analogue of the reference's ``tap_tensors``)."""
    import jax

    live = [obj for obj in gc.get_objects()
            if isinstance(obj, jax.Array) and id(obj) not in _arrays]
    dead = [key for key, ref in _arrays.items() if ref.released()]

    if report:
        _logger.debug("========== %d new arrays, %d released arrays ==========",
                      len(live), len(dead))
    if len(live) > 50:
        _logger.debug("(Array list suppressed)")
        report = False
    for arr in live:
        ref = ArrayRef(arr)
        if report:
            _logger.debug("+%s", ref)
        _arrays[id(arr)] = ref
    for key in dead:
        if report:
            _logger.debug("-%s", _arrays[key])
        del _arrays[key]
    return live, dead


@contextmanager
def trace(log_dir="/tmp/d3d_tpu_trace"):
    """Context manager around ``jax.profiler.trace`` producing a TensorBoard/
    perfetto-compatible device trace."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
