"""Multi-host (pod / multi-slice) scale-out.

The reference's cross-machine story is "pickle evaluator stats and merge
on one process" (reference d3d/dataset/base.py:657-744 multiprocessing
pools); the TPU-native equivalent spans hosts with ``jax.distributed`` +
GSPMD:

  * :func:`initialize` wires up the JAX distributed runtime (on Cloud TPU
    pods the coordinator/process count auto-detect from the metadata
    server, so all arguments are optional);
  * :func:`make_global_mesh` builds a ``('dp', 'tp')`` mesh over every
    chip in the job, laid out so ``tp`` collectives ride ICI within a
    slice while only ``dp`` gradient all-reduces cross the slower DCN
    links between slices (``mesh_utils.create_hybrid_device_mesh``);
  * :func:`all_hosts_stats` merges per-host evaluator stats globally (the
    dense-array wmean merge of :mod:`d3d_tpu.parallel.mesh` over a
    process-spanning all-gather).

Single-process (tests, one chip, CPU meshes) every function degrades to
its local equivalent — no distributed runtime required.
"""

import numpy as np
import jax

from .mesh import Mesh

__all__ = ["initialize", "make_global_mesh", "all_hosts_stats",
           "process_count", "process_index"]


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               **kwargs):
    """Start the JAX distributed runtime (idempotent; no-op if already
    initialized or single-process with no coordinator given).

    On Cloud TPU all parameters auto-detect; on other platforms pass
    ``coordinator_address="host:port"``, ``num_processes`` and
    ``process_id`` explicitly.

    The multi-worker environment is detected from the TPU runtime env
    vars, NOT ``jax.default_backend()`` — querying the backend would
    initialize XLA, after which ``jax.distributed.initialize`` refuses to
    run ("must be called before any JAX computations").
    """
    import os

    if num_processes == 1:
        return False
    if (coordinator_address is None and num_processes is None
            and process_id is None):
        # auto-detect path: only meaningful inside a multi-worker TPU job
        tpu_env = any(os.environ.get(k) for k in (
            "TPU_WORKER_HOSTNAMES", "TPU_WORKER_ID", "CLOUD_TPU_TASK_ID",
            "MEGASCALE_COORDINATOR_ADDRESS"))
        if not tpu_env:
            return False
    try:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id, **kwargs)
        return True
    except RuntimeError:
        return False  # already initialized


def process_count():
    return jax.process_count()


def process_index():
    return jax.process_index()


def make_global_mesh(dp=None, tp=None):
    """A ``('dp', 'tp')`` mesh over every device in the job.

    With one slice this is :func:`d3d_tpu.parallel.make_mesh` over the
    global device list. With multiple slices (``num_slices > 1`` from the
    device set), the mesh is hybrid: ``tp`` (and the intra-slice part of
    ``dp``) lay out over ICI, the cross-slice part of ``dp`` over DCN —
    tensor-parallel collectives never cross DCN.
    """
    from jax.experimental import mesh_utils

    devices = jax.devices()
    n = len(devices)
    slices = {getattr(d, "slice_index", 0) for d in devices}
    nslices = max(len(slices), 1)
    per_slice = n // nslices

    if tp is None:
        tp = 2 if per_slice % 2 == 0 and per_slice > 1 else 1
    if dp is None:
        dp = n // tp
    assert dp * tp == n, "dp * tp must equal the global device count"

    if nslices > 1:
        assert dp % nslices == 0, \
            "dp must divide across slices (tp cannot span DCN)"
        arr = mesh_utils.create_hybrid_device_mesh(
            (dp // nslices, tp), (nslices, 1), devices=devices)
        arr = arr.reshape(dp, tp)
    else:
        arr = mesh_utils.create_device_mesh((dp, tp), devices=devices)
    return Mesh(arr, axis_names=("dp", "tp"))


def all_hosts_stats(stats, classes, evaluator_cls=None):
    """Merge per-host evaluator stats across every process in the job.

    :param stats: this host's DetectionEvalStats (the dense detection
        fields; TrackingEvalStats' extra per-trajectory tables are
        variable-width per host and keep the host-side add_stats path)
    :param classes: the evaluator's class-value list
    :returns: the globally merged stats object (identical on all hosts)

    Single-process this returns an unchanged copy. Multi-process it
    all-gathers the dense stat arrays over hosts and reduces with the
    tp-weighted wmean merge — equivalent to every host calling
    ``add_stats`` with every other host's partials.
    """
    from jax.experimental import multihost_utils

    from .mesh import arrays_to_stats, stats_to_arrays

    arrays = stats_to_arrays(stats, classes)
    if jax.process_count() == 1:
        return arrays_to_stats(
            {k: np.asarray(v) for k, v in arrays.items()}, classes,
            stats_cls=type(stats))

    host = {k: np.asarray(v) for k, v in arrays.items()}
    gathered = multihost_utils.process_allgather(host)  # leading host axis
    return arrays_to_stats(merge_stacked_stats(gathered), classes,
                           stats_cls=type(stats))


def merge_stacked_stats(gathered):
    """Reduce stacked per-host stat arrays (leading host axis) — the numpy
    twin of :func:`d3d_tpu.parallel.reduce_stats_arrays` (which runs the
    same counters-sum / tp-weighted-mean formula as device collectives);
    a change to one merge rule must be mirrored in the other."""
    tp = np.asarray(gathered["tp"])  # (H, C, S)
    out = {}
    for f in ("ngt", "ndt", "tp", "fp", "fn"):
        out[f] = np.asarray(gathered[f]).sum(axis=0)
    tot = np.maximum(out["tp"], 1)
    for f in ("acc_iou", "acc_angular", "acc_dist", "acc_box", "acc_var"):
        weighted = np.where(tp > 0, np.asarray(gathered[f]) * tp, 0.0)
        out[f] = np.where(out["tp"] > 0, weighted.sum(axis=0) / tot, np.nan)
    return out
