"""Multi-chip scale-out for d3d_tpu.

The reference scales out with multiprocessing + pickled evaluator stats
merged by weighted means (SURVEY.md §5.8, reference benchmarks.pyx:288-313,
dataset/base.py:657-744). The TPU-native equivalent is a
``jax.sharding.Mesh``:

  * training: batch sharded over the ``dp`` axis, wide channel/anchor
    dimensions over ``tp`` — annotated with NamedSharding and left to GSPMD
    to insert the all-reduces over ICI;
  * evaluation: the dense per-(class, threshold) stat vectors (see
    d3d_tpu.benchmarks) are reduced with one ``psum`` — the reference's
    "dict-of-vectors merged by weighted mean" maps onto it directly.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh", "batch_sharding", "replicate_sharding", "shard_train_step",
    "stats_to_arrays", "arrays_to_stats", "reduce_stats_arrays",
]


def make_mesh(n_devices=None, dp=None, tp=None, devices=None):
    """Create a ('dp', 'tp') mesh over the available devices.

    By default tp = 2 when the device count is even (and > 1), else 1.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    n = len(devices)
    if tp is None:
        tp = 2 if n % 2 == 0 and n > 1 else 1
    if dp is None:
        dp = n // tp
    assert dp * tp == n, "dp * tp must equal the device count"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def batch_sharding(mesh):
    """Shard the leading (batch) dimension over dp; replicate over tp."""
    return NamedSharding(mesh, P("dp"))


def replicate_sharding(mesh):
    return NamedSharding(mesh, P())


def _param_spec(path, leaf):
    """Shard wide trailing dims of conv/dense kernels over tp."""
    if leaf.ndim >= 2 and leaf.shape[-1] % 2 == 0 and leaf.shape[-1] >= 64:
        return P(*([None] * (leaf.ndim - 1) + ["tp"]))
    return P()


def shard_train_step(train_step, mesh, donate=True):
    """jit a train step over the mesh: params/opt-state sharded by
    :func:`_param_spec` (channel dims over tp), batch over dp.

    The step signature is ``(params, batch_stats, opt_state, batch)`` from
    :func:`d3d_tpu.models.pointpillars.make_train_step`.
    """
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("dp"))

    def spec_of(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: NamedSharding(mesh, _param_spec(path, leaf)),
            tree)

    def wrapped(params, batch_stats, opt_state, batch):
        params = jax.lax.with_sharding_constraint(params, spec_of(params))
        batch = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, batch_sh), batch)
        return train_step(params, batch_stats, opt_state, batch)

    return jax.jit(wrapped, donate_argnums=(0, 2) if donate else ())


# ---------------------------------------------------------------------------
# distributed evaluator-stat reduction
# ---------------------------------------------------------------------------

def stats_to_arrays(stats, classes):
    """DetectionEvalStats -> dict of dense arrays stacked over classes
    (shape (C,) / (C, nsamples)) suitable for psum/jnp reduction."""
    out = {
        "ngt": jnp.asarray([stats.ngt[k] for k in classes]),
        "ndt": jnp.asarray(np.stack([stats.ndt[k] for k in classes])),
        "tp": jnp.asarray(np.stack([stats.tp[k] for k in classes])),
        "fp": jnp.asarray(np.stack([stats.fp[k] for k in classes])),
        "fn": jnp.asarray(np.stack([stats.fn[k] for k in classes])),
    }
    for f in ("acc_iou", "acc_angular", "acc_dist", "acc_box", "acc_var"):
        out[f] = jnp.asarray(np.stack([getattr(stats, f)[k] for k in classes]))
    return out


def arrays_to_stats(arrays, classes, stats_cls=None):
    """Inverse of :func:`stats_to_arrays`."""
    from ..benchmarks import DetectionEvalStats

    stats = (stats_cls or DetectionEvalStats)()
    stats.ngt = {k: int(arrays["ngt"][i]) for i, k in enumerate(classes)}
    for f in ("ndt", "tp", "fp", "fn"):
        setattr(stats, f, {k: np.asarray(arrays[f][i])
                           for i, k in enumerate(classes)})
    for f in ("acc_iou", "acc_angular", "acc_dist", "acc_box", "acc_var"):
        setattr(stats, f, {k: np.asarray(arrays[f][i])
                           for i, k in enumerate(classes)})
    return stats


def reduce_stats_arrays(arrays, axis_name):
    """Merge per-device partial stats inside a shard_map/pmap context:
    counters psum, accuracies tp-weighted mean (the reference's wmean merge,
    benchmarks.pyx:288-313, as a collective)."""
    tp_local = arrays["tp"]
    out = {}
    for f in ("ngt", "ndt", "tp", "fp", "fn"):
        out[f] = jax.lax.psum(arrays[f], axis_name)
    tp_total = jnp.maximum(out["tp"], 1)
    for f in ("acc_iou", "acc_angular", "acc_dist", "acc_box", "acc_var"):
        weighted = jnp.where(tp_local > 0, arrays[f] * tp_local, 0.0)
        s = jax.lax.psum(weighted, axis_name)
        cnt = out["tp"]
        out[f] = jnp.where(cnt > 0, s / tp_total, jnp.nan)
    return out
