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
    "shard_inference",
    "make_mesh", "batch_sharding", "replicate_sharding", "bev_sharding",
    "spatial_constrain", "shard_train_step",
    "stats_to_arrays", "arrays_to_stats", "reduce_stats_arrays",
]


def make_mesh(n_devices=None, dp=None, tp=None, sp=None, devices=None):
    """Create a ('dp', 'sp', 'tp') mesh over the available devices.

    ``sp`` is the SPATIAL axis (default 1): BEV canvases shard their
    x-row dimension over it (see :func:`spatial_constrain`) and XLA's
    SPMD partitioner inserts the conv halo exchanges. By default tp = 2
    when the remaining device count is even (and > 1), else 1.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    n = len(devices)
    if sp is None:
        sp = 1
    assert n % sp == 0, "sp must divide the device count"
    nd = n // sp
    if tp is None:
        # an explicit dp fixes tp = nd // dp (a tp=2 default would make
        # make_mesh(dp=n) impossible); otherwise default tp to 2 when even
        tp = nd // dp if dp is not None \
            else (2 if nd % 2 == 0 and nd > 1 else 1)
    if dp is None:
        dp = nd // tp
    assert dp * sp * tp == n, "dp * sp * tp must equal the device count"
    arr = np.asarray(devices).reshape(dp, sp, tp)
    return Mesh(arr, axis_names=("dp", "sp", "tp"))


def batch_sharding(mesh):
    """Shard the leading (batch) dimension over dp; replicate over tp."""
    return NamedSharding(mesh, P("dp"))


def replicate_sharding(mesh):
    return NamedSharding(mesh, P())


def bev_sharding(mesh):
    """Sharding of a (B, W, H, C) BEV canvas: batch over dp, x-rows over
    the spatial axis when the mesh has one."""
    return NamedSharding(mesh, P("dp", "sp") if "sp" in mesh.shape
                         else P("dp"))


def spatial_constrain(mesh):
    """Activation-sharding hook for the model constructors (the
    ``constrain`` attribute of :class:`~d3d_tpu.models.PointPillars` and
    friends): constrains every BEV-shaped activation to
    ``P('dp', 'sp')`` so the 2D conv backbone runs spatially partitioned
    — XLA's SPMD partitioner materializes the kernel-radius halo
    exchanges between 'sp' neighbors, the TPU-native counterpart of
    manually splitting a canvas that outgrows one chip's HBM.

    Returns ``(x, kind) -> x``; kinds other than ``"bev"`` pass through
    so the same hook can be handed to any model."""
    bev = bev_sharding(mesh)

    def con(x, kind):
        # rank-4 only: a (B, W, H, C) canvas. Unbatched rank-3 views (a
        # model applied under vmap, e.g. shard_inference's per-device
        # pipeline) pass through — the leading axes would not line up.
        if kind == "bev" and x.ndim == 4:
            return jax.lax.with_sharding_constraint(x, bev)
        return x

    return con


def expert_constrain(mesh, axis="ep"):
    """Hook for :func:`d3d_tpu.parallel.moe.moe_mlp` inside flax modules:
    constrains the dispatched ``(G, E, cap, ...)`` expert blocks to
    ``P(None, axis)`` (expert axis over the mesh's expert ranks) so XLA
    partitions the expert compute."""
    sh = NamedSharding(mesh, P(None, axis))

    def con(t):
        return jax.lax.with_sharding_constraint(t, sh)

    return con


def _path_str(path):
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                    for p in path)


def param_partition_spec(path, leaf, tp_size, ep_size=1):
    """Explicit per-leaf tensor/expert-parallel rule (replaces the
    round-1 shape heuristic, which silently replicated on a miss).

    Every flax ``Dense``/``Conv``/``ConvTranspose`` weight is named
    ``kernel`` with the output-channel axis last; those shard their output
    channels over ``tp`` whenever divisible. Stacked Switch-MoE expert
    weights (``moe_w1/b1/w2/b2``, leading expert axis — see
    :mod:`d3d_tpu.parallel.moe`) shard that axis over ``ep`` whenever
    the mesh has one (the router replicates: every rank routes). Norm
    scale/bias, biases, batch-stat vectors and anything 1-D replicate
    (they are KiB-scale). A kernel whose output channels do NOT divide
    tp_size replicates — see :func:`tp_param_report` to audit exactly
    which leaves partitioned.
    """
    name = str(getattr(path[-1], "key", "")) if path else ""
    if name.startswith("moe_") and name != "moe_router" \
            and ep_size > 1 and leaf.ndim >= 1 \
            and leaf.shape[0] % ep_size == 0:
        return P(*(["ep"] + [None] * (leaf.ndim - 1)))
    if name == "kernel" and leaf.ndim >= 2 and tp_size > 1 \
            and leaf.shape[-1] % tp_size == 0:
        return P(*([None] * (leaf.ndim - 1) + ["tp"]))
    return P()


def tp_param_report(params, mesh):
    """Audit the tp/ep layout: returns (sharded_paths,
    replicated_kernel_paths) so a silent all-replicated layout is
    detectable instead of silent."""
    tp = dict(mesh.shape).get("tp", 1)
    ep = dict(mesh.shape).get("ep", 1)
    sharded, repl_kernels = [], []
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        spec = param_partition_spec(path, leaf, tp, ep)
        name = str(getattr(path[-1], "key", "")) if path else ""
        if any(ax in ("tp", "ep") for ax in spec):
            sharded.append(_path_str(path))
        elif name == "kernel":
            repl_kernels.append(_path_str(path))
    return sharded, repl_kernels


def shard_train_step(train_step, mesh, donate=True, check_tp=True):
    """jit a train step over the mesh: params/opt-state sharded by
    :func:`param_partition_spec` (output channels over tp), batch over dp.

    The step signature is ``(params, batch_stats, opt_state, batch)`` from
    :func:`d3d_tpu.models.pointpillars.make_train_step`.

    :param check_tp: when the mesh has tp > 1, raise if NO parameter leaf
        actually partitions over tp (an all-replicated layout would silently
        waste the axis).
    """
    batch_sh = NamedSharding(mesh, P("dp"))
    tp = dict(mesh.shape).get("tp", 1)
    ep = dict(mesh.shape).get("ep", 1)

    def spec_of(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: NamedSharding(
                mesh, param_partition_spec(path, leaf, tp, ep)),
            tree)

    def wrapped(params, batch_stats, opt_state, batch):
        if check_tp and tp > 1:
            # specifically tp: an ep-sharded MoE leaf must not mask an
            # entirely wasted tensor-parallel axis
            tp_leaves = [
                path for path, leaf
                in jax.tree_util.tree_leaves_with_path(params)
                if any(ax == "tp"
                       for ax in param_partition_spec(path, leaf, tp, ep))]
            if not tp_leaves:
                raise ValueError(
                    "mesh has tp=%d but no parameter partitions over tp; "
                    "check param_partition_spec against this model" % tp)
        params = jax.lax.with_sharding_constraint(params, spec_of(params))
        batch = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, batch_sh), batch)
        return train_step(params, batch_stats, opt_state, batch)

    jitted = jax.jit(wrapped, donate_argnums=(0, 2) if donate else ())
    repl = NamedSharding(mesh, P())
    spec_cache = {}

    def cached_spec(tree, key):
        # the sharding trees are static per pytree structure: build once,
        # not per training step
        struct = jax.tree_util.tree_structure(tree)
        hit = spec_cache.get(key)
        if hit is None or hit[0] != struct:
            spec_cache[key] = (struct, spec_of(tree))
        return spec_cache[key][1]

    def call(params, batch_stats, opt_state, batch):
        # inputs committed to different device assemblies (fresh init on
        # one device, a separately-jitted prep batch, restored state) can't
        # mix inside one jit — place everything on its mesh sharding first
        # (no-op copies when already there)
        params = jax.device_put(params, cached_spec(params, "params"))
        batch_stats = jax.device_put(
            batch_stats, jax.tree.map(lambda _: repl, batch_stats))
        opt_state = jax.device_put(opt_state, cached_spec(opt_state, "opt"))
        batch = jax.device_put(batch, batch_sh)
        return jitted(params, batch_stats, opt_state, batch)

    return call


def shard_inference(device_fn, mesh):
    """Data-parallel batched inference over the mesh's ``dp`` axis.

    Wraps a single-cloud device pipeline (a ``detect.device_fn`` from the
    detector factories, weights closed over) into a callable taking a
    (B, N, F) cloud batch sharded over dp — the serving-throughput
    counterpart of :func:`shard_train_step`. B should be a multiple of
    the dp size; the closed-over weights replicate.
    """
    batch_sh = NamedSharding(mesh, P("dp"))

    @jax.jit
    def run(points_batch):
        pts = jax.lax.with_sharding_constraint(points_batch, batch_sh)
        return jax.vmap(device_fn)(pts)

    def call(points_batch):
        return run(jax.device_put(jnp.asarray(points_batch), batch_sh))

    return call


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
