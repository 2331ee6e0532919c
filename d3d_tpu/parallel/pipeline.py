"""GPipe-style pipeline parallelism over a ``pp`` mesh axis.

The reference has no model-parallel strategies at all (SURVEY.md §2.0
"Parallelism strategies ... list is exhaustive"); this is the TPU-native
capability for models whose repeated trunk outgrows one chip: place
stage ``i`` of a shape-homogeneous block stack on pipeline rank ``i``
and stream microbatches through the classic ``M + S - 1``-tick GPipe
schedule. Activations hop exactly one ICI neighbor per tick
(``lax.ppermute``), so the schedule maps onto the torus without any
all-to-all traffic.

Design constraints (deliberate — they are what makes the schedule one
compiled SPMD program):

* stages are SHAPE-HOMOGENEOUS: ``stage_fn`` maps an activation pytree
  to an identically-shaped pytree (transformer blocks, repeated conv
  blocks). Per-stage weights/state are stacked on a leading stage axis
  and sharded ``P('pp')`` — each rank holds only its own contiguous
  block of stages (one or more per rank).
* the whole schedule is a ``lax.scan`` over ticks; bubble ticks compute
  on garbage and are masked out, which XLA prefers over data-dependent
  control flow.
* gradients need no second schedule: every cross-stage hop is a
  ``ppermute`` whose transpose is the reverse permute, so ``jax.grad``
  of a loss on :func:`pipeline_apply` IS pipeline-parallel backprop
  (activations of the forward ticks are kept by XLA; wrap ``stage_fn``
  in ``jax.checkpoint`` to trade recompute for memory).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_pp_mesh", "microbatch", "unmicrobatch", "pipeline_apply"]


def make_pp_mesh(n_stages, dp=1, devices=None):
    """A ('dp', 'pp') mesh: ``pp`` is the pipeline-stage axis (innermost,
    so consecutive stages are ICI neighbors), ``dp`` replicates the whole
    pipeline for data parallelism."""
    if devices is None:
        devices = jax.devices()[:n_stages * dp]
    assert len(devices) == n_stages * dp, \
        "need n_stages * dp devices, got %d" % len(devices)
    arr = np.asarray(devices).reshape(dp, n_stages)
    return Mesh(arr, axis_names=("dp", "pp"))


def microbatch(x, m):
    """Split the leading (batch) axis of every leaf into (m, b//m, ...)."""
    def split(a):
        assert a.shape[0] % m == 0, \
            "batch %d not divisible into %d microbatches" % (a.shape[0], m)
        return a.reshape(m, a.shape[0] // m, *a.shape[1:])
    return jax.tree.map(split, x)


def unmicrobatch(x):
    """Inverse of :func:`microbatch`: merge the two leading axes."""
    return jax.tree.map(
        lambda a: a.reshape(a.shape[0] * a.shape[1], *a.shape[2:]), x)


def pipeline_apply(stage_fn, stage_state, xs, mesh, axis="pp",
                   batch_axis=None, state_specs=None):
    """Run ``S = mesh.shape[axis]`` pipeline stages over ``M`` microbatches.

    :param stage_fn: ``(state_slice, x, mb_index) -> y`` with ``y`` shaped
        like ``x`` (shape-homogeneous stages). ``mb_index`` is the i32
        index of the microbatch this tick carries — stages whose state
        varies per microbatch (e.g. precomputed routing tables) index it
        with ``lax.dynamic_index_in_dim``.
    :param stage_state: pytree whose leaves carry a leading stage axis
        of size ``S * k`` for integer ``k`` (stacked per-stage
        weights/state); sharded ``P(axis)`` so rank ``r`` holds the
        contiguous stages ``[r*k, (r+1)*k)`` and applies them
        back-to-back each tick (k > 1 = multiple stages per rank).
    :param xs: activation pytree with leading axes ``(M, mb, ...)``
        (see :func:`microbatch`); replicated over ``axis``.
    :param batch_axis: optional mesh axis name sharding the microbatch
        dimension (``mb``) for combined dp x pp execution. State leaves
        carrying per-microbatch data (routing tables etc.) must then be
        sharded over it too — pass ``state_specs``.
    :param state_specs: optional pytree of ``PartitionSpec`` matching
        ``stage_state`` (default ``P(axis)`` on the leading stage dim);
        every spec must still shard dim 0 over ``axis``.
    :returns: outputs shaped like ``xs``, replicated over ``axis``.
    """
    S = mesh.shape[axis]
    nstages = jax.tree.leaves(stage_state)[0].shape[0]
    for leaf in jax.tree.leaves(stage_state):
        if leaf.shape[0] != nstages or nstages % S:
            # an unchecked multiple would shard cleanly and silently run
            # only every S-th stage (the per-rank squeeze)
            raise ValueError(
                "stage_state leading axes must agree and divide into the "
                "%d pipeline ranks on axis %r (got %d/%d)"
                % (S, axis, leaf.shape[0], nstages))
    spr = nstages // S  # stages per rank, applied back-to-back per tick
    ba = batch_axis
    if state_specs is None:
        state_spec = jax.tree.map(lambda _: P(axis), stage_state)
    else:
        state_spec = state_specs
        for sp in jax.tree.leaves(
                state_spec, is_leaf=lambda x: isinstance(x, P)):
            assert sp and sp[0] == axis, (
                "state_specs must shard dim 0 over the pipeline axis")
    x_spec = jax.tree.map(lambda _: P(None, ba), xs)
    leaves = jax.tree.leaves(xs)
    M = leaves[0].shape[0]
    nticks = M + S - 1

    def ranked(xs_local, state_local):
        idx = jax.lax.axis_index(axis)
        # this rank's contiguous block of spr stages (leading dim spr)
        state = state_local
        perm = [(i, (i + 1) % S) for i in range(S)]
        # the carry varies per pipeline rank from tick 1 on: mark the
        # (replicated) zero init as pp-varying so the scan types match
        vary = lambda a: jax.lax.pcast(a, (axis,), to="varying")
        zero_act = jax.tree.map(
            lambda a: vary(jnp.zeros_like(a[0])), xs_local)
        zero_out = jax.tree.map(
            lambda a: vary(jnp.zeros_like(a)), xs_local)

        def step(carry, t):
            act, outs = carry
            mb_in = jnp.clip(t - idx, 0, M - 1).astype(jnp.int32)
            feed = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, jnp.clip(t, 0, M - 1), 0, keepdims=False), xs_local)
            x_in = jax.tree.map(
                lambda f, a: jnp.where(idx == 0, f, a), feed, act)
            y = x_in
            for k in range(spr):  # rank's stages, back-to-back
                y = stage_fn(jax.tree.map(lambda a: a[k], state), y,
                             mb_in)
            nxt = jax.tree.map(lambda a: jax.lax.ppermute(a, axis, perm), y)
            j = t - (S - 1)
            jc = jnp.clip(j, 0, M - 1)
            write = (idx == S - 1) & (j >= 0)
            outs = jax.tree.map(
                lambda o, v: jnp.where(
                    write,
                    jax.lax.dynamic_update_index_in_dim(o, v, jc, 0), o),
                outs, y)
            return (nxt, outs), None

        (_, outs), _ = jax.lax.scan(step, (zero_act, zero_out),
                                    jnp.arange(nticks))
        # hand the last rank's results to every rank (differentiable:
        # the psum transpose re-delivers cotangents to the last rank)
        return jax.tree.map(
            lambda o: jax.lax.psum(jnp.where(idx == S - 1, o, 0), axis),
            outs)

    shmap = jax.shard_map(ranked, mesh=mesh, in_specs=(x_spec, state_spec),
                          out_specs=jax.tree.map(lambda _: P(None, ba), xs))

    xs = jax.device_put(xs, jax.tree.map(
        lambda s: NamedSharding(mesh, s), x_spec))
    stage_state = jax.device_put(stage_state, jax.tree.map(
        lambda s: NamedSharding(mesh, s), state_spec))
    return shmap(xs, stage_state)
