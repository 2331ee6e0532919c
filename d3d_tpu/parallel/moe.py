"""Expert parallelism: a Switch-style mixture-of-experts MLP sharded
over an ``ep`` mesh axis.

The reference has no model-parallel strategies (SURVEY.md §2.0); this
completes d3d_tpu's axis set (dp/sp/tp/pp/ep) with the TPU-native MoE
recipe: routing is expressed as dense one-hot einsums (GShard's
formulation — every step is an MXU matmul, no gather/scatter), expert
weights and the dispatched ``(G, E, cap, C)`` token blocks carry
``P(axis)`` sharding constraints on the expert axis, and XLA's SPMD
partitioner inserts the all-to-all-equivalent collectives. No manual
collective calls — exactly the "annotate shardings, let XLA do the
communication" recipe the rest of d3d_tpu.parallel follows.

Routing is per GROUP of ``group_size`` tokens (GShard's fixed-size
groups): the dispatch/combine one-hots are ``(G, group, E, cap)`` with
``cap = ceil(group / E * capacity_factor)``, so their footprint is
``N * group * capacity_factor`` — linear in the token count for a fixed
group size, where a single global group would be quadratic. Top-1
(Switch) routing with a capacity limit: overflow tokens contribute zero
from the expert branch (the caller's residual connection passes them
through unchanged — Switch Transformer semantics). The returned
auxiliary load-balance loss is the Switch ``E * sum_e f_e * P_e`` term.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["init_moe_params", "moe_mlp", "expert_sharding"]


def init_moe_params(key, n_experts, d_model, d_hidden, dtype=jnp.float32):
    """Router + stacked expert-MLP weights (leading expert axis)."""
    kr, k1, k2 = jax.random.split(key, 3)
    s1 = 1.0 / np.sqrt(d_model)
    s2 = 1.0 / np.sqrt(d_hidden)
    return {
        "router": jax.random.normal(kr, (d_model, n_experts), dtype) * s1,
        "w1": jax.random.normal(k1, (n_experts, d_model, d_hidden),
                                dtype) * s1,
        "b1": jnp.zeros((n_experts, d_hidden), dtype),
        "w2": jax.random.normal(k2, (n_experts, d_hidden, d_model),
                                dtype) * s2,
        "b2": jnp.zeros((n_experts, d_model), dtype),
    }


def expert_sharding(mesh, axis="ep"):
    """NamedShardings placing the expert axis of each param over ``axis``
    (router replicates); device_put the params through this before
    training so each rank holds only its own experts."""
    ex = NamedSharding(mesh, P(axis))
    return {
        "router": NamedSharding(mesh, P()),
        "w1": ex, "b1": ex, "w2": ex, "b2": ex,
    }


def moe_mlp(params, x, capacity_factor=1.25, mesh=None, axis="ep",
            mask=None, constrain=None, group_size=None):
    """Top-1 routed expert MLP over ``x`` of shape (..., N, C).

    :param mesh: optional mesh with an ``axis`` dimension — adds the
        ``P(axis)`` sharding constraints (expert axis) on the dispatched
        blocks so XLA partitions expert compute across ranks. Omit for
        the dense single-device reference semantics (identical math
        either way).
    :param mask: optional (..., N) bool — False tokens are not routed:
        they consume no expert capacity, produce zero output, and are
        excluded from the load-balance statistics (padding slots; note
        the capacity itself is static per group, computed from
        ``group_size``, not from the mask).
    :param constrain: optional ``t -> t`` hook applied to the
        ``(G, E, cap, ...)`` expert blocks instead of building one from
        ``mesh`` — lets flax modules stay mesh-free (see
        :func:`~d3d_tpu.parallel.mesh.expert_constrain`).
    :param group_size: tokens per routing group (default: one global
        group — exact small-scale semantics; SET THIS at scale, the
        dispatch tensors grow with ``N * group_size``).
    :returns: ``(y, aux)`` — the expert-branch output (zero for dropped
        or over-capacity tokens; add it to a residual) and the scalar
        Switch load-balance loss.
    """
    lead = x.shape[:-2]
    n, c = x.shape[-2], x.shape[-1]
    x2 = x.reshape(-1, c)
    ntok = x2.shape[0]
    m2 = (jnp.ones(ntok, bool) if mask is None
          else mask.reshape(-1).astype(bool))
    g = int(min(group_size or ntok, ntok)) or 1
    padrows = (-ntok) % g
    if padrows:
        x2 = jnp.concatenate(
            [x2, jnp.zeros((padrows, c), x2.dtype)], axis=0)
        m2 = jnp.concatenate([m2, jnp.zeros(padrows, bool)])
    ng = x2.shape[0] // g
    e = params["w1"].shape[0]
    cap = int(np.ceil(g / e * capacity_factor))

    if constrain is not None:
        con = lambda t: constrain(t)
    elif mesh is not None:
        sh = NamedSharding(mesh, P(None, axis))
        con = lambda t: jax.lax.with_sharding_constraint(t, sh)
    else:
        con = lambda t: t

    xg = x2.reshape(ng, g, c)
    mg = m2.reshape(ng, g).astype(jnp.float32)
    logits = jnp.einsum("gnd,de->gne", xg,
                        params["router"].astype(xg.dtype))
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    expert = jnp.argmax(probs, axis=-1)                    # (G, g)
    gate = jnp.take_along_axis(probs, expert[..., None], axis=-1)[..., 0]

    onehot = jax.nn.one_hot(expert, e, dtype=jnp.float32) * mg[..., None]
    # position of each token within its expert's per-group queue
    pos = jnp.cumsum(onehot, axis=1) - onehot              # (G, g, E)
    pos_tok = jnp.sum(pos * onehot, axis=-1)               # (G, g)
    keep = pos_tok < cap
    # dense dispatch/combine tensors — MXU matmuls, no scatter
    slot = jax.nn.one_hot(pos_tok.astype(jnp.int32), cap,
                          dtype=jnp.float32)               # (G, g, cap)
    dispatch = onehot[..., None] * slot[..., None, :] \
        * keep[..., None, None]                            # (G, g, E, cap)
    combine = dispatch * gate[..., None, None].astype(jnp.float32)

    xe = jnp.einsum("gnec,gnd->gecd", dispatch.astype(x2.dtype), xg)
    xe = con(xe)                                           # (G, E, cap, C)
    h = jnp.einsum("gecd,edh->gech", xe, params["w1"]) \
        + params["b1"][None, :, None, :]
    h = jax.nn.gelu(con(h))
    ye = jnp.einsum("gech,ehd->gecd", h, params["w2"]) \
        + params["b2"][None, :, None, :]
    ye = con(ye)
    y = jnp.einsum("gnec,gecd->gnd", combine.astype(ye.dtype), ye)
    y = y.reshape(-1, c)[:ntok]

    # Switch load-balance aux: fraction routed vs mean router prob,
    # over valid tokens across all groups
    denom = jnp.maximum(jnp.sum(mg), 1.0)
    frac = jnp.sum(onehot, axis=(0, 1)) / denom
    pmean = jnp.sum(probs * mg[..., None], axis=(0, 1)) / denom
    aux = jnp.float32(e) * jnp.sum(frac * pmean)
    return y.reshape(*lead, n, c), aux
