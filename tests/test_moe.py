"""Expert parallelism: the one-hot-dispatch MoE must match a per-token
routed loop exactly, shard its expert compute over ``ep`` without
changing the math, respect the capacity limit, and train (finite grads
+ load-balance aux)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from d3d_tpu.parallel.moe import (expert_sharding, init_moe_params,
                                  moe_mlp)

E, C, H, N = 4, 16, 32, 24


@pytest.fixture
def params():
    return init_moe_params(jax.random.PRNGKey(0), E, C, H)


def _routed_loop(params, x, capacity_factor):
    """Per-token reference: softmax top-1 expert, capacity in token
    order, gate-weighted expert MLP; dropped tokens produce zero."""
    n = x.shape[0]
    cap = int(np.ceil(n / E * capacity_factor))
    logits = np.asarray(x @ params["router"])
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    used = np.zeros(E, int)
    out = np.zeros_like(np.asarray(x))
    for i in range(n):
        e = int(np.argmax(probs[i]))
        if used[e] >= cap:
            continue
        used[e] += 1
        h = np.asarray(jax.nn.gelu(
            jnp.asarray(x[i] @ params["w1"][e] + params["b1"][e])))
        y = h @ params["w2"][e] + params["b2"][e]
        out[i] = probs[i, e] * np.asarray(y)
    return out


class TestMoE:
    def test_matches_per_token_loop(self, params, rng):
        x = jnp.asarray(rng.normal(size=(N, C)), jnp.float32)
        y, aux = moe_mlp(params, x, capacity_factor=1.25)
        want = _routed_loop(params, np.asarray(x), 1.25)
        np.testing.assert_allclose(np.asarray(y), want, rtol=0, atol=1e-5)
        assert float(aux) >= 1.0 - 1e-6  # E * sum(f*P) >= 1 by Cauchy-Schwarz

    def test_capacity_drops_overflow(self, params, rng):
        x = jnp.asarray(rng.normal(size=(N, C)), jnp.float32)
        # capacity 1 token per expert: at most E rows may be nonzero
        y, _ = moe_mlp(params, x, capacity_factor=E / N)
        nz = np.abs(np.asarray(y)).sum(axis=1) > 0
        assert nz.sum() <= E
        want = _routed_loop(params, np.asarray(x), E / N)
        np.testing.assert_allclose(np.asarray(y), want, rtol=0, atol=1e-5)

    def test_ep_sharded_matches_dense(self, params, rng):
        mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                    axis_names=("dp", "ep"))
        x = jnp.asarray(rng.normal(size=(2, N, C)), jnp.float32)
        y_dense, aux_dense = jax.jit(moe_mlp)(params, x)
        sh = expert_sharding(mesh)
        params_ep = jax.device_put(params, sh)
        # each rank holds E / ep_size experts
        w1_shard = params_ep["w1"].addressable_shards[0].data
        assert w1_shard.shape[0] == E // 2
        y_ep, aux_ep = jax.jit(
            lambda p, t: moe_mlp(p, t, mesh=mesh))(params_ep, x)
        np.testing.assert_allclose(np.asarray(y_ep), np.asarray(y_dense),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(float(aux_ep), float(aux_dense),
                                   rtol=1e-6)

    def test_grouped_routing_matches_per_group(self, params, rng):
        """group_size=g must equal routing each g-token slice
        independently (GShard fixed-size groups keep the dispatch
        tensors linear in N); a non-divisor group exercises padding."""
        x = jnp.asarray(rng.normal(size=(N, C)), jnp.float32)
        for g in (8, 10):  # 10 does not divide 24 -> padded tail
            y, _ = moe_mlp(params, x, capacity_factor=1.25, group_size=g)
            parts = []
            for lo in range(0, N, g):
                xi = x[lo:lo + g]
                pad = g - xi.shape[0]
                m = jnp.arange(g) < xi.shape[0]
                if pad:
                    xi = jnp.concatenate(
                        [xi, jnp.zeros((pad, C), jnp.float32)])
                yi, _ = moe_mlp(params, xi, capacity_factor=1.25,
                                mask=m)
                parts.append(np.asarray(yi)[:g - pad])
            want = np.concatenate(parts)
            np.testing.assert_allclose(np.asarray(y), want, rtol=0,
                                       atol=1e-5, err_msg=f"g={g}")

    def test_trains(self, params, rng):
        x = jnp.asarray(rng.normal(size=(N, C)), jnp.float32)

        def loss(p):
            y, aux = moe_mlp(p, x)
            return jnp.mean((y - 1.0) ** 2) + 0.01 * aux

        g = jax.grad(loss)(params)
        flat = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(a)).all() for a in flat)
        # the router must receive gradient (through gate AND aux)
        assert float(jnp.abs(g["router"]).sum()) > 0
        # every expert that received a token gets weight gradient
        y, _ = moe_mlp(params, x)
        probs = jax.nn.softmax((x @ params["router"]).astype(jnp.float32))
        hit = np.unique(np.asarray(jnp.argmax(probs, axis=-1)))
        gw1 = np.abs(np.asarray(g["w1"])).sum(axis=(1, 2))
        assert (gw1[hit] > 0).all()
