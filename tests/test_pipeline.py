"""Pipeline parallelism: the GPipe schedule must be bit-identical to the
sequential stack in forward AND gradient (to one f32 ulp — XLA fuses
the scanned schedule differently from the unrolled stack), compose with
a dp axis, and its compiled HLO must move activations with neighbor
collective-permutes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from d3d_tpu.parallel.pipeline import (make_pp_mesh, microbatch,
                                       pipeline_apply, unmicrobatch)

C = 16


def _stage_state(rng, s):
    return {
        "w": jnp.asarray(rng.normal(0, 0.3, (s, C, C)), jnp.float32),
        "b": jnp.asarray(rng.normal(0, 0.1, (s, C)), jnp.float32),
    }


def _stage_fn(state, x, mb_idx):
    del mb_idx
    return jax.nn.gelu(x @ state["w"] + state["b"])


def _sequential(state, x):
    s = state["w"].shape[0]
    for i in range(s):
        x = _stage_fn(jax.tree.map(lambda a: a[i], state), x, 0)
    return x


class TestPipelineParity:
    @pytest.mark.parametrize("stages,m", [(2, 4), (4, 4), (8, 3)])
    def test_forward_matches_sequential(self, rng, stages, m):
        mesh = make_pp_mesh(stages)
        state = _stage_state(rng, stages)
        x = jnp.asarray(rng.normal(size=(m * 2, C)), jnp.float32)
        want = _sequential(state, x)
        got = unmicrobatch(
            pipeline_apply(_stage_fn, state, microbatch(x, m), mesh))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=1e-6)

    def test_grad_matches_sequential(self, rng):
        stages, m = 4, 4
        mesh = make_pp_mesh(stages)
        state = _stage_state(rng, stages)
        x = jnp.asarray(rng.normal(size=(m * 2, C)), jnp.float32)

        def loss_seq(st):
            return jnp.sum(_sequential(st, x) ** 2)

        def loss_pp(st):
            out = pipeline_apply(_stage_fn, st, microbatch(x, m), mesh)
            return jnp.sum(unmicrobatch(out) ** 2)

        g_seq = jax.grad(loss_seq)(state)
        g_pp = jax.grad(loss_pp)(state)
        for k in g_seq:
            np.testing.assert_allclose(np.asarray(g_pp[k]),
                                       np.asarray(g_seq[k]),
                                       rtol=0, atol=1e-5, err_msg=k)

    def test_two_stages_per_rank(self, rng):
        """8 stacked stages on 4 ranks: rank r applies stages 2r, 2r+1
        back-to-back; must match the 8-stage sequential stack."""
        mesh = make_pp_mesh(4)
        state = _stage_state(rng, 8)
        x = jnp.asarray(rng.normal(size=(8, C)), jnp.float32)
        want = _sequential(state, x)
        got = unmicrobatch(
            pipeline_apply(_stage_fn, state, microbatch(x, 4), mesh))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=1e-5)
        with pytest.raises(ValueError, match="divide"):
            pipeline_apply(_stage_fn, _stage_state(rng, 6),
                           microbatch(x, 4), mesh)

    def test_dp_times_pp(self, rng):
        """pp composed with a dp axis sharding the microbatch dim."""
        mesh = make_pp_mesh(4, dp=2)
        state = _stage_state(rng, 4)
        x = jnp.asarray(rng.normal(size=(3 * 4, C)), jnp.float32)
        want = _sequential(state, x)
        got = unmicrobatch(pipeline_apply(
            _stage_fn, state, microbatch(x, 3), mesh, batch_axis="dp"))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=1e-6)

    def test_per_microbatch_state(self, rng):
        """Stages may index per-microbatch tables (routing etc.) by the
        mb_index handed to stage_fn — the schedule must deliver the RIGHT
        index at every tick (microbatch t reaches stage i at tick t+i)."""
        stages, m, mb = 4, 5, 2
        mesh = make_pp_mesh(stages)
        state = _stage_state(rng, stages)
        # per-(stage, microbatch) additive tag, recognizable per pair
        tag = jnp.asarray(
            np.arange(stages)[:, None, None, None] * 100
            + np.arange(m)[None, :, None, None]
            + np.zeros((1, 1, mb, C)), jnp.float32)
        state = dict(state, tag=tag)

        def fn(st, x, mb_idx):
            t = jax.lax.dynamic_index_in_dim(st["tag"], mb_idx, 0,
                                             keepdims=False)
            return jax.nn.gelu(x @ st["w"] + st["b"]) + t

        def seq(st, xmb):
            outs = []
            for j in range(m):
                x = xmb[j]
                for i in range(stages):
                    x = fn(jax.tree.map(lambda a: a[i], st), x,
                           jnp.int32(j))
                outs.append(x)
            return jnp.stack(outs)

        xmb = microbatch(
            jnp.asarray(rng.normal(size=(m * mb, C)), jnp.float32), m)
        want = seq(state, xmb)
        got = pipeline_apply(fn, state, xmb, mesh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=1e-6)

    def test_hlo_uses_collective_permute(self, rng):
        mesh = make_pp_mesh(4)
        state = _stage_state(rng, 4)
        xmb = microbatch(
            jnp.asarray(rng.normal(size=(8, C)), jnp.float32), 4)
        fn = jax.jit(lambda st, x: pipeline_apply(_stage_fn, st, x, mesh))
        hlo = fn.lower(state, xmb).compile().as_text()
        assert "collective-permute" in hlo
        assert "all-to-all" not in hlo
