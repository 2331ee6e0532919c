"""Checkpoint/resume: save a sharded train state, restore onto the mesh,
and confirm training continues bit-identically."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from d3d_tpu.checkpoint import TrainCheckpointer
from d3d_tpu.parallel import make_mesh, shard_train_step


def _tiny_step():
    def loss_fn(params, batch):
        y = batch["x"] @ params["dense"]["kernel"] + params["dense"]["bias"]
        return jnp.mean((y - batch["y"]) ** 2)

    opt = optax.adam(1e-2)

    def step(params, batch_stats, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, batch_stats, opt_state, {"total": loss}

    params = {"dense": {"kernel": jnp.ones((8, 64), jnp.float32) * 0.1,
                        "bias": jnp.zeros((64,), jnp.float32)}}
    return step, params, opt.init(params)


def test_save_restore_roundtrip(tmp_path, rng):
    step, params, opt_state = _tiny_step()
    batch = {"x": jnp.asarray(rng.normal(size=(16, 8)), jnp.float32),
             "y": jnp.asarray(rng.normal(size=(16, 64)), jnp.float32)}
    mesh = make_mesh(8)
    fn = shard_train_step(step, mesh, donate=False)

    bs = {}
    for i in range(3):
        params, bs, opt_state, aux = fn(params, bs, opt_state, batch)

    ckpt = TrainCheckpointer(tmp_path / "run", keep=2)
    assert ckpt.restore() is None
    ckpt.save(3, params, bs, opt_state)
    ckpt.wait()
    assert ckpt.latest_step == 3

    # continue original vs restored-and-continued: losses must be identical
    p2, b2, o2, aux_a = fn(params, bs, opt_state, batch)

    restored = TrainCheckpointer(tmp_path / "run").restore(
        like=(params, bs, opt_state))
    # restored leaves land on the template shardings
    k = restored["params"]["dense"]["kernel"]
    assert tuple(k.shape) == (8, 64)
    np.testing.assert_array_equal(np.asarray(k),
                                  np.asarray(params["dense"]["kernel"]))
    r2, rb2, ro2, aux_b = fn(restored["params"], restored["batch_stats"],
                             restored["opt_state"], batch)
    assert float(aux_a["total"]) == float(aux_b["total"])
    np.testing.assert_array_equal(np.asarray(p2["dense"]["kernel"]),
                                  np.asarray(r2["dense"]["kernel"]))


def test_retention_and_maybe_save(tmp_path):
    step, params, opt_state = _tiny_step()
    ckpt = TrainCheckpointer(tmp_path / "run", keep=2)
    for s in (0, 5, 10, 15):
        assert ckpt.maybe_save(s, params, {}, opt_state, every=5)
    assert not ckpt.maybe_save(7, params, {}, opt_state, every=5)
    ckpt.wait()
    assert ckpt.latest_step == 15
    assert ckpt.restore(step=10) is not None
