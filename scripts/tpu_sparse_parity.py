"""Hardware (Mosaic) parity for the fused Pallas submanifold conv.

Runs the fused kernel with ``interpret=False`` on the real TPU — the
first time the kernel lowers through Mosaic rather than the Pallas
interpreter — and checks forward + grad parity against the XLA
gather+einsum formulation (``subm_conv_apply``), for the symmetric
(submanifold) backward, the general strided backward, and bf16
activations.  Closes round-3 VERDICT weak item #2.

Run on a machine with a TPU attached (the axon tunnel):
    python scripts/tpu_sparse_parity.py
"""

import os
import sys

# Force subm_conv_apply onto its XLA gather+einsum path so it serves as
# the reference; the fused Mosaic path is invoked explicitly below.
os.environ["D3D_TPU_FUSED_SPCONV"] = "0"

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from d3d_tpu.ops.sparse_conv import (build_neighbor_map,
                                     build_neighbor_map_strided,
                                     downsample_coords, subm_conv_apply)
from d3d_tpu.ops.sparse_conv_pallas import fused_supported, subm_conv_fused

GRID = (16, 16, 8)


def _problem(rng, c_in=32, c_out=64, n_active=480, n_pad=512):
    all_cells = np.stack(np.meshgrid(*[np.arange(g) for g in GRID],
                                     indexing="ij"), -1).reshape(-1, 3)
    pick = rng.choice(len(all_cells), size=n_active, replace=False)
    coords = np.zeros((n_pad, 3), np.int32)
    coords[:n_active] = all_cells[pick]
    coords[n_active:] = 3
    valid = np.zeros(n_pad, bool)
    valid[:n_active] = True
    coords, valid = jnp.asarray(coords), jnp.asarray(valid)
    feats = jnp.asarray(rng.normal(size=(n_pad, c_in)), jnp.float32)
    feats = feats * valid[:, None]
    w = jnp.asarray(rng.normal(size=(27, c_in, c_out)), jnp.float32) * 0.1
    nbr = build_neighbor_map(coords, valid, GRID)
    return coords, valid, feats, w, nbr


def _report(name, got, want, tol):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    scale = max(1.0, np.abs(want).max())
    diff = np.abs(got - want).max() / scale
    ok = diff <= tol
    print(f"  {name:28s} max rel diff {diff:.3e}  "
          f"{'OK' if ok else 'FAIL (tol %.1e)' % tol}")
    return ok


def main():
    backend = jax.default_backend()
    print(f"backend: {backend}  devices: {jax.devices()}")
    if backend != "tpu":
        print("NOT a TPU backend — this script validates Mosaic lowering; "
              "aborting")
        return 1

    rng = np.random.default_rng(0)
    coords, valid, feats, w, nbr = _problem(rng)
    assert fused_supported(feats, nbr)

    ok = True

    # --- forward, symmetric map, f32 ---
    want = subm_conv_apply(feats, nbr, w, valid)
    got = subm_conv_fused(feats, nbr, w, valid, True, False)
    got.block_until_ready()
    print("Mosaic lowering: OK (forward compiled + ran)")
    ok &= _report("fwd symmetric f32", got, want, 1e-5)

    # --- grads, symmetric backward ---
    cot = jnp.asarray(rng.normal(size=want.shape), jnp.float32)

    def loss_ref(f, ww):
        return jnp.sum(subm_conv_apply(f, nbr, ww, valid) * cot)

    def loss_fused(f, ww):
        return jnp.sum(subm_conv_fused(f, nbr, ww, valid, True, False) * cot)

    df_want, dw_want = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    df_got, dw_got = jax.grad(loss_fused, argnums=(0, 1))(feats, w)
    ok &= _report("grad d/dfeatures symmetric", df_got, df_want, 1e-4)
    ok &= _report("grad d/dweights symmetric", dw_got, dw_want, 1e-4)

    # --- strided (general scatter-add backward) ---
    out_coords, out_valid = downsample_coords(coords, valid, GRID, 2)
    nbr_s = build_neighbor_map_strided(out_coords, out_valid, coords, valid,
                                       GRID, 2)

    def loss_ref_s(f, ww):
        return jnp.sum(subm_conv_apply(f, nbr_s, ww, out_valid))

    def loss_fused_s(f, ww):
        return jnp.sum(subm_conv_fused(f, nbr_s, ww, out_valid, False, False))

    want_s = subm_conv_apply(feats, nbr_s, w, out_valid)
    got_s = subm_conv_fused(feats, nbr_s, w, out_valid, False, False)
    ok &= _report("fwd strided f32", got_s, want_s, 1e-5)
    dfs_w, dws_w = jax.grad(loss_ref_s, argnums=(0, 1))(feats, w)
    dfs_g, dws_g = jax.grad(loss_fused_s, argnums=(0, 1))(feats, w)
    ok &= _report("grad d/dfeatures strided", dfs_g, dfs_w, 1e-4)
    ok &= _report("grad d/dweights strided", dws_g, dws_w, 1e-4)

    # --- bf16 activations ---
    fb = feats.astype(jnp.bfloat16)
    want_b = subm_conv_apply(fb, nbr, w.astype(jnp.bfloat16), valid)
    got_b = subm_conv_fused(fb, nbr, w.astype(jnp.bfloat16), valid, True,
                            False)
    ok &= _report("fwd symmetric bf16", got_b.astype(jnp.float32),
                  want_b.astype(jnp.float32), 2e-2)

    print("RESULT:", "PARITY OK on Mosaic" if ok else "PARITY FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
