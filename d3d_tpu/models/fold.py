"""Inference-time BatchNorm folding.

At inference BatchNorm is a per-channel affine with frozen statistics;
its multiplicative part can be absorbed into the preceding linear op's
kernel ahead of time. The fold keeps the module tree intact (no model
surgery): kernels are rescaled and the BatchNorm parameters are rewritten
to a pure per-channel ADD (scale=1, mean=0, var=1-eps, bias=residual), so
``model.apply(folded, ..., train=False)`` produces the same outputs with
one multiply removed per channel. On TPU XLA already fuses the BN affine
into the conv epilogue, so the measured win is expected to be ~zero —
the utility exists to close that question with a number (VERDICT r2
"fold BN into convs at inference") and for export paths that want
self-contained kernels.

Pairing: flax numbers children per type (Conv_0, BatchNorm_0, Conv_1, …),
so within a scope BatchNorm_k folds into the same-index linear child
(Conv_k / ConvTranspose_k / Dense_k) — the layout every model family in
this package uses. Pass explicit ``pairs`` for exotic layouts.
"""

import numpy as np
import jax.numpy as jnp

__all__ = ["fold_batchnorm"]

_LINEAR_TYPES = ("Conv", "ConvTranspose", "Dense")


def _walk_scopes(tree, path=()):
    """Yield (path, subdict) for every dict node."""
    yield path, tree
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _walk_scopes(v, path + (k,))


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def fold_batchnorm(variables, eps=1e-3, pairs=None):
    """Return new ``variables`` with inference BatchNorm multiplies folded
    into the preceding kernels.

    :param variables: flax variables dict with ``params`` and
        ``batch_stats`` collections
    :param eps: the BatchNorm epsilon the model was built with — it MUST
        match or the fold corrupts outputs. Default 1e-3, the value every
        model family in this package passes to ``nn.BatchNorm`` (flax's
        own default is 1e-5; pass that for external models built with it)
    :param pairs: optional explicit list of ``(scope_path, linear_name,
        bn_name)`` tuples overriding the same-index auto-pairing
    :returns: a new variables dict; ``train=False`` outputs are equal to
        the input's up to one float rounding
    """
    params = _copy(variables["params"])
    stats = _copy(variables.get("batch_stats", {}))

    if pairs is None:
        pairs = []
        for path, scope in _walk_scopes(params):
            for name in list(scope):
                if not name.startswith("BatchNorm_"):
                    continue
                idx = name.rsplit("_", 1)[1]
                partner = next(
                    (f"{t}_{idx}" for t in _LINEAR_TYPES
                     if f"{t}_{idx}" in scope), None)
                if partner is not None:
                    pairs.append((path, partner, name))

    for path, lin_name, bn_name in pairs:
        scope = _get(params, path)
        lin, bn = scope[lin_name], scope[bn_name]
        st = _get(stats, path)[bn_name]
        kernel = lin["kernel"]
        gamma = np.asarray(bn.get("scale", np.ones_like(st["mean"])),
                           np.float64)
        beta = np.asarray(bn.get("bias", np.zeros_like(st["mean"])),
                          np.float64)
        mean = np.asarray(st["mean"], np.float64)
        var = np.asarray(st["var"], np.float64)
        if kernel.shape[-1] != mean.shape[0]:
            raise ValueError(
                f"{'/'.join(path)}: {lin_name} out-features "
                f"{kernel.shape[-1]} != {bn_name} channels {mean.shape[0]}")

        s = gamma / np.sqrt(var + eps)
        lin["kernel"] = (kernel * jnp.asarray(s, kernel.dtype))
        if "bias" in lin:
            lin["bias"] = jnp.asarray(
                (np.asarray(lin["bias"], np.float64) - mean) * s + beta,
                kernel.dtype)
            resid = np.zeros_like(beta)
        else:
            resid = beta - mean * s
        # rewrite the BN into `z + resid`: the residual rides the running
        # MEAN (negated), which exists whether or not the BN has a bias
        # param; var=1-eps makes the denominator exactly 1 and scale
        # (when present) becomes 1
        dt = np.asarray(st["mean"]).dtype
        st["mean"] = jnp.asarray(-resid, dt)
        st["var"] = jnp.full_like(jnp.asarray(st["var"]),
                                  np.asarray(1.0 - eps, dt))
        if "scale" in bn:
            bn["scale"] = jnp.ones_like(jnp.asarray(bn["scale"]))
        if "bias" in bn:
            bn["bias"] = jnp.zeros_like(jnp.asarray(bn["bias"]))

    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = stats
    return out


def _copy(tree):
    if isinstance(tree, dict):
        return {k: _copy(v) for k, v in tree.items()}
    return tree
