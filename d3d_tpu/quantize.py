"""Weight-only int8 quantization for serving.

Halves parameter HBM (and checkpoint size) for the detector families:
every conv/dense ``kernel`` is stored as per-output-channel symmetric
int8 with an f32 scale vector; dequantization happens at apply time (one
multiply fused into the surrounding XLA program). Norm/bias/scalar leaves
stay in full precision — they are KiB-scale.

Weight-only quantization leaves the matmul inputs in bf16/f32, so
accuracy loss is bounded by the per-channel rounding error (~0.4% of the
channel's max weight); the parity test pins detector outputs to the
full-precision model.

Usage::

    qparams = quantize_params(params)        # int8 + scales pytree
    params8 = dequantize_params(qparams)     # apply-ready pytree
    out = model.apply({"params": params8, ...}, ...)
"""

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["quantize_params", "dequantize_params", "quantized_bytes"]

_QKEY = "_int8"
_SKEY = "_scale"


def _is_kernel(path, leaf):
    name = str(getattr(path[-1], "key", "")) if path else ""
    return name == "kernel" and hasattr(leaf, "ndim") and leaf.ndim >= 2


def quantize_params(params):
    """Per-output-channel symmetric int8 quantization of every kernel.

    :returns: a pytree where each kernel leaf becomes a dict
        ``{"_int8": int8 array, "_scale": (C_out,) f32}``; other leaves
        pass through unchanged.
    """

    def quant(path, leaf):
        if not _is_kernel(path, leaf):
            return leaf
        w = np.asarray(leaf, np.float32)
        axes = tuple(range(w.ndim - 1))
        scale = np.max(np.abs(w), axis=axes) / 127.0
        scale = np.where(scale > 0, scale, 1.0).astype(np.float32)
        q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        return {_QKEY: jnp.asarray(q), _SKEY: jnp.asarray(scale)}

    return jax.tree_util.tree_map_with_path(quant, params)


def _is_qdict(x):
    return isinstance(x, dict) and _QKEY in x and _SKEY in x


def dequantize_params(qparams, dtype=jnp.float32):
    """Reconstitute an apply-ready param pytree from
    :func:`quantize_params` output (jit-friendly: the dequantizing
    multiply fuses into the consuming program)."""

    def dq(x):
        if _is_qdict(x):
            return (x[_QKEY].astype(jnp.float32) * x[_SKEY]).astype(dtype)
        return x

    return jax.tree.map(dq, qparams, is_leaf=_is_qdict)


def quantized_bytes(tree):
    """Total parameter bytes of a (possibly quantized) pytree."""
    total = 0
    for leaf in jax.tree.leaves(tree):
        total += leaf.size * leaf.dtype.itemsize
    return total
