"""Hardware parity sweep for the Pallas kernels (run ON the TPU).

The CPU test suite exercises every Pallas kernel in ``interpret=True``
mode; this script re-runs the same parity constructions with the real
Mosaic compile on the attached chip — the hardware half of the README's
bit-parity claims:

  * rbox_iou_matrix (pair-tile kernel) vs the XLA SoA path,
  * nms_scan (sequential-grid cascade) vs the host serial oracle,
  * soft_nms_scan (linear + gaussian) vs the XLA fallback loop.

Exits non-zero on any mismatch; prints the max abs deviation per kernel
(0.0 = bit-identical, the expectation for the IoU tile kernel).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _boxes(rng, n):
    return np.stack([
        rng.uniform(-40, 40, n), rng.uniform(-40, 40, n),
        rng.uniform(1, 6, n), rng.uniform(1, 6, n),
        rng.uniform(-np.pi, np.pi, n)], axis=1).astype(np.float32)


def check_iou_matrix(rng):
    from d3d_tpu.ops import geometry_pallas as P
    from d3d_tpu.ops import geometry_soa as S

    b1 = jnp.asarray(_boxes(rng, 37))
    b2 = jnp.concatenate([b1[:5], jnp.asarray(_boxes(rng, 150))])
    ref = np.asarray(S.rbox_iou(b1[:, None], b2[None, :]))
    got = np.asarray(P.rbox_iou_matrix(b1, b2))
    d = float(np.abs(got - ref).max())
    print(f"rbox_iou_matrix: max|pallas - xla| = {d:.3g}"
          f" ({'bit-identical' if d == 0 else 'NOT bit-identical'})")
    return d <= 1e-6


def check_nms_scan(rng):
    from d3d_tpu.ops.nms_pallas import nms_scan

    n = 160
    ov = rng.random((n, n)) < 0.07
    ov = ov | ov.T
    pre = rng.random(n) < 0.1
    s = pre.copy()
    for i in range(n):
        if not s[i]:
            s[i + 1:] |= ov[i, i + 1:]
    got = np.asarray(nms_scan(jnp.asarray(ov), jnp.asarray(pre)))
    ok = np.array_equal(got, s)
    print(f"nms_scan: {'exact keep-mask match' if ok else 'MISMATCH'} "
          f"({int(got.sum())} suppressed)")
    return ok


def check_nms_blocked(rng):
    from d3d_tpu.ops.nms_pallas import nms_scan_blocked

    ok = True
    for n in (200, 2000):
        ov = rng.random((n, n)) < (8.0 / n)  # ~8 overlaps per box
        ov = ov | ov.T
        pre = rng.random(n) < 0.1
        s = pre.copy()
        for i in range(n):
            if not s[i]:
                s[i + 1:] |= ov[i, i + 1:]
        got = np.asarray(nms_scan_blocked(jnp.asarray(ov), jnp.asarray(pre)))
        same = np.array_equal(got, s)
        print(f"nms_scan_blocked[n={n}]: "
              f"{'exact keep-mask match' if same else 'MISMATCH'} "
              f"({int(got.sum())} suppressed)")
        ok &= same
    return ok


def check_soft_nms(rng):
    from d3d_tpu.ops import nms as N
    from d3d_tpu.ops.nms_pallas import soft_nms_scan

    n = 96
    boxes = jnp.asarray(_boxes(rng, n))
    scores = jnp.asarray(rng.random(n), jnp.float32)
    ok = True
    for method, param in (("linear", 0.5), ("gaussian", 0.4)):
        ref = np.asarray(N.soft_nms2d(
            boxes, scores, iou_threshold=0.2, score_threshold=0.1,
            supression_param=param, supression_method=method))
        iou = N._iou_matrix(boxes, "rbox").astype(jnp.float32)
        order = jnp.argsort(-scores, stable=True)
        pre = (scores <= 0.1).at[order[0]].set(False)
        init = jnp.where(pre, -jnp.inf, scores)
        got = np.asarray(soft_nms_scan(iou, init, pre, 0.2, 0.1, param,
                                       method))
        same = np.array_equal(got, ref)
        print(f"soft_nms_scan[{method}]: "
              f"{'exact suppression match' if same else 'MISMATCH'}")
        ok &= same
    return ok


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind})")
    if dev.platform not in ("tpu",):
        print("WARNING: not a TPU — this sweep is meant for hardware; "
              "the CPU suite already covers interpret mode")
    rng = np.random.default_rng(20260817)
    ok = True
    for fn in (check_iou_matrix, check_nms_scan, check_nms_blocked,
               check_soft_nms):
        ok &= bool(fn(rng))
    print("PARITY OK" if ok else "PARITY FAILURE")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
