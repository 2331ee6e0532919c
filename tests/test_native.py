"""Native C++ geometry oracle: cross-validate the JAX kernels against the
independent Sutherland-Hodgman implementation."""

import numpy as np
import pytest

from d3d_tpu import native
from d3d_tpu.ops.box import box2d_iou, box2d_nms, crop_mask_2dr

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ toolchain unavailable")


def _boxes(rng, n):
    return np.stack([
        rng.random(n) * 20,
        rng.random(n) * 20,
        rng.random(n) * 6 + 1,
        rng.random(n) * 6 + 1,
        rng.random(n) * 6 - 3,
    ], axis=1)


def test_iou_cross_validation(rng):
    b1 = _boxes(rng, 48)
    b2 = _boxes(rng, 32)
    jax_iou = box2d_iou(b1, b2, method="rbox")
    cpp_iou = native.rbox_iou_matrix(b1, b2)
    assert np.allclose(jax_iou, cpp_iou, atol=1e-9)
    assert np.allclose(box2d_iou(b1, b2, method="box"),
                       native.aabox_iou_matrix(b1, b2), atol=1e-9)


def test_nms_cross_validation(rng):
    b = _boxes(rng, 100)
    s = rng.random(100)
    for thr in (0.1, 0.3, 0.6):
        jax_keep = box2d_nms(b, s, iou_method="rbox", iou_threshold=thr)
        cpp_keep = native.nms2d(b, s, iou_method="rbox", iou_threshold=thr)
        assert np.array_equal(jax_keep, cpp_keep), thr


def test_contains_cross_validation(rng):
    b = _boxes(rng, 16)
    p = rng.random((256, 2)) * 20
    jax_mask = np.asarray(crop_mask_2dr(p, b))
    cpp_mask = native.box2dr_contains(b, p)
    assert np.array_equal(jax_mask, cpp_mask)
