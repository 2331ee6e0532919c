"""Weight-only int8 quantization: size halves, detector outputs stay
close, and the quantized model still detects through the full inference
factory."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from d3d_tpu.models.pointpillars import (PointPillars, PointPillarsConfig,
                                         make_anchors, pillarize)
from d3d_tpu.quantize import (dequantize_params, quantize_params,
                              quantized_bytes)

TINY = PointPillarsConfig(
    bounds=(0.0, 16.0, -8.0, 8.0, -3.0, 1.0), grid=(32, 32),
    max_pillars=256, max_points_per_pillar=16, pfn_features=32,
    backbone_channels=(32, 64), backbone_blocks=(1, 1),
    upsample_channels=32)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    pts = np.stack([rng.random(2048) * 16, rng.random(2048) * 16 - 8,
                    rng.random(2048) * 4 - 3, rng.random(2048)],
                   axis=1).astype(np.float32)
    feats, coords, valid = pillarize(jnp.asarray(pts), TINY)
    model = PointPillars(TINY)
    variables = model.init(jax.random.PRNGKey(0), feats[None], coords[None],
                           valid[None])
    return model, variables, (feats, coords, valid), pts


def test_roundtrip_error_bounded(setup):
    _, variables, _, _ = setup
    q = quantize_params(variables["params"])
    dq = dequantize_params(q)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(variables["params"]),
            jax.tree_util.tree_leaves_with_path(dq)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        name = str(getattr(pa[-1], "key", ""))
        if name == "kernel" and a.ndim >= 2:
            scale = np.abs(a).max(axis=tuple(range(a.ndim - 1))) / 127.0
            tol = np.broadcast_to(np.maximum(scale, 1e-8) * 0.51, a.shape)
            assert np.all(np.abs(a - b) <= tol), name
        else:
            np.testing.assert_array_equal(a, b)


def test_size_reduction(setup):
    _, variables, _, _ = setup
    q = quantize_params(variables["params"])
    full = quantized_bytes(variables["params"])
    quant = quantized_bytes(q)
    assert quant < 0.5 * full  # kernels dominate; int8+f32 scale < f32/2 +


def test_outputs_close_and_detector_works(setup):
    model, variables, (feats, coords, valid), pts = setup
    dq = dequantize_params(quantize_params(variables["params"]))
    full = model.apply(variables, feats[None], coords[None], valid[None])
    quant = model.apply({"params": dq,
                         "batch_stats": variables["batch_stats"]},
                        feats[None], coords[None], valid[None])
    for a, b in zip(full, quant):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.maximum(np.abs(a).max(), 1e-3)
        assert np.abs(a - b).max() / denom < 0.1

    from d3d_tpu.dataset.kitti.utils import KittiObjectClass
    from d3d_tpu.models import make_pointpillars_detector

    det = make_pointpillars_detector(
        model, {"params": dq, "batch_stats": variables["batch_stats"]},
        TINY, make_anchors(TINY), (KittiObjectClass.Car,),
        score_threshold=0.0, top_k=8)
    out = det(pts)
    assert len(out) <= 8
    for obj in out:
        assert np.all(np.isfinite(obj.position))


def test_second_quantized_inference(rng):
    """Weight-only int8 also covers the sparse family's (K, C, C')
    kernels (per-output-channel scales on the last axis)."""
    from d3d_tpu.dataset.kitti.utils import KittiObjectClass
    from d3d_tpu.models import (SECOND, SECONDConfig, make_second_detector,
                                second_voxelize)
    from d3d_tpu.models.pointpillars import make_anchors
    from d3d_tpu.models.second import head_config

    cfg = SECONDConfig(
        bounds=(0.0, 16.0, -8.0, 8.0, -3.0, 1.0), grid=(32, 32, 8),
        max_voxels=512, stage_channels=(8, 16, 32),
        stage_sites=(512, 256, 128), subm_per_stage=1, head_channels=16)
    pts = np.stack([rng.random(2048) * 16, rng.random(2048) * 16 - 8,
                    rng.random(2048) * 4 - 3, rng.random(2048)],
                   axis=1).astype(np.float32)
    model = SECOND(cfg)
    f, c, v = second_voxelize(jnp.asarray(pts), cfg)
    var = model.init(jax.random.PRNGKey(0), f[None], c[None], v[None])
    q = quantize_params(var["params"])
    assert quantized_bytes(q) < 0.5 * quantized_bytes(var["params"])
    dq = dequantize_params(q)

    full = model.apply(var, f[None], c[None], v[None])
    quant = model.apply({"params": dq, "batch_stats": var["batch_stats"]},
                        f[None], c[None], v[None])
    for a, b in zip(full, quant):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() / max(np.abs(a).max(), 1e-3) < 0.15

    det = make_second_detector(
        model, {"params": dq, "batch_stats": var["batch_stats"]}, cfg,
        make_anchors(head_config(cfg)), (KittiObjectClass.Car,),
        score_threshold=0.0, top_k=8)
    out = det(pts)
    assert len(out) <= 8


def test_voxelnext_quantized_inference(rng):
    """Weight-only int8 works family-agnostically: VoxelNeXt's sparse
    conv + Dense head kernels quantize and the detector still runs."""
    from tests.test_voxelnext import TINY as VCFG, _cloud
    from d3d_tpu.dataset.kitti.utils import KittiObjectClass
    from d3d_tpu.models import (VoxelNeXt, make_voxelnext_detector,
                                voxelnext_voxelize)

    pts = _cloud(rng)
    f, c, v = voxelnext_voxelize(jnp.asarray(pts), VCFG)
    model = VoxelNeXt(VCFG)
    var = model.init(jax.random.PRNGKey(0), f[None], c[None], v[None])
    q = quantize_params(var["params"])
    assert quantized_bytes(q) < 0.35 * quantized_bytes(var["params"])
    dq = dequantize_params(q)
    det = make_voxelnext_detector(
        model, {"params": dq, "batch_stats": var["batch_stats"]}, VCFG,
        [KittiObjectClass.Car, KittiObjectClass.Pedestrian],
        score_threshold=0.0)
    out = det(pts)
    for o in out:
        assert np.isfinite(o.position).all()
