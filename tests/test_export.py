"""AOT detector export (d3d_tpu.export): StableHLO roundtrip with weights
baked in — the serving artifact runs without model code."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from d3d_tpu.export import export_detector, load_detector, save_detector


@pytest.fixture(scope="module")
def tiny_detector():
    import optax  # noqa: F401 (env sanity)

    from d3d_tpu.dataset.kitti.utils import KittiObjectClass
    from d3d_tpu.models import (PointPillars, PointPillarsConfig,
                                make_anchors)
    from d3d_tpu.models.inference import make_pointpillars_detector
    from d3d_tpu.models.pointpillars import pillarize

    cfg = PointPillarsConfig(
        bounds=(0.0, 16.0, -8.0, 8.0, -3.0, 1.0), grid=(32, 32),
        max_pillars=256, max_points_per_pillar=16, pfn_features=32,
        backbone_channels=(32, 64), backbone_blocks=(1, 1),
        upsample_channels=32)
    model = PointPillars(cfg)
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(0, 16, 2048), rng.uniform(-8, 8, 2048),
                    rng.uniform(-3, 1, 2048), rng.uniform(0, 1, 2048)],
                   axis=1).astype(np.float32)
    feats, coords, valid = pillarize(jnp.asarray(pts), cfg)
    variables = model.init(jax.random.PRNGKey(0), feats[None], coords[None],
                           valid[None], train=False)
    detect = make_pointpillars_detector(
        model, variables, cfg, make_anchors(cfg), [KittiObjectClass.Car],
        score_threshold=0.0, top_k=32)
    return detect, pts


def test_export_roundtrip(tiny_detector, tmp_path):
    detect, pts = tiny_detector
    art = tmp_path / "pp.d3dx"
    save_detector(detect.device_fn, pts, art,
                  meta=dict(classes=["Car"], frame="velo",
                            score_threshold=0.0))
    loaded = load_detector(art)
    assert loaded.meta["classes"] == ["Car"]
    assert loaded.input_shape == pts.shape

    want = detect.device_fn(jnp.asarray(pts))
    got = loaded(jnp.asarray(pts))
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_exported_runs_without_model_state(tiny_detector, tmp_path):
    """The artifact is self-contained: a fresh loader callable produces
    detections from raw points with no flax modules or weights around."""
    detect, pts = tiny_detector
    art = tmp_path / "pp2.d3dx"
    save_detector(detect.device_fn, pts, art)
    loaded = load_detector(art)
    boxes, scores, labels, keep = loaded(jnp.asarray(pts))
    assert np.asarray(boxes).shape[1] == 7
    assert np.isfinite(np.asarray(scores)).all()
    # and it feeds the normal host assembly
    from d3d_tpu.models.inference import _to_targets
    from d3d_tpu.dataset.kitti.utils import KittiObjectClass

    arr = _to_targets(boxes, scores, labels, keep,
                      [KittiObjectClass.Car], "velo", 0, 0.0)
    assert arr.frame == "velo"
    assert len(arr) == int(np.asarray(keep).sum())


def test_export_wrong_shape_raises(tiny_detector, tmp_path):
    detect, pts = tiny_detector
    art = tmp_path / "pp3.d3dx"
    save_detector(detect.device_fn, pts, art)
    loaded = load_detector(art)
    with pytest.raises(ValueError):
        loaded(jnp.zeros((pts.shape[0] + 1, 4), jnp.float32))


def test_export_multi_input_mono3d(tmp_path, rng):
    """Multi-input pipelines (Mono3D's (image, intrinsics)) export and
    reload through the same artifact path."""
    from tests.test_mono3d import K, TINY as MCFG
    from d3d_tpu.export import load_detector, save_detector
    from d3d_tpu.models import Mono3D, make_mono3d_detector
    from d3d_tpu.dataset.kitti.utils import KittiObjectClass

    model = Mono3D(MCFG)
    img = jnp.asarray(rng.random((1, 96, 128, 3)), jnp.float32)
    var = model.init(jax.random.PRNGKey(0), img)
    det = make_mono3d_detector(model, var, MCFG,
                               [KittiObjectClass.Car,
                                KittiObjectClass.Pedestrian])
    kj = jnp.asarray(K)
    want = det.device_fn(img[0], kj)
    path = tmp_path / "mono3d.zip"
    save_detector(det.device_fn, (img[0], kj), path,
                  meta={"family": "mono3d"})
    re = load_detector(path)
    assert re.meta["family"] == "mono3d"
    got = re(img[0], kj)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)


def test_export_voxelnext(tmp_path, rng):
    from tests.test_voxelnext import TINY as VCFG, _cloud
    from d3d_tpu.export import load_detector, save_detector
    from d3d_tpu.models import (VoxelNeXt, make_voxelnext_detector,
                                voxelnext_voxelize)
    from d3d_tpu.dataset.kitti.utils import KittiObjectClass

    pts = _cloud(rng)
    f, c, v = voxelnext_voxelize(jnp.asarray(pts), VCFG)
    model = VoxelNeXt(VCFG)
    var = model.init(jax.random.PRNGKey(0), f[None], c[None], v[None])
    det = make_voxelnext_detector(
        model, var, VCFG,
        [KittiObjectClass.Car, KittiObjectClass.Pedestrian])
    want = det.device_fn(jnp.asarray(pts))
    path = tmp_path / "vnext.zip"
    save_detector(det.device_fn, pts, path)
    got = load_detector(path)(jnp.asarray(pts))
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)


def test_pallas_kernels_export_lower_for_tpu():
    """Cross-platform ``jax.export`` lowers the Pallas kernels through
    Mosaic even with jax_enable_x64 on (the package default).

    Regression: weak python-float literals inside the kernels promoted
    through an f64 ``convert_element_type`` under the export re-trace —
    plain jit constant-folds that convert, export does not — and Mosaic
    has no f64 lowering, so ``examples/serve_tracking.py``'s export
    roundtrip crashed on hardware while every jit path passed
    (geometry_pallas/_iou_tile_kernel now pins every scalar to f32)."""
    from jax import export as jax_export

    from d3d_tpu.ops import geometry_soa as GS
    from d3d_tpu.ops.nms_pallas import (nms_scan, nms_scan_blocked,
                                        soft_nms_scan)

    boxes = jax.ShapeDtypeStruct((32, 5), jnp.float32)
    scores = jax.ShapeDtypeStruct((32,), jnp.float32)
    mat = jax.ShapeDtypeStruct((32, 32), jnp.float32)
    bmat = jax.ShapeDtypeStruct((32, 32), jnp.bool_)
    bvec = jax.ShapeDtypeStruct((32,), jnp.bool_)

    from d3d_tpu.ops import geometry_pallas as GP

    jax_export.export(jax.jit(GP.rbox_iou_matrix),
                      platforms=["tpu"])(boxes, boxes)
    jax_export.export(jax.jit(nms_scan), platforms=["tpu"])(bmat, bvec)
    big = jax.ShapeDtypeStruct((1280, 1280), jnp.bool_)
    bigv = jax.ShapeDtypeStruct((1280,), jnp.bool_)
    jax_export.export(jax.jit(nms_scan_blocked), platforms=["tpu"])(big, bigv)
    for method in ("linear", "gaussian"):
        jax_export.export(
            jax.jit(lambda i, s, p: soft_nms_scan(
                i, s, p, 0.25, 0.05, 0.5, method)),
            platforms=["tpu"])(mat, scores, bvec)
