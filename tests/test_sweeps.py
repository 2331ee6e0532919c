"""Multi-sweep accumulation: motion compensation into the keyframe sensor
frame, dt channel, and end-to-end consumption by a pillar model."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from d3d_tpu.models.sweeps import accumulate_sweeps


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """Two-keyframe nuScenes converted scene WITH intermediate sweeps."""
    root = tmp_path_factory.mktemp("nusc_sweeps")
    scene = root / "trainval" / "scene-0001"
    for sub in ("scene", "lidar_top", "cam_front", "annotation", "pose",
                "timestamp", "intermediate/000", "intermediate/001"):
        (scene / sub).mkdir(parents=True)
    nf = 2
    (scene / "scene/stats.json").write_text(json.dumps(dict(
        nbr_samples=nf, token="abc", description="synthetic",
        sample_tokens=["t0", "t1"], logfile="log", date_captured="2020",
        vehicle="car", location="somewhere")))
    (scene / "scene/calib.json").write_text(json.dumps(dict(
        lidar_top=dict(rotation=[1, 0, 0, 0], translation=[0, 0, 1.8]),
        cam_front=dict(rotation=[1, 0, 0, 0], translation=[1.5, 0, 1.6],
                       camera_intrinsic=[[1266, 0, 800], [0, 1266, 450],
                                         [0, 0, 1]]))))
    (scene / "scene/tokens.json").write_text(json.dumps(dict(
        lidar_top=["lt0", "lt1"], cam_front=["cf0", "cf1"])))
    rng = np.random.default_rng(7)
    for f in range(nf):
        pts = np.concatenate([rng.uniform(-20, 20, (128, 3)),
                              rng.uniform(0, 1, (128, 2))],
                             axis=1).astype(np.float32)
        pts.tofile(scene / "lidar_top" / ("%03d.pcd" % f))
        from PIL import Image
        Image.new("RGB", (160, 90)).save(
            scene / "cam_front" / ("%03d.jpg" % f))
        (scene / "annotation" / ("%03d.json" % f)).write_text("[]")
        # keyframe ego pose: x = 2 * f
        (scene / "pose" / ("%03d.json" % f)).write_text(json.dumps(dict(
            lidar_top=dict(rotation=[1, 0, 0, 0],
                           translation=[2.0 * f, 0.0, 0.0]),
            cam_front=dict(rotation=[1, 0, 0, 0],
                           translation=[2.0 * f, 0.0, 0.0]))))
        (scene / "timestamp" / ("%03d.json" % f)).write_text(json.dumps(
            dict(lidar_top=1_000_000 * f, cam_front=1_000_000 * f + 50)))
        # two sweeps per keyframe, ego displaced -1.0 / -0.5 in x, each
        # 100/50 ms older than the keyframe
        meta = dict(cam_front=[], lidar_top=[])
        for si, (dx, age) in enumerate([(-1.0, 100_000), (-0.5, 50_000)]):
            spts = np.concatenate([rng.uniform(-20, 20, (64, 3)),
                                   rng.uniform(0, 1, (64, 2))],
                                  axis=1).astype(np.float32)
            fname = "sweep%d.pcd" % si
            spts.tofile(scene / "intermediate" / ("%03d" % f) / fname)
            meta["lidar_top"].append(dict(
                file=fname, timestamp=1_000_000 * f - age,
                rotation=[1, 0, 0, 0],
                translation=[2.0 * f + dx, 0.0, 0.0]))
        (scene / "intermediate" / ("%03d" % f) / "meta.json").write_text(
            json.dumps(meta))
    return root


@pytest.fixture(scope="module")
def loader(dataset):
    from d3d_tpu.dataset.nuscenes import NuscenesLoader

    return NuscenesLoader(dataset, phase="training",
                          trainval_split="official")


def test_accumulate_geometry(loader):
    cloud = accumulate_sweeps(loader, 0, nsweeps=10)
    assert cloud.shape == (128 + 64 + 64, 5)
    assert cloud.dtype == np.float32
    # keyframe points first, dt == 0, coordinates untouched
    key = np.asarray(loader.lidar_data(0))
    np.testing.assert_allclose(cloud[:128, :3], key[:, :3], atol=1e-6)
    np.testing.assert_allclose(cloud[:128, 4], 0.0)
    # newest sweep (dx=-0.5, 50 ms) comes right after the keyframe
    items = loader.intermediate_data(0, names="lidar_top")
    newest = np.asarray(items[-1].data)
    np.testing.assert_allclose(cloud[128:192, 4], 0.05, atol=1e-6)
    # identity rotations: compensation is a pure x shift by the ego delta
    np.testing.assert_allclose(cloud[128:192, 0], newest[:, 0] - 0.5,
                               atol=1e-5)
    np.testing.assert_allclose(cloud[128:192, 1:3], newest[:, 1:3],
                               atol=1e-5)
    # oldest sweep: dt 0.1 s, shift -1.0
    oldest = np.asarray(items[0].data)
    np.testing.assert_allclose(cloud[192:, 4], 0.1, atol=1e-6)
    np.testing.assert_allclose(cloud[192:, 0], oldest[:, 0] - 1.0,
                               atol=1e-5)


def test_nsweeps_limit_and_cap(loader):
    only_key = accumulate_sweeps(loader, 0, nsweeps=1)
    assert only_key.shape == (128, 5)
    two = accumulate_sweeps(loader, 0, nsweeps=2)
    assert two.shape == (128 + 64, 5)  # newest sweep only
    np.testing.assert_allclose(two[128:, 4], 0.05, atol=1e-6)
    capped = accumulate_sweeps(loader, 0, nsweeps=10, max_points=150)
    assert capped.shape == (150, 5)


def test_model_consumes_multisweep(loader, rng):
    """The 5-channel accumulated cloud flows through pillarize and a tiny
    CenterPoint forward (dt becomes an extra decoration channel)."""
    from d3d_tpu.models.centerpoint import CenterPoint, CenterPointConfig
    from d3d_tpu.models.pointpillars import PointPillarsConfig, pillarize

    cloud = accumulate_sweeps(loader, 0, nsweeps=10)
    pcfg = PointPillarsConfig(
        bounds=(-20.0, 20.0, -20.0, 20.0, -4.0, 4.0), grid=(16, 16),
        max_pillars=128, max_points_per_pillar=8, pfn_features=16,
        backbone_channels=(16,), backbone_blocks=(1,),
        upsample_channels=16)
    feats, coords, valid = pillarize(jnp.asarray(cloud), pcfg)
    assert feats.shape == (128, 8, 10)  # 5 raw + 3 centroid + 2 center offs
    ccfg = CenterPointConfig(
        bounds=pcfg.bounds, grid=(16, 16), num_classes=1,
        backbone_channels=(16,), backbone_blocks=(1,), upsample_channels=16,
        head_channels=16, top_k=8)
    model = CenterPoint(ccfg)
    variables = model.init(jax.random.PRNGKey(0), feats[None], coords[None],
                           valid[None], train=False)
    out = model.apply(variables, feats[None], coords[None], valid[None],
                      train=False)
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree.leaves(out))


def test_10sweep_preset_consumes_accumulated_cloud(loader):
    """The 10-sweep CenterPoint preset's pillarization accepts the
    5-column accumulated cloud (scaled down for the test)."""
    import jax.numpy as jnp

    from d3d_tpu.models.pointpillars import PointPillarsConfig, pillarize
    from d3d_tpu.models.presets import centerpoint_nuscenes_10sweep

    cfg = centerpoint_nuscenes_10sweep(grid=(32, 32), max_pillars=256,
                                       max_points_per_pillar=8)
    cloud = accumulate_sweeps(loader, 0, nsweeps=10)
    pcfg = PointPillarsConfig(
        bounds=cfg.bounds, grid=cfg.grid, max_pillars=cfg.max_pillars,
        max_points_per_pillar=cfg.max_points_per_pillar)
    feats, coords, valid = pillarize(jnp.asarray(cloud), pcfg)
    assert feats.shape[-1] == 10  # 5 raw + 3 centroid + 2 center offsets
    assert int(valid.sum()) > 0
