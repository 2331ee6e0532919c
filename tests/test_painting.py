"""PointPainting fusion: bilinear oracle vs scipy, projection gating,
and the painted cloud flowing through PointPillars unchanged."""

import numpy as np
from scipy.ndimage import map_coordinates

import jax
import jax.numpy as jnp

from d3d_tpu.ops.painting import bilinear_sample, paint_points


class TestBilinear:
    def test_matches_scipy_oracle(self, rng):
        img = rng.normal(size=(12, 17, 3)).astype(np.float32)
        u = rng.uniform(0, 16, 40).astype(np.float32)
        v = rng.uniform(0, 11, 40).astype(np.float32)
        got = np.asarray(bilinear_sample(
            jnp.asarray(img), jnp.asarray(u), jnp.asarray(v)))
        for c in range(3):
            want = map_coordinates(img[:, :, c], [v, u], order=1)
            np.testing.assert_allclose(got[:, c], want, rtol=0, atol=1e-5)

    def test_out_of_bounds_fill(self, rng):
        img = jnp.ones((8, 8, 2), jnp.float32)
        u = jnp.asarray([-1.0, 3.0, 9.0], jnp.float32)
        v = jnp.asarray([4.0, 4.0, 4.0], jnp.float32)
        out = np.asarray(bilinear_sample(img, u, v, fill=-5.0))
        np.testing.assert_array_equal(out[0], [-5.0, -5.0])
        np.testing.assert_array_equal(out[1], [1.0, 1.0])
        np.testing.assert_array_equal(out[2], [-5.0, -5.0])


class TestPainting:
    K = np.array([[50.0, 0, 32.0], [0, 50.0, 24.0], [0, 0, 1.0]],
                 np.float32)

    def test_projection_and_gating(self, rng):
        # one point straight ahead -> principal point; one behind -> fill
        pts = np.array([[0.0, 0.0, 10.0, 0.5],
                        [0.0, 0.0, -5.0, 0.5]], np.float32)
        img = rng.normal(size=(48, 64, 4)).astype(np.float32)
        out = np.asarray(paint_points(
            jnp.asarray(pts), jnp.asarray(img), jnp.asarray(self.K),
            fill=0.0))
        assert out.shape == (2, 8)
        np.testing.assert_allclose(out[0, 4:], img[24, 32], atol=1e-5)
        np.testing.assert_array_equal(out[1, 4:], 0.0)

    def test_extrinsic_transform(self, rng):
        # lidar FLU -> camera RDF (x_c = -y_l, y_c = -z_l, z_c = x_l)
        ext = np.zeros((4, 4), np.float32)
        ext[0, 1] = -1.0
        ext[1, 2] = -1.0
        ext[2, 0] = 1.0
        ext[3, 3] = 1.0
        pts = np.array([[10.0, 0.0, 0.0, 1.0]], np.float32)  # ahead
        img = rng.normal(size=(48, 64, 2)).astype(np.float32)
        out = np.asarray(paint_points(
            jnp.asarray(pts), jnp.asarray(img), jnp.asarray(self.K),
            extrinsic=jnp.asarray(ext)))
        np.testing.assert_allclose(out[0, 4:], img[24, 32], atol=1e-5)

    def test_painted_cloud_through_pointpillars(self, rng):
        """The painted (N, 4 + C) cloud runs through pillarize + the
        model with no config/model changes (the PFN is a Dense)."""
        from tests.test_model import TINY
        from d3d_tpu.models import PointPillars, pillarize

        pts = np.stack([rng.random(512) * 16, rng.random(512) * 16 - 8,
                        rng.random(512) * 4 - 3, rng.random(512)],
                       axis=1).astype(np.float32)
        img = rng.random((48, 64, 3)).astype(np.float32)
        painted = paint_points(jnp.asarray(pts), jnp.asarray(img),
                               jnp.asarray(self.K))
        assert painted.shape == (512, 7)
        f, c, v = pillarize(painted, TINY)
        assert f.shape[-1] == 7 + 5  # features + decorations
        model = PointPillars(TINY)
        var = model.init(jax.random.PRNGKey(0), f[None], c[None], v[None])
        cls, box, dirs = model.apply(var, f[None], c[None], v[None])
        assert np.isfinite(np.asarray(cls)).all()


class TestMultiCamera:
    def test_first_seeing_camera_wins(self, rng):
        """Two opposite-facing cameras: each point painted by the one
        that sees it; a sideways point by neither -> fill."""
        K = np.array([[50.0, 0, 32.0], [0, 50.0, 24.0], [0, 0, 1.0]],
                     np.float32)
        from d3d_tpu.ops.painting import paint_points_multi

        fwd = np.eye(4, dtype=np.float32)        # cam z = world z
        back = np.eye(4, dtype=np.float32)       # looks along -z
        back[0, 0] = -1.0
        back[2, 2] = -1.0
        img0 = np.full((48, 64, 2), 1.0, np.float32)
        img1 = np.full((48, 64, 2), 2.0, np.float32)
        pts = np.array([[0.0, 0.0, 10.0, 0.1],   # ahead of cam0
                        [0.0, 0.0, -10.0, 0.1],  # ahead of cam1
                        [100.0, 0.0, 0.0, 0.1]], np.float32)  # neither
        out = np.asarray(paint_points_multi(
            jnp.asarray(pts), jnp.asarray(np.stack([img0, img1])),
            jnp.asarray(np.stack([K, K])),
            jnp.asarray(np.stack([fwd, back])), fill=-1.0))
        np.testing.assert_array_equal(out[0, 4:], [1.0, 1.0])
        np.testing.assert_array_equal(out[1, 4:], [2.0, 2.0])
        np.testing.assert_array_equal(out[2, 4:], [-1.0, -1.0])

    def test_matches_single_camera(self, rng):
        from d3d_tpu.ops.painting import paint_points, paint_points_multi

        K = np.array([[50.0, 0, 32.0], [0, 50.0, 24.0], [0, 0, 1.0]],
                     np.float32)
        ext = np.eye(4, dtype=np.float32)
        img = rng.normal(size=(48, 64, 3)).astype(np.float32)
        pts = np.stack([rng.uniform(-5, 5, 64), rng.uniform(-4, 4, 64),
                        rng.uniform(2, 30, 64), rng.random(64)],
                       axis=1).astype(np.float32)
        a = np.asarray(paint_points(jnp.asarray(pts), jnp.asarray(img),
                                    jnp.asarray(K),
                                    extrinsic=jnp.asarray(ext)))
        b = np.asarray(paint_points_multi(
            jnp.asarray(pts), jnp.asarray(img)[None],
            jnp.asarray(K)[None], jnp.asarray(ext)[None]))
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-6)


def test_painting_rig_matches_transformset(rng, tmp_path):
    """The rig built from a KITTI calibration must project points to
    the same pixels as TransformSet.project_points_to_camera (the
    fixture has no distortion)."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    import kitti_fixture as fx

    from d3d_tpu.dataset.kitti.object import KittiObjectLoader
    from d3d_tpu.ops.painting import _project, painting_rig

    fx.build_unzipped(tmp_path, nframes=1)
    calib = KittiObjectLoader(tmp_path, trainval_split=1.0) \
        .calibration_data(0)
    ks, exts = painting_rig(calib, ["cam2", "cam3"], frame_from="velo")
    assert ks.shape == (2, 3, 3) and exts.shape == (2, 4, 4)

    pts = np.stack([rng.uniform(5, 40, 32), rng.uniform(-8, 8, 32),
                    rng.uniform(-2, 1, 32)], axis=1)
    for i, cam in enumerate(["cam2", "cam3"]):
        uv, mask, dmask = calib.project_points_to_camera(
            pts, frame_to=cam, frame_from="velo", remove_outlier=False,
            return_dmask=True)
        u, v, ahead = _project(jnp.asarray(pts, jnp.float32),
                               jnp.asarray(ks[i]), jnp.asarray(exts[i]))
        sel = np.zeros(32, bool)
        sel[dmask] = True
        np.testing.assert_array_equal(np.asarray(ahead), sel)
        np.testing.assert_allclose(np.asarray(u)[sel], uv[sel, 0],
                                   rtol=1e-4, atol=0.2)
        np.testing.assert_allclose(np.asarray(v)[sel], uv[sel, 1],
                                   rtol=1e-4, atol=0.2)


def test_painting_rig_rotated_and_baseline_calibrations(rng):
    """The rig must factor out both the rotate=True FLU->RDF conversion
    (Waymo/nuScenes-style pinhole cams) and a 3x4 projection's baseline
    column (KITTI-360-style), matching project_points_to_camera."""
    from d3d_tpu.abstraction import TransformSet
    from d3d_tpu.ops.painting import _project, painting_rig

    ts = TransformSet("base")
    ts.set_intrinsic_lidar("velo")
    ts.set_extrinsic(np.eye(4), frame_to="velo")
    # FLU pinhole camera 1 m to the left, rotate=True folds FLU->RDF
    ts.set_intrinsic_pinhole("camflu", (1280, 960), 640, 480, 700, 700)
    t = np.eye(4)
    t[:3, 3] = [0.0, 1.0, 0.2]
    ts.set_extrinsic(t, frame_to="camflu")
    # RDF camera with a stereo baseline folded into a 3x4 projection
    p34 = np.array([[700.0, 0, 640, -350.0],
                    [0, 700.0, 480, 0],
                    [0, 0, 1, 0]])
    ts.set_intrinsic_camera("camstereo", p34, (1280, 960), rotate=False)
    t2 = np.eye(4)
    t2[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
    ts.set_extrinsic(t2, frame_to="camstereo")

    ks, exts = painting_rig(ts, ["camflu", "camstereo"],
                            frame_from="velo")
    pts = np.stack([rng.uniform(5, 40, 48), rng.uniform(-6, 6, 48),
                    rng.uniform(-2, 1, 48)], axis=1)
    for i, cam in enumerate(["camflu", "camstereo"]):
        uv, mask, dmask = ts.project_points_to_camera(
            pts, frame_to=cam, frame_from="velo", remove_outlier=False,
            return_dmask=True)
        u, v, ahead = _project(jnp.asarray(pts, jnp.float32),
                               jnp.asarray(ks[i]), jnp.asarray(exts[i]))
        sel = np.zeros(len(pts), bool)
        sel[dmask] = True
        np.testing.assert_array_equal(np.asarray(ahead), sel, err_msg=cam)
        np.testing.assert_allclose(np.asarray(u)[sel], uv[sel, 0],
                                   rtol=1e-4, atol=0.3, err_msg=cam)
        np.testing.assert_allclose(np.asarray(v)[sel], uv[sel, 1],
                                   rtol=1e-4, atol=0.3, err_msg=cam)


def test_painting_rig_waymo_loader(rng, tmp_path):
    """The Waymo loader's rotate=True FLU pinhole calibrations (the
    exact style the RQ factorization exists for) must pixel-match
    project_points_to_camera through the rig."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    import dataset_fixtures as dfx

    from d3d_tpu.dataset.waymo import WaymoLoader
    from d3d_tpu.ops.painting import _project, painting_rig

    dfx.build_waymo(tmp_path, nframes=1)
    loader = WaymoLoader(tmp_path, phase="training", trainval_split=1.0)
    calib = loader.calibration_data(0)
    cams = [c for c in loader.VALID_CAM_NAMES
            if c in calib.intrinsics]  # the fixture builds one camera
    # the rig documentedly ignores lens distortion: compare against a
    # distortion-free twin of the same calibration
    for cam in cams:
        meta = calib.intrinsics_meta[cam]
        meta.distort_coeffs = np.asarray([])
    ks, exts = painting_rig(calib, cams,
                            frame_from=loader.VALID_LIDAR_NAMES[0])
    pts = np.stack([rng.uniform(5, 40, 32), rng.uniform(-8, 8, 32),
                    rng.uniform(-2, 1, 32)], axis=1)
    for i, cam in enumerate(cams):
        uv, mask, dmask = calib.project_points_to_camera(
            pts, frame_to=cam, frame_from=loader.VALID_LIDAR_NAMES[0],
            remove_outlier=False, return_dmask=True)
        u, v, ahead = _project(jnp.asarray(pts, jnp.float32),
                               jnp.asarray(ks[i]), jnp.asarray(exts[i]))
        sel = np.zeros(len(pts), bool)
        sel[dmask] = True
        np.testing.assert_array_equal(np.asarray(ahead), sel, err_msg=cam)
        np.testing.assert_allclose(np.asarray(u)[sel], uv[sel, 0],
                                   rtol=1e-4, atol=0.5, err_msg=cam)
        np.testing.assert_allclose(np.asarray(v)[sel], uv[sel, 1],
                                   rtol=1e-4, atol=0.5, err_msg=cam)


def test_painted_cloud_through_voxelnext(rng):
    """Painted channels flow through the SPARSE family too (the voxel
    means carry all point columns; _SpConv is input-dim agnostic)."""
    from tests.test_voxelnext import TINY as VCFG, _cloud
    from d3d_tpu.models import VoxelNeXt, voxelnext_voxelize
    from d3d_tpu.ops.painting import paint_points

    K = np.array([[50.0, 0, 32.0], [0, 50.0, 24.0], [0, 0, 1.0]],
                 np.float32)
    pts = _cloud(rng, n=1024)
    img = rng.random((48, 64, 2)).astype(np.float32)
    painted = paint_points(jnp.asarray(pts), jnp.asarray(img),
                           jnp.asarray(K))
    assert painted.shape == (1024, 6)
    f, c, v = voxelnext_voxelize(painted, VCFG)
    assert f.shape[-1] == 6  # per-voxel means of every channel
    model = VoxelNeXt(VCFG)
    var = model.init(jax.random.PRNGKey(0), f[None], c[None], v[None])
    out = model.apply(var, f[None], c[None], v[None], train=False)
    assert np.isfinite(np.asarray(out["heatmap"])).all()
