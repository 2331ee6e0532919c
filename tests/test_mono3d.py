"""Mono3D (camera) family: target/decode projective roundtrip, the
KITTI-convention parity of the target assembly vs the dataset loader's
parse_label, forward contract, overfit smoke, and the detector factory."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp
import optax

from d3d_tpu.models import Mono3D, Mono3DConfig, make_mono3d_detector
from d3d_tpu.models.mono3d import (assign_mono3d_targets, decode_mono3d,
                                   make_train_step, mono3d_loss,
                                   mono3d_to_targets)

TINY = Mono3DConfig(
    image_size=(96, 128),
    stride=4,
    backbone_channels=(8, 16, 32),
    head_channels=16,
    num_classes=2,
    top_k=8,
    dim_priors=((3.88, 1.63, 1.53), (0.84, 0.66, 1.76)),
)

K = np.array([[60.0, 0.0, 64.0],
              [0.0, 60.0, 48.0],
              [0.0, 0.0, 1.0]], np.float32)


def _gt_cam(rng, m=3):
    """Camera-frame [x, y, z, l, w, h, ry] bottom-center boxes that
    project inside the image."""
    z = rng.uniform(8, 30, m)
    x = rng.uniform(-0.5, 0.5, m) * z * 0.8
    y = rng.uniform(0.5, 1.5, m)
    return np.stack([
        x, y, z, rng.uniform(3, 4.5, m), rng.uniform(1.4, 1.9, m),
        rng.uniform(1.4, 1.8, m), rng.uniform(-np.pi, np.pi, m)],
        axis=1).astype(np.float32)


class TestTargetsDecode:
    def test_roundtrip_recovers_boxes(self, rng):
        """Outputs synthesized FROM the targets must decode back to the
        ground truth (projective geometry closes)."""
        gt = _gt_cam(rng, 3)
        labels = np.array([0, 1, 0], np.int32)
        t = assign_mono3d_targets(TINY, jnp.asarray(K), jnp.asarray(gt),
                                  jnp.asarray(labels),
                                  jnp.ones(3, bool))
        assert bool(np.asarray(t["mask"]).all())
        h, w = TINY.out_size
        hm = np.full((h, w, 2), -12.0, np.float32)
        reg = np.zeros((h, w, 8), np.float32)
        cell = np.asarray(t["cell"])
        vec = np.asarray(t["vec"])
        for m in range(3):
            iv, iu = divmod(int(cell[m]), w)
            hm[iv, iu, labels[m]] = 10.0
            reg[iv, iu] = vec[m]
        outputs = dict(
            heatmap=jnp.asarray(hm), offset=jnp.asarray(reg[..., 0:2]),
            depth=jnp.asarray(reg[..., 2:3]), dim=jnp.asarray(reg[..., 3:6]),
            rot=jnp.asarray(reg[..., 6:8]))
        boxes, scores, lab = decode_mono3d(TINY, outputs, jnp.asarray(K))
        boxes = np.asarray(boxes)[:3]
        order = np.argsort(
            [np.argmin(np.abs(gt[:, 2] - b[2])) for b in boxes])
        boxes = boxes[order]
        for m in range(3):
            np.testing.assert_allclose(boxes[m, :6], gt[m, :6],
                                       rtol=1e-4, atol=2e-3)
            # ry recovered modulo 2 pi
            d = np.abs(np.angle(np.exp(1j * (boxes[m, 6] - gt[m, 6]))))
            assert d < 1e-3
        assert sorted(np.asarray(lab)[:3].tolist()) == \
            sorted(labels.tolist())

    def test_heatmap_peak_at_projection(self, rng):
        gt = _gt_cam(rng, 1)
        t = assign_mono3d_targets(TINY, jnp.asarray(K), jnp.asarray(gt),
                                  jnp.zeros(1, jnp.int32),
                                  jnp.ones(1, bool))
        hm = np.asarray(t["heatmap"])[:, :, 0]
        iv, iu = np.unravel_index(np.argmax(hm), hm.shape)
        yc = gt[0, 1] - gt[0, 5] / 2
        u = (K[0, 0] * gt[0, 0] / gt[0, 2] + K[0, 2]) / TINY.stride
        v = (K[1, 1] * yc / gt[0, 2] + K[1, 2]) / TINY.stride
        assert (iu, iv) == (int(u), int(v))
        assert hm[iv, iu] == 1.0

    def test_velo_conversion_matches_parse_label(self, rng):
        """mono3d_to_targets with a calib trio must reproduce the KITTI
        object loader's camera->velo box convention exactly."""
        from d3d_tpu.dataset.kitti.object import _cam_to_velo, parse_label
        from d3d_tpu.dataset.kitti.utils import KittiObjectClass

        tr = np.eye(4)[:3]
        tr[:3, :3] = Rotation.from_euler(
            "xyz", [0.01, -0.02, 1.55]).as_matrix()
        tr[:, 3] = [0.27, -0.01, -0.06]
        rect = Rotation.from_euler("zyx", [0.002, -0.001, 0.003])
        raw = {"Tr_velo_to_cam": tr.reshape(-1),
               "R0_rect": rect.as_matrix().reshape(-1)}

        box = [4.5, 1.2, 14.0, 3.9, 1.6, 1.5, 0.6]  # x y z l w h ry
        # KITTI label row: cls tr occ alpha bbox4 h w l x y z ry
        row = [KittiObjectClass.Car, 0.0, 0, 0.0, 0, 0, 10, 10,
               box[5], box[4], box[3], box[0], box[1], box[2], box[6]]
        want = parse_label([row], raw)[0]

        got = mono3d_to_targets(
            np.asarray([box], np.float32), np.asarray([0.9]),
            np.asarray([0], np.int32), [KittiObjectClass.Car],
            cam_to_velo=_cam_to_velo(raw), score_threshold=0.0)[0]
        np.testing.assert_allclose(got.position, want.position, atol=1e-6)
        np.testing.assert_allclose(got.dimension, want.dimension,
                                   atol=1e-6)
        q = (got.orientation.inv() * want.orientation).magnitude()
        assert q < 1e-6


class TestModel:
    def _images(self, rng, gt, b=1):
        """Bright rectangles at the projected box locations on noise."""
        h, w = TINY.image_size
        img = rng.random((b, h, w, 3)).astype(np.float32) * 0.1
        for bx in gt:
            u = int(K[0, 0] * bx[0] / bx[2] + K[0, 2])
            v = int(K[1, 1] * (bx[1] - bx[5] / 2) / bx[2] + K[1, 2])
            su = max(int(K[0, 0] * bx[3] / bx[2] / 2), 2)
            sv = max(int(K[1, 1] * bx[5] / bx[2] / 2), 2)
            img[:, max(v - sv, 0):v + sv, max(u - su, 0):u + su, :] = 1.0
        return img

    def test_forward_contract(self, rng):
        model = Mono3D(TINY)
        img = jnp.asarray(rng.random((1, 96, 128, 3)), jnp.float32)
        var = model.init(jax.random.PRNGKey(0), img)
        out = model.apply(var, img, train=False)
        h, w = TINY.out_size
        assert out["heatmap"].shape == (1, h, w, 2)
        assert out["offset"].shape == (1, h, w, 2)
        assert out["depth"].shape == (1, h, w, 1)
        assert np.isfinite(np.asarray(out["heatmap"])).all()

    def test_train_step_overfits_one_batch(self, rng):
        gt = _gt_cam(rng, 2)
        batch = dict(
            images=jnp.asarray(self._images(rng, gt)),
            intrinsics=jnp.asarray(K)[None],
            gt_boxes=jnp.asarray(gt)[None],
            gt_labels=jnp.zeros((1, 2), jnp.int32),
            gt_mask=jnp.ones((1, 2), bool))
        model = Mono3D(TINY)
        var = model.init(jax.random.PRNGKey(0), batch["images"])
        opt = optax.adam(3e-3)
        step = jax.jit(make_train_step(model, opt, TINY))
        params, bstats = var["params"], var["batch_stats"]
        opt_state = opt.init(params)
        first = None
        for i in range(15):
            params, bstats, opt_state, aux = step(params, bstats,
                                                  opt_state, batch)
            if first is None:
                first = float(aux["total"])
        last = float(aux["total"])
        assert np.isfinite(last)
        assert last < 0.6 * first, (first, last)

    def test_detector_factory(self, rng):
        from d3d_tpu.dataset.kitti.utils import KittiObjectClass

        model = Mono3D(TINY)
        img = jnp.asarray(rng.random((1, 96, 128, 3)), jnp.float32)
        var = model.init(jax.random.PRNGKey(0), img)
        detect = make_mono3d_detector(
            model, var, TINY,
            [KittiObjectClass.Car, KittiObjectClass.Pedestrian],
            score_threshold=0.0)
        out = detect(np.asarray(img)[0], K)
        assert out.frame == "cam"
        for o in out:
            assert np.isfinite(o.position).all()
            assert o.position[2] > 0  # in front of the camera


def test_loader_gt_roundtrip(rng, tmp_path):
    """KITTI loader velo gt -> camera training boxes -> back to velo
    targets must reproduce the loader's objects exactly (the full
    training-data loop through the real calib chain)."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    import kitti_fixture as fx

    from d3d_tpu.dataset.kitti.object import KittiObjectLoader, _cam_to_velo
    from d3d_tpu.models.mono3d import (mono3d_gt_from_targets,
                                       mono3d_to_targets)

    fx.build_unzipped(tmp_path, nframes=2)
    loader = KittiObjectLoader(tmp_path, trainval_split=1.0)
    arr = loader.annotation_3dobject(0)
    assert len(arr) >= 1
    raw = loader.calibration_data(0, raw=True)
    trio = _cam_to_velo(raw)

    boxes, labels = mono3d_gt_from_targets(arr, cam_to_velo=trio)
    classes = sorted({o.tag_top for o in arr}, key=lambda c: c.value)
    lut = {int(c.value): i for i, c in enumerate(classes)}
    back = mono3d_to_targets(
        boxes, np.ones(len(arr)), np.asarray(
            [lut[int(l)] for l in labels], np.int32),
        classes, cam_to_velo=trio, frame="velo", score_threshold=0.0)
    assert len(back) == len(arr)
    for a, b in zip(arr, back):
        np.testing.assert_allclose(b.position, a.position, atol=1e-5)
        np.testing.assert_allclose(b.dimension, a.dimension, atol=1e-5)
        d = (a.orientation.inv() * b.orientation).magnitude()
        # ry only captures the yaw-about-camera-y part; the fixture's
        # objects are yaw-only, so the full orientation must return
        assert float(d) < 1e-5


def test_flip_augmentation_mirrors_targets(rng):
    """assign_mono3d_targets on the flipped (image, K, boxes) must place
    centers at mirrored cells with identical depth/dim targets."""
    from d3d_tpu.augment import flip_camera_frame

    gt = _gt_cam(rng, 3)
    img = rng.random((96, 128, 3)).astype(np.float32)
    t0 = assign_mono3d_targets(TINY, jnp.asarray(K), jnp.asarray(gt),
                               jnp.zeros(3, jnp.int32), jnp.ones(3, bool))
    img2, k2, gt2 = flip_camera_frame(img, K, gt)
    t1 = assign_mono3d_targets(TINY, k2, gt2, jnp.zeros(3, jnp.int32),
                               jnp.ones(3, bool))
    assert bool(np.asarray(t1["mask"]).all())
    # image mirrored
    np.testing.assert_array_equal(np.asarray(img2), img[:, ::-1])
    # the projected center pixel mirrors EXACTLY in continuous coords
    # (cells quantize by floor, so compare cell*stride + offset)
    w_img = img.shape[1]
    for m in range(3):
        c0, c1 = int(t0["cell"][m]), int(t1["cell"][m])
        u0 = (c0 % TINY.out_size[1] + float(t0["vec"][m, 0])) * TINY.stride
        u1 = (c1 % TINY.out_size[1] + float(t1["vec"][m, 0])) * TINY.stride
        np.testing.assert_allclose(u1, (w_img - 1) - u0, atol=1e-3)
        # same row
        assert c0 // TINY.out_size[1] == c1 // TINY.out_size[1]
    # depth and dimension targets unchanged; flip twice = identity
    np.testing.assert_allclose(np.asarray(t1["vec"])[:, 2:6],
                               np.asarray(t0["vec"])[:, 2:6], atol=1e-6)
    img3, k3, gt3 = flip_camera_frame(img2, k2, gt2)
    np.testing.assert_array_equal(np.asarray(img3), img)
    np.testing.assert_allclose(np.asarray(k3), K, atol=1e-6)
    d = np.angle(np.exp(1j * (np.asarray(gt3)[:, 6] - gt[:, 6])))
    np.testing.assert_allclose(np.asarray(gt3)[:, :6], gt[:, :6],
                               atol=1e-6)
    np.testing.assert_allclose(d, 0.0, atol=1e-6)


def test_batchnorm_folding(rng):
    """fold_batchnorm folds the camera model's Conv/ConvTranspose + BN
    pairs; train=False outputs identical to float rounding."""
    from d3d_tpu.models.fold import fold_batchnorm

    model = Mono3D(TINY)
    img = jnp.asarray(rng.random((1, 96, 128, 3)), jnp.float32)
    var = model.init(jax.random.PRNGKey(0), img)
    # move batch stats off init values so the fold is non-trivial
    var = dict(var, batch_stats=jax.tree.map(
        lambda a: a + 0.25, var["batch_stats"]))
    want = model.apply(var, img, train=False)
    folded = fold_batchnorm(var)
    got = model.apply(folded, img, train=False)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(want[k]), rtol=0,
                                   atol=2e-5, err_msg=k)


def test_bfloat16_forward(rng):
    import dataclasses

    cfg = dataclasses.replace(TINY, dtype="bfloat16")
    model = Mono3D(cfg)
    img = jnp.asarray(rng.random((1, 96, 128, 3)), jnp.float32)
    var = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(var, img, train=False)
    assert out["heatmap"].dtype == jnp.float32
    assert all(np.isfinite(np.asarray(v)).all() for v in out.values())
