"""Point-cloud training augmentation.

The reference devkit provides the toolchain (crops, box geometry) that
detection pipelines build augmentation from; this module closes that loop
with the standard lidar-detector augmentations (SECOND Sec. 3.3 /
PointPillars Sec. 2.3):

  * :func:`global_augment` — jitted joint transform of points + GT boxes:
    random y-flip, global z-rotation, uniform scale, translation noise.
    Pure device code with a `jax.random` key: deterministic, vmappable
    over a batch, runs in the (overlappable) input pipeline next to
    `prepare_targets`.
  * :func:`build_gt_database` / :func:`sample_ground_truths` — SECOND's
    GT-sampling: a database of annotation boxes + their interior points
    harvested with the framework's own :func:`~d3d_tpu.ops.box.box3dp_crop`,
    pasted into training frames with a BEV rotated-IoU collision check
    (host-side numpy: it mutates variable-length point sets, which is
    input-pipeline work, not device work).
"""

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["global_augment", "perobject_augment", "build_gt_database",
           "flip_camera_frame",
           "sample_ground_truths", "class_balanced_frame_indices"]


def class_balanced_frame_indices(frame_classes, rng, samples_per_class=None,
                                 shuffle=True):
    """CBGS-style epoch resampling (Zhu et al., "Class-balanced Grouping
    and Sampling for Point Cloud 3D Object Detection", 2019): group the
    frames by the classes they contain and draw the epoch evenly from
    every class group (with replacement), so rare-class frames repeat —
    the data-side half of the class-imbalance fix on nuScenes-like
    taxonomies. Frames containing no listed class are excluded (the
    official recipe drops object-free frames).

    :param frame_classes: per-frame iterables of class values present
    :param rng: ``np.random.Generator``
    :param samples_per_class: draws per class group (default: the size
        an even split of one epoch would give each group)
    :returns: int64 frame-index array, shuffled unless ``shuffle=False``
    """
    groups = {}
    for i, cs in enumerate(frame_classes):
        for c in set(cs):
            groups.setdefault(c, []).append(i)
    if not groups:
        return np.zeros(0, np.int64)
    spc = samples_per_class or int(np.ceil(len(frame_classes)
                                           / len(groups)))
    out = np.concatenate([
        rng.choice(np.asarray(idxs, np.int64), size=spc, replace=True)
        for _, idxs in sorted(groups.items())])
    if shuffle:
        rng.shuffle(out)
    return out


def global_augment(key, points, gt_boxes, flip_prob=0.5, rot_range=0.7854,
                   scale_range=(0.95, 1.05), translate_std=0.2):
    """Jointly transform a frame's points and GT boxes.

    :param key: jax.random key
    :param points: (N, F) with xyz leading
    :param gt_boxes: (M, 7) [x, y, z, l, w, h, yaw]
    :returns: (points', gt_boxes') — same shapes/dtypes
    """
    kf, kr, ks, kt = jax.random.split(key, 4)
    xyz = points[:, :3]
    bx = gt_boxes

    # y-flip
    flip = jax.random.bernoulli(kf, flip_prob)
    sign = jnp.where(flip, -1.0, 1.0).astype(points.dtype)
    one = jnp.ones((), points.dtype)
    xyz = xyz * jnp.stack([one, sign, one])
    bx = bx.at[:, 1].multiply(sign).at[:, 6].multiply(sign)

    # global rotation about z
    theta = jax.random.uniform(kr, (), points.dtype,
                               -rot_range, rot_range)
    c, s = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.asarray([[c, -s], [s, c]], points.dtype)
    xyz = jnp.concatenate([xyz[:, :2] @ rot.T, xyz[:, 2:3]], axis=1)
    bxy = bx[:, :2] @ rot.T
    bx = jnp.concatenate([bxy, bx[:, 2:6], bx[:, 6:7] + theta], axis=1)

    # uniform scale
    scale = jax.random.uniform(ks, (), points.dtype, scale_range[0],
                               scale_range[1])
    xyz = xyz * scale
    bx = jnp.concatenate([bx[:, :6] * scale, bx[:, 6:7]], axis=1)

    # global translation noise
    shift = jax.random.normal(kt, (3,), points.dtype) * translate_std
    xyz = xyz + shift
    bx = bx.at[:, :3].add(shift)

    return jnp.concatenate([xyz, points[:, 3:]], axis=1), bx


def perobject_augment(key, points, gt_boxes, gt_mask, rot_range=0.3925,
                      translate_std=(1.0, 1.0, 0.5)):
    """Independently perturb each GT box and its interior points (SECOND
    Sec. 3.3 "noise per object"), fully on device with fixed shapes.

    Each box proposes a rotation about its own center plus a translation;
    a proposal is ACCEPTED only if its BEV footprint stays disjoint from
    every other box (both the others' proposals and their originals — a
    conservative one-shot check instead of the reference ecosystem's
    sequential retry loop, so acceptance is order-independent and
    vmappable). Rejected boxes keep their original pose. Points inside an
    accepted box move rigidly with it; all other points are untouched.

    :param key: jax.random key
    :param points: (N, F) with xyz leading
    :param gt_boxes: (M, 7) [x, y, z, l, w, h, yaw] (padded rows allowed)
    :param gt_mask: (M,) valid-box mask
    :returns: (points', gt_boxes') — same shapes/dtypes
    """
    from .ops.box import box3dp_crop
    from .ops.geometry_soa import rbox_iou_matrix

    m = gt_boxes.shape[0]
    kr, kt = jax.random.split(key)
    dtheta = jax.random.uniform(kr, (m,), gt_boxes.dtype, -rot_range,
                                rot_range)
    dt = jax.random.normal(kt, (m, 3), gt_boxes.dtype) \
        * jnp.asarray(translate_std, gt_boxes.dtype)

    prop = gt_boxes.at[:, 0:3].add(dt).at[:, 6].add(dtheta)

    def bev(b):
        return jnp.concatenate([b[:, 0:2], b[:, 3:5], b[:, 6:7]],
                               axis=1).astype(jnp.float32)

    # a proposal collides if it touches any OTHER box's proposal or
    # original footprint (self-pairs masked off the diagonal)
    off_diag = ~jnp.eye(m, dtype=bool)
    vv = gt_mask[:, None] & gt_mask[None, :] & off_diag
    ipp = rbox_iou_matrix(bev(prop), bev(prop))
    ipo = rbox_iou_matrix(bev(prop), bev(gt_boxes))
    collide = jnp.any(vv & ((ipp > 0) | (ipo > 0)), axis=1)
    accept = gt_mask & ~collide

    final = jnp.where(accept[:, None], prop, gt_boxes)

    # rigid transform of each accepted box's interior points: membership
    # against the ORIGINAL boxes (one batched crop), first owner wins
    inmask = box3dp_crop(points[:, :3], gt_boxes) & accept[:, None]  # (M, N)
    owned = jnp.any(inmask, axis=0)
    owner = jnp.argmax(inmask, axis=0)                               # (N,)

    c = gt_boxes[owner, 0:3]
    th = dtheta[owner]
    cs, sn = jnp.cos(th), jnp.sin(th)
    rel = points[:, :3] - c
    rx = rel[:, 0] * cs - rel[:, 1] * sn
    ry = rel[:, 0] * sn + rel[:, 1] * cs
    moved = jnp.stack([rx, ry, rel[:, 2]], axis=1) + c + dt[owner]
    xyz = jnp.where(owned[:, None], moved.astype(points.dtype),
                    points[:, :3])
    return jnp.concatenate([xyz, points[:, 3:]], axis=1), final


# ---------------------------------------------------------------------------
# GT sampling (host-side input pipeline)
# ---------------------------------------------------------------------------

def build_gt_database(frames, min_points=5):
    """Harvest a GT-sample database from ``(points, boxes7, labels)``
    frames.

    :param frames: iterable of tuples — points (N, F) float32, boxes
        (M, 7), labels (M,) int
    :returns: dict label -> list of (box7, interior_points) with points
        re-centered to the box frame (so pasting = rotate + translate)
    """
    from .ops.box import box3dp_crop

    db = {}
    for points, boxes, labels in frames:
        if len(boxes) == 0:
            continue
        crops = box3dp_crop(points[:, :3].astype(np.float32),
                            np.asarray(boxes, np.float32))
        for i, (box, lab) in enumerate(zip(boxes, labels)):
            mask = np.asarray(crops[i])  # (N,) bool interior mask
            if int(mask.sum()) < min_points:
                continue
            pts = np.array(points[mask], np.float32)
            # re-center to the box frame (undo yaw + translation)
            c, s = np.cos(-box[6]), np.sin(-box[6])
            local = pts.copy()
            local[:, 0] = c * (pts[:, 0] - box[0]) - s * (pts[:, 1] - box[1])
            local[:, 1] = s * (pts[:, 0] - box[0]) + c * (pts[:, 1] - box[1])
            local[:, 2] = pts[:, 2] - box[2]
            db.setdefault(int(lab), []).append(
                (np.asarray(box, np.float32), local))
    return db


def sample_ground_truths(rng, db, points, gt_boxes, gt_labels,
                         max_per_class=10, iou_threshold=0.0):
    """Paste sampled GT objects into a frame (SECOND's sampling step).

    Candidates are drawn per class from ``db`` at their ORIGINAL pose and
    rejected if their BEV rotated IoU with any existing (or previously
    accepted) box exceeds ``iou_threshold``.

    :returns: (points', gt_boxes', gt_labels') numpy arrays
    """
    from .ops.box import box2d_iou

    def bev(b):
        return np.concatenate([b[..., 0:2], b[..., 3:5], b[..., 6:7]],
                              axis=-1)

    cur_boxes = list(np.asarray(gt_boxes, np.float32))
    cur_labels = list(np.asarray(gt_labels))
    add_points = []
    for lab, samples in db.items():
        have = sum(1 for l in cur_labels if int(l) == int(lab))
        want = max_per_class - have
        if want <= 0 or not samples:
            continue
        order = rng.permutation(len(samples))
        for j in order[: 3 * want]:
            if want <= 0:
                break
            box, local = samples[j]
            if cur_boxes:
                ious = np.asarray(box2d_iou(
                    bev(box[None]), bev(np.stack(cur_boxes)),
                    method="rbox"))[0]
                if ious.max() > iou_threshold:
                    continue
            # place the stored interior points at the box pose
            c, s = np.cos(box[6]), np.sin(box[6])
            pts = local.copy()
            pts[:, 0] = c * local[:, 0] - s * local[:, 1] + box[0]
            pts[:, 1] = s * local[:, 0] + c * local[:, 1] + box[1]
            pts[:, 2] = local[:, 2] + box[2]
            add_points.append(pts)
            cur_boxes.append(box)
            cur_labels.append(lab)
            want -= 1

    if add_points:
        points = np.concatenate([np.asarray(points, np.float32)]
                                + add_points, axis=0)
    return (np.asarray(points, np.float32),
            np.stack(cur_boxes) if cur_boxes else np.zeros((0, 7), np.float32),
            np.asarray(cur_labels))


def flip_camera_frame(image, intrinsics, gt_boxes):
    """Horizontal-mirror augmentation for camera 3D detection (the one
    safe geometric augmentation for monocular depth — rotations and
    crops break the projective geometry the network must learn).

    Mirrors the image columns, reflects the principal point
    (``cx' = W - 1 - cx``), negates camera-frame x and reflects the
    yaw about the camera y axis (``ry' = pi - ry``, wrapped) — so
    ``assign_mono3d_targets`` on the flipped triple produces exactly
    the mirrored supervision.

    :param image: (H, W, 3); ``intrinsics`` (3, 3); ``gt_boxes`` (M, 7)
        camera-frame [x, y, z, l, w, h, ry]
    :returns: (image', intrinsics', gt_boxes')
    """
    import jax.numpy as jnp

    w = image.shape[1]
    img = image[:, ::-1]
    k = jnp.asarray(intrinsics)
    k = k.at[0, 2].set(w - 1.0 - k[0, 2])
    b = jnp.asarray(gt_boxes)
    ry = jnp.pi - b[:, 6]
    ry = jnp.where(ry > jnp.pi, ry - 2 * jnp.pi, ry)
    b = b.at[:, 0].set(-b[:, 0]).at[:, 6].set(ry)
    return img, k, b
