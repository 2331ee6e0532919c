"""PointPainting: camera -> lidar feature fusion.

Vora et al., "PointPainting: Sequential Fusion for 3D Object Detection"
(CVPR 2020, arXiv:1911.10150): project every lidar point into a camera
feature map (typically per-class semantic scores) and append the
bilinearly-sampled features to the point's channels; the painted cloud
then feeds ANY lidar detector unchanged. d3d_tpu's voxelizers carry
arbitrary point-feature columns (``pillarize``/``second_voxelize`` keep
all F input channels and the PFN is a Dense layer), so painting composes
with every lidar family in :mod:`d3d_tpu.models` with zero model
changes.

TPU shape: one jitted program — a (3, 3)/(4, 4) matmul, an elementwise
projection, and four clamped gathers for the bilinear sample. No host
round-trip between the camera net and the lidar net when both run on
device.
"""

import jax
import jax.numpy as jnp

__all__ = ["paint_points", "paint_points_multi", "painting_rig",
           "bilinear_sample"]


def _project(xyz, intrinsics, extrinsic=None):
    """Pinhole projection shared by the single- and multi-camera
    painters: returns (u, v, ahead) with behind-lens rows guarded."""
    if extrinsic is not None:
        xyz = xyz @ extrinsic[:3, :3].T + extrinsic[:3, 3]
    z = xyz[:, 2]
    ahead = z > 1e-3
    zs = jnp.where(ahead, z, 1.0)
    u = intrinsics[0, 0] * xyz[:, 0] / zs + intrinsics[0, 2]
    v = intrinsics[1, 1] * xyz[:, 1] / zs + intrinsics[1, 2]
    return u, v, ahead


@jax.jit
def bilinear_sample(image, u, v, valid=None, fill=0.0):
    """Bilinearly sample ``image`` (H, W, C) at pixel coordinates
    (u = column, v = row); out-of-bounds or ``~valid`` samples return
    ``fill``. Border-clamped gathers, mask applied after."""
    h, w = image.shape[0], image.shape[1]
    inb = (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1)
    if valid is not None:
        inb = inb & valid
    u = jnp.clip(u, 0.0, w - 1.0)
    v = jnp.clip(v, 0.0, h - 1.0)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, w - 1)
    v1 = jnp.minimum(v0 + 1, h - 1)
    fu = (u - u0.astype(u.dtype))[:, None]
    fv = (v - v0.astype(v.dtype))[:, None]
    s = (image[v0, u0] * (1 - fu) * (1 - fv)
         + image[v0, u1] * fu * (1 - fv)
         + image[v1, u0] * (1 - fu) * fv
         + image[v1, u1] * fu * fv)
    return jnp.where(inb[:, None], s, jnp.asarray(fill, s.dtype))


@jax.jit
def paint_points(points, image_feats, intrinsics, extrinsic=None,
                 fill=0.0):
    """Append camera-plane features to every point (PointPainting).

    :param points: (N, F) cloud, xyz first (lidar frame — or already
        camera frame when ``extrinsic`` is None)
    :param image_feats: (H, W, C) feature map in the camera plane
        (semantic scores, heatmaps, learned features)
    :param intrinsics: (3, 3) camera matrix
    :param extrinsic: optional (4, 4) lidar->camera homogeneous
        transform
    :param fill: feature value for points behind the camera or
        projecting outside the image
    :returns: (N, F + C) painted cloud
    """
    u, v, ahead = _project(points[:, :3], intrinsics, extrinsic)
    feats = bilinear_sample(image_feats, u, v, valid=ahead, fill=fill)
    return jnp.concatenate([points, feats.astype(points.dtype)], axis=-1)


@jax.jit
def paint_points_multi(points, image_feats, intrinsics, extrinsics,
                       fill=0.0):
    """Paint from a CAMERA RIG (e.g. nuScenes' six cameras): each point
    takes its features from the first camera (in stacking order) that
    sees it in front of the lens and inside the image; points no camera
    sees get ``fill``. One vmapped program — per-camera projections run
    as a batched matmul + gather.

    :param image_feats: (Ncam, H, W, C) per-camera feature maps
    :param intrinsics: (Ncam, 3, 3); ``extrinsics`` (Ncam, 4, 4)
        lidar->camera transforms
    :returns: (N, F + C) painted cloud
    """
    xyz = points[:, :3]

    def one(feats, k, ext):
        u, v, ahead = _project(xyz, k, ext)
        h, w = feats.shape[0], feats.shape[1]
        seen = ahead & (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1)
        return bilinear_sample(feats, u, v, valid=ahead, fill=fill), seen

    feats, seen = jax.vmap(one)(image_feats, intrinsics, extrinsics)
    # first seeing camera wins; unseen points -> fill
    first = jnp.argmax(seen, axis=0)                      # (N,)
    any_seen = jnp.any(seen, axis=0)
    chosen = jnp.take_along_axis(
        feats, first[None, :, None], axis=0)[0]           # (N, C)
    chosen = jnp.where(any_seen[:, None], chosen,
                       jnp.asarray(fill, chosen.dtype))
    return jnp.concatenate([points, chosen.astype(points.dtype)],
                           axis=-1)


def painting_rig(calib, cameras, frame_from=None):
    """Build :func:`paint_points_multi`'s ``(intrinsics, extrinsics)``
    stacks from a dataset calibration (``TransformSet``). The stored
    camera "intrinsic" is a PROJECTION matrix that may carry a folded
    axis conversion (``rotate=True`` FLU->RDF, e.g. Waymo/nuScenes) or
    a 3x4 fourth column (a stereo baseline, e.g. KITTI-360's
    ``P_rect_01``); both are factored OUT here — RQ-decompose into the
    pure upper-triangular K and move the rotation + baseline into the
    returned extrinsic — so ``_project``'s plain-pinhole math sees
    exactly what ``project_points_to_camera`` computes. Host-side
    numpy, once per calibration. Lens distortion is ignored — painting
    samples a FEATURE map, for which the few-pixel distortion error is
    noise (use ``project_points_to_camera`` when exact distorted pixels
    matter).

    :returns: (intrinsics (Ncam, 3, 3) f32, extrinsics (Ncam, 4, 4) f32)
    """
    import numpy as np
    import scipy.linalg

    ks, exts = [], []
    for cam in cameras:
        m = calib.intrinsics.get(cam)
        if m is None:
            m = getattr(calib.intrinsics_meta[cam], "intri_matrix", None)
        if m is None:
            raise ValueError(f"{cam!r} has no camera projection matrix")
        m = np.asarray(m, np.float64)
        rt = np.asarray(
            calib.get_extrinsic(frame_to=cam, frame_from=frame_from),
            np.float64)
        k3 = m[:, :3]
        # fourth column = K * extra translation (stereo baseline)
        off = (np.linalg.solve(k3, m[:, 3]) if m.shape[1] == 4
               else np.zeros(3))
        # k3 = K (upper triangular) @ C (folded axis-conversion rotation)
        kp, crot = scipy.linalg.rq(k3)
        sgn = np.sign(np.diag(kp))
        sgn[sgn == 0] = 1.0
        kp = kp * sgn[None, :]          # positive-diagonal K ...
        crot = crot * sgn[:, None]      # ... sign absorbed into C
        conv = np.eye(4)
        conv[:3, :3] = crot
        conv[:3, 3] = crot @ off
        ks.append((kp / kp[2, 2]).astype(np.float32))
        exts.append((conv @ rt).astype(np.float32))
    return np.stack(ks), np.stack(exts)
