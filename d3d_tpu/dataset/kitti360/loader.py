"""KITTI-360 dataset loader (reference d3d/dataset/kitti360/loader.py).

Layout follows the official distribution: ``calibration(.zip)``,
``data_2d_raw``, ``data_3d_raw``, ``data_3d_bboxes``, ``data_3d_semantics``,
``data_poses`` (+ per-drive zips when ``inzip``).

The reference accumulates per-frame 3D semantic labels by reprojecting the
aggregated windows with a multiprocessing KD-tree pipeline
(loader.py:326-528, needs pcl/sklearn/filelock); here
:meth:`annotation_3dpoints` returns the aggregated static/dynamic window
points around the frame directly (cropped by radius in the world frame),
which serves the same training use without the heavyweight cache build."""

from pathlib import Path
from zipfile import ZipFile

import numpy as np
from scipy.interpolate import interp1d
from scipy.spatial.transform import Rotation
from sortedcontainers import SortedDict

from ...abstraction import EgoPose, ObjectTag, ObjectTarget3D, Target3DArray, TransformSet
from ...utils import EDict
from ..base import TrackingDatasetBase, expand_idx, expand_idx_name, split_trainval_seq
from ..kitti.utils import load_calib_file, load_image, load_timestamps, load_velo_scan
from ..zip import PatchedZipFile
from .utils import Kitti360Class, kittiId2label, load_bboxes, load_ply, load_sick_scan

__all__ = ["KITTI360Loader"]


class KITTI360Loader(TrackingDatasetBase):
    """Loader for KITTI-360; see the module docstring for the layout and
    :class:`d3d_tpu.dataset.base.TrackingDatasetBase` for parameters.

    :param interpolate_pose: KITTI-360 poses are sparse in frames; when True
        missing frames get time-interpolated poses, otherwise None
    """

    VALID_CAM_NAMES = ["cam1", "cam2", "cam3", "cam4"]  # 1,2 perspective
    VALID_LIDAR_NAMES = ["velo"]
    VALID_OBJ_CLASSES = Kitti360Class

    FRAME_PATH_MAP = dict(
        sick=("data_3d_raw", "sick_points", "data",
              "data_timestamps_sick.zip"),
        velo=("data_3d_raw", "velodyne_points", "data",
              "data_timestamps_velodyne.zip"),
        cam1=("data_2d_raw", "image_00", "data_rect",
              "data_timestamps_perspective.zip"),
        cam2=("data_2d_raw", "image_01", "data_rect",
              "data_timestamps_perspective.zip"),
        cam3=("data_2d_raw", "image_02", "data_rgb",
              "data_timestamps_fisheye.zip"),
        cam4=("data_2d_raw", "image_03", "data_rgb",
              "data_timestamps_fisheye.zip"),
    )

    def __init__(self, base_path, phase="training", inzip=False,
                 trainval_split=1, trainval_random=False,
                 trainval_byseq=False, nframes=0, interpolate_pose=True):
        super().__init__(base_path, inzip=inzip, phase=phase, nframes=nframes,
                         trainval_split=trainval_split,
                         trainval_random=trainval_random,
                         trainval_byseq=trainval_byseq)
        self.interpolate_pose = interpolate_pose

        frame_count = {}
        if self.inzip:
            for aname, ext in [("velodyne", ".bin"), ("image_00", ".png"),
                               ("image_01", ".png"), ("image_02", ".png"),
                               ("image_03", ".png")]:
                for archive in self.base_path.glob(
                        f"2013_05_28_drive_*_sync_{aname}.zip"):
                    with ZipFile(archive) as data:
                        # strip the known archive suffix: rfind('_') would
                        # only peel '_00' off image archives
                        seq = archive.stem[: -len(f"_{aname}")]
                        frame_count[seq] = sum(
                            1 for n in data.namelist() if n.endswith(ext))
                if frame_count:
                    break
        else:
            for ftype, fname, dname in [
                    ("data_3d_raw", "velodyne_points", "data"),
                    ("data_2d_raw", "image_00", "data_rect"),
                    ("data_2d_raw", "image_01", "data_rect"),
                    ("data_2d_raw", "image_02", "data_rgb"),
                    ("data_2d_raw", "image_03", "data_rgb")]:
                for seq_path in self.base_path.glob(
                        f"{ftype}/2013_05_28_drive_*_sync"):
                    sub = seq_path / fname / dname
                    if sub.exists():
                        frame_count[seq_path.name] = sum(
                            1 for _ in sub.iterdir())
                if frame_count:
                    break

        if not frame_count:
            raise ValueError("Cannot parse dataset, please check path, "
                             "inzip option and file structure")
        self.frame_dict = SortedDict(frame_count)
        reduced = SortedDict({k: max(v - self.nframes, 0)
                              for k, v in self.frame_dict.items()})
        self.frames = split_trainval_seq(phase, reduced, trainval_split,
                                         trainval_random, trainval_byseq)

        self._poses_idx = {}
        self._poses_t = {}
        self._poses_r = {}
        self._3dobjects_cache = {}
        self._3dobjects_ranges = {}
        self._timestamp_cache = {}
        self._calibration = None
        self._preload_calib()

    def __len__(self):
        return len(self.frames)

    @property
    def sequence_ids(self):
        return list(self.frame_dict.keys())

    @property
    def sequence_sizes(self):
        return dict(self.frame_dict)

    def _locate_frame(self, idx):
        from ..base import locate_windowed_frame
        return locate_windowed_frame(self.frames[idx], self.frame_dict,
                                     self.nframes)

    @expand_idx
    def identity(self, idx):
        return idx

    # -- calibration ----------------------------------------------------------
    def _preload_calib(self):
        import yaml

        if self.inzip:
            src = ZipFile(self.base_path / "calibration.zip")
            read = src.read
        else:
            src = None
            read = lambda f: (self.base_path / f).read_bytes()  # noqa: E731

        cam2pose = load_calib_file(
            src or self.base_path, "calibration/calib_cam_to_pose.txt")
        perspective = load_calib_file(
            src or self.base_path, "calibration/perspective.txt")
        cam2velo = np.fromstring(read("calibration/calib_cam_to_velo.txt"),
                                 sep=" ")
        sick2velo = np.fromstring(read("calibration/calib_sick_to_velo.txt"),
                                  sep=" ")
        intri3 = yaml.safe_load(read("calibration/image_02.yaml")[10:])
        intri4 = yaml.safe_load(read("calibration/image_03.yaml")[10:])
        if src is not None:
            src.close()

        calib = TransformSet("pose")
        calib.set_intrinsic_lidar("velo")
        calib.set_intrinsic_lidar("sick")
        calib.set_intrinsic_camera(
            "cam1", perspective["P_rect_00"].reshape(3, 4),
            perspective["S_rect_00"], rotate=False)
        calib.set_intrinsic_camera(
            "cam2", perspective["P_rect_01"].reshape(3, 4),
            perspective["S_rect_01"], rotate=False)

        def parse_mei(intri):
            """MEI fisheye model parameters -> pinhole-ish intrinsics."""
            size = (intri["image_width"], intri["image_height"])
            d = intri["distortion_parameters"]
            distorts = np.array([d["k1"], d["k2"], d["p1"], d["p2"], 0.0])
            p = intri["projection_parameters"]
            pmatrix = np.diag([p["gamma1"], p["gamma2"], 1.0])
            pmatrix[0, 2] = p["u0"]
            pmatrix[1, 2] = p["v0"]
            return size, pmatrix, distorts, intri["mirror_parameters"]["xi"]

        for frame, intri in (("cam3", intri3), ("cam4", intri4)):
            size, p, d, xi = parse_mei(intri)
            # rotate=False like cam1/cam2: calib_cam_to_pose extrinsics are
            # already in the native RDF camera convention
            calib.set_intrinsic_camera(frame, p, size, distort_coeffs=d,
                                       intri_matrix=p, mirror_coeff=xi,
                                       rotate=False)

        for frame, key in (("cam1", "image_00"), ("cam2", "image_01"),
                           ("cam3", "image_02"), ("cam4", "image_03")):
            calib.set_extrinsic(cam2pose[key].reshape(3, 4), frame_from=frame)
        calib.set_extrinsic(cam2velo.reshape(3, 4), frame_from="cam1",
                            frame_to="velo")
        calib.set_extrinsic(sick2velo.reshape(3, 4), frame_from="sick",
                            frame_to="velo")
        self._calibration = calib

    def calibration_data(self, idx):
        return self._calibration

    # -- sensor data -------------------------------------------------------------
    @expand_idx_name(VALID_CAM_NAMES)
    def camera_data(self, idx, names="cam1"):
        seq_id, frame_idx = idx
        _, folder, dname, _ = self.FRAME_PATH_MAP[names]
        fname = Path(seq_id, folder, dname, "%010d.png" % frame_idx)
        if self._return_file_path:
            return self.base_path / "data_2d_raw" / fname
        if self.inzip:
            with PatchedZipFile(self.base_path / f"{seq_id}_{folder}.zip",
                                to_extract=fname) as src:
                return load_image(src, fname)
        return load_image(self.base_path / "data_2d_raw", fname)

    @expand_idx_name(VALID_LIDAR_NAMES)
    def lidar_data(self, idx, names="velo", formatted=False):
        seq_id, frame_idx = idx
        fname = Path(seq_id, "velodyne_points", "data",
                     "%010d.bin" % frame_idx)
        if self._return_file_path:
            return self.base_path / "data_3d_raw" / fname
        if self.inzip:
            with PatchedZipFile(self.base_path / f"{seq_id}_velodyne.zip",
                                to_extract=fname) as src:
                return load_velo_scan(src, fname, formatted=formatted)
        return load_velo_scan(self.base_path / "data_3d_raw", fname,
                              formatted=formatted)

    def _load_sick_scan(self, seq_id, sick_idx):
        fname = Path(seq_id, "sick_points", "data", "%010d.bin" % sick_idx)
        if self.inzip:
            with PatchedZipFile(self.base_path / f"{seq_id}_sick.zip",
                                to_extract=fname) as src:
                return load_sick_scan(src, fname)
        return load_sick_scan(self.base_path / "data_3d_raw", fname)

    @expand_idx_name(["sick"])
    def intermediate_data(self, idx, names="sick", ninter_frames=None,
                          report_semantic=True):
        """SICK scans between the previous and current velodyne timestamps
        (reference kitti360/loader.py:627-704): a list of EDicts with
        ``index``, ``timestamp``, interpolated ``pose``, ``data`` (N, 2) and
        — when ``report_semantic`` — per-point ``rgb/semantic/instance/
        visible`` transferred from the aggregated windows."""
        seq_id, frame_idx = idx
        self._preload_timestamps(seq_id, "velo")
        self._preload_timestamps(seq_id, "sick")
        if report_semantic:
            self._preload_3dsemantics(seq_id)

        key_ts_list = self._timestamp_cache[(seq_id, "velo")]
        key_ts_prev = key_ts_list[frame_idx - 1] if frame_idx != 0 else 0
        key_ts = key_ts_list[frame_idx]
        sick_ts = self._timestamp_cache[(seq_id, "sick")]
        ia = int(np.searchsorted(sick_ts, key_ts_prev, side="right"))
        ib = int(np.searchsorted(sick_ts, key_ts, side="right"))
        idx_list = list(range(ia, ib))
        if ninter_frames is not None:
            # reference bug fixed: its `idx_list[-ninter_frames:]`
            # (loader.py:654) returns ALL frames for ninter_frames=0
            idx_list = idx_list[max(len(idx_list) - ninter_frames, 0):] \
                if ninter_frames > 0 else []

        if self.interpolate_pose:
            self._preload_poses(seq_id)
            fpos = interp1d(key_ts_list, self._poses_t[seq_id], axis=0,
                            fill_value="extrapolate")
            frot = interp1d(key_ts_list,
                            self._poses_r[seq_id].as_rotvec(), axis=0,
                            fill_value="extrapolate")

        result = []
        for sick_idx in idx_list:
            item = EDict(index=sick_idx, timestamp=int(sick_ts[sick_idx]))
            if self.interpolate_pose:
                ts = sick_ts[sick_idx]
                item.pose = EgoPose(fpos(ts),
                                    Rotation.from_rotvec(frot(ts)))
            if self._return_file_path:
                item.file = (self.base_path / "data_3d_raw" / seq_id
                             / "sick_points" / "data"
                             / ("%010d.bin" % sick_idx))
            else:
                item.data = self._load_sick_scan(seq_id, sick_idx)
                if report_semantic:
                    item.update(self._read_semantic_bins(
                        seq_id, "sick", sick_idx, len(item.data)))
            result.append(item)
        return result

    # -- annotations --------------------------------------------------------------
    def _preload_3dobjects(self, seq_id):
        assert self.phase in ("training", "validation"), \
            "Testing set doesn't contain labels"
        if seq_id in self._3dobjects_ranges:
            return
        fname = Path("data_3d_bboxes", "train", f"{seq_id}.xml")
        if self.inzip:
            with PatchedZipFile(self.base_path / "data_3d_bboxes.zip",
                                to_extract=fname) as src:
                objs, ranges = load_bboxes(src, fname)
        else:
            objs, ranges = load_bboxes(self.base_path, fname)
        self._3dobjects_cache[seq_id] = objs
        self._3dobjects_ranges[seq_id] = ranges

    @expand_idx
    def annotation_3dobject(self, idx, raw=False, visible_range=80):
        """Boxes of the frame re-expressed relative to the frame pose;
        static boxes farther than ``visible_range`` are dropped."""
        seq_id, frame_idx = idx
        self._preload_3dobjects(seq_id)
        objects = [self._3dobjects_cache[seq_id][i]
                   for start, end, i in self._3dobjects_ranges[seq_id]
                   if start <= frame_idx < end]
        if raw:
            return objects

        self._preload_poses(seq_id)
        pr = self._poses_r[seq_id][frame_idx]
        pt = self._poses_t[seq_id][frame_idx]
        pri = pr.inv()
        prim = pri.as_matrix()

        boxes = Target3DArray(frame="pose")
        for box in objects:
            rs, t = box.transform[:3, :3], box.transform[:3, 3]
            scale = np.linalg.norm(rs, axis=0)
            rot = pri * Rotation.from_matrix(rs / scale)
            rel_t = prim.dot(t - pt)
            if np.linalg.norm(rel_t) > visible_range:
                continue
            tag = ObjectTag(kittiId2label[box.semanticId].name,
                            Kitti360Class)
            boxes.append(ObjectTarget3D(
                rel_t, rot, scale, tag,
                tid=box.semanticId * 1000 + box.get("instanceId", 0)))
        return boxes

    @expand_idx
    def semantic_window_points(self, idx, dynamic=False, radius=80.0):
        """Aggregated semantic window points near the frame (world frame),
        as a structured array with xyz/rgb/semantic/instance fields — a
        lightweight alternative to the per-frame transfer of
        :meth:`annotation_3dpoints` (beyond the reference surface).

        :param dynamic: read the dynamic windows instead of static
        :param radius: crop radius around the frame pose
        """
        seq_id, frame_idx = idx
        self._preload_poses(seq_id)
        pt = self._poses_t[seq_id][frame_idx]

        if self.inzip:
            raise NotImplementedError(
                "semantic_window_points reads the unzipped "
                "data_3d_semantics layout; extract the windows first")
        kind = "dynamic" if dynamic else "static"
        folder = self.base_path / "data_3d_semantics" / seq_id / kind
        windows = []
        for ply in sorted(folder.glob("*.ply")):
            start, end = (int(v) for v in ply.stem.split("_"))
            if start <= frame_idx <= end:
                windows.append(ply)
        if not windows:
            return EDict(points=np.zeros((0, 3)), semantic=np.zeros(0, "u1"))

        parts = [load_ply(folder, w.name) for w in windows]
        data = np.concatenate(parts)
        xyz = np.stack([data["x"], data["y"], data["z"]], axis=1)
        sel = np.linalg.norm(xyz - pt, axis=1) <= radius
        out = EDict(points=xyz[sel])
        for field in ("semanticID", "semantic", "instanceID", "instance",
                      "red", "green", "blue", "visible"):
            if field in data.dtype.names:
                out[field.lower().replace("id", "")] = data[field][sel]
        return out

    # -- per-frame semantic label transfer -------------------------------------
    _semantic_dtypes = dict(rgb="u1", semantic="u1", instance="u2",
                            visible="u1")

    def _semantic_result_path(self, seq_id):
        return self.base_path / "data_3d_semantics" / seq_id

    def _read_semantic_bins(self, seq_id, sensor, frame_idx, npoints):
        fnames = {k: Path("data_3d_semantics", seq_id, sensor, k,
                          "%010d.bin" % frame_idx)
                  for k in self._semantic_dtypes}
        data = EDict()
        if self.inzip:
            with PatchedZipFile(self.base_path / f"{seq_id}_semantics.zip",
                                to_extract=list(fnames.values())) as ar:
                for k, v in fnames.items():
                    data[k] = np.frombuffer(ar.read(str(v)),
                                            dtype=self._semantic_dtypes[k])
        else:
            for k, v in fnames.items():
                try:
                    data[k] = np.fromfile(self.base_path / v,
                                          dtype=self._semantic_dtypes[k])
                except FileNotFoundError:
                    raise FileNotFoundError(
                        f"{v}: frame not covered by any aggregated "
                        "semantic window (labels exist only inside the "
                        "windows' expanded frame ranges)") from None
        data.rgb = data.rgb.reshape(-1, 3)
        data.visible = np.unpackbits(data.visible,
                                     count=npoints).astype(bool)
        return data

    def _world_velo_cloud(self, seq_id, frame_idx):
        cloud = self.lidar_data((seq_id, frame_idx), bypass=True)[:, :3]
        cloud = self._calibration.transform_points(
            cloud, frame_to="pose", frame_from="velo")
        return cloud.dot(self._poses_r[seq_id][frame_idx].as_matrix().T) \
            + self._poses_t[seq_id][frame_idx]

    def _iter_frame_clouds(self, seq_id, frame_idx):
        """(sensor, index, world-frame xyz) for the frame's velo scan and
        its intermediate sick scans."""
        yield "velodyne", frame_idx, self._world_velo_cloud(seq_id,
                                                            frame_idx)
        for item in self.intermediate_data(
                (seq_id, frame_idx), names="sick", report_semantic=False,
                bypass=True):
            # (u, v, 0) embedding replicates the reference
            # (loader.py:417); the official kitti360scripts devkit embeds
            # (0, -u, v) — parity follows the reference here
            cloud = np.insert(item.data, 2, 0, axis=1)
            cloud = self._calibration.transform_points(
                cloud, frame_to="pose", frame_from="sick")
            # interpolate_pose=False items carry no pose (same as the
            # reference, whose cache build then crashes — loader.py:419);
            # fall back to the key frame's pose instead
            pose_r, pose_t = ((item.pose.orientation, item.pose.position)
                              if "pose" in item else
                              (self._poses_r[seq_id][frame_idx],
                               self._poses_t[seq_id][frame_idx]))
            cloud = cloud.dot(pose_r.as_matrix().T) + pose_t
            yield "sick", item.index, cloud

    def _preload_3dsemantics(self, seq_id, expand_frames=150, nworkers=0):
        """Transfer the aggregated window labels onto every frame's own
        velo/sick points (reference kitti360/loader.py:326-528 contract:
        nearest window point per scan point, static + per-timestamp dynamic
        windows, nearest-across-windows merge, per-field binary cache).

        TPU-first twist: the reference fans a scipy KDTree query per window
        out over a process pool; here the O(N*M) match runs as a chunked
        MXU matmul on device (`d3d_tpu.ops.point.nearest_neighbor`), so no
        worker pool is needed — ``nworkers`` is accepted for signature
        parity and ignored.
        """
        if self.inzip:
            if (self.base_path / f"{seq_id}_semantics.zip").exists():
                return
            raise NotImplementedError(
                "build the semantic cache on the unzipped layout first "
                "(then zip data_3d_semantics/<seq> as <seq>_semantics.zip)")
        result_path = self._semantic_result_path(seq_id)
        done_marker = result_path / ".labels_complete"
        if done_marker.exists():
            return

        from ...ops.point import nearest_neighbor
        from .utils import id2label

        self._preload_poses(seq_id)
        nframes = self.sequence_sizes[seq_id]
        idmap = np.zeros(max(id2label.keys()) + 1, dtype="u1")
        for i, label in id2label.items():
            if i >= 0:
                idmap[i] = label.name.value

        # gather all windows (both kinds) sorted by expanded start so
        # finished frames can stream to disk instead of holding the whole
        # sequence's best-so-far arrays in RAM (real KITTI-360 sequences
        # are 10k+ frames x 120k points)
        windows = []
        for kind in ("static", "dynamic"):
            folder = result_path / kind
            if not folder.exists():
                continue
            for ply in sorted(folder.glob("*.ply")):
                fstart, fend = (int(v) for v in ply.stem.split("_"))
                windows.append((max(fstart - expand_frames, 0),
                                min(fend + expand_frames, nframes),
                                kind, folder, ply.name))
        if not windows:
            raise FileNotFoundError(
                f"no aggregated 3D-semantics windows under {result_path} "
                "(download data_3d_semantics for this sequence)")
        windows.sort(key=lambda w: w[:2])

        accum = {}            # (sensor, sidx) -> best-so-far fields
        frame_clouds = {}     # fidx -> [(sensor, sidx, world xyz)]
        frame_children = {}   # fidx -> [(sensor, sidx)]
        crop_radius2 = 150.0 ** 2  # beyond lidar range + pose drift margin

        def update(sensor, sidx, cloud, win_xyz, win_fields):
            if len(cloud) == 0 or len(win_xyz) == 0:
                return
            dist, nn = nearest_neighbor(cloud, win_xyz)
            key = (sensor, sidx)
            if key not in accum:
                accum[key] = EDict(
                    dist=np.full(len(cloud), np.inf, np.float32),
                    rgb=np.zeros((len(cloud), 3), "u1"),
                    semantic=np.zeros(len(cloud), "u1"),
                    instance=np.zeros(len(cloud), "u2"),
                    visible=np.zeros(len(cloud), bool))
            a = accum[key]
            upd = dist < a.dist
            a.dist = np.where(upd, dist, a.dist)
            a.rgb = np.where(upd[:, None], win_fields["rgb"][nn], a.rgb)
            a.semantic = np.where(upd, idmap[win_fields["semantic"][nn]],
                                  a.semantic)
            a.instance = np.where(
                upd, win_fields["instance"][nn].astype("u2"), a.instance)
            a.visible = np.where(upd, win_fields["visible"][nn] > 0,
                                 a.visible)

        for sensor in ("velodyne", "sick"):
            for k in self._semantic_dtypes:
                (result_path / sensor / k).mkdir(parents=True, exist_ok=True)

        def flush(fidx):
            for sensor, sidx, npts in frame_children.pop(fidx, ()):
                a = accum.pop((sensor, sidx), None)
                if a is None:
                    # loaded but matched no window points (e.g. beyond the
                    # crop radius): write zero-filled defaults so reads
                    # never FileNotFoundError behind the complete marker
                    a = EDict(rgb=np.zeros((npts, 3), "u1"),
                              semantic=np.zeros(npts, "u1"),
                              instance=np.zeros(npts, "u2"),
                              visible=np.zeros(npts, bool))
                out = result_path / sensor
                a.rgb.tofile(out / "rgb" / ("%010d.bin" % sidx))
                a.semantic.tofile(out / "semantic" / ("%010d.bin" % sidx))
                a.instance.tofile(out / "instance" / ("%010d.bin" % sidx))
                np.packbits(a.visible).tofile(
                    out / "visible" / ("%010d.bin" % sidx))
            frame_clouds.pop(fidx, None)

        for wi, (fstart, fend, kind, folder, name) in enumerate(windows):
            data = load_ply(folder, name)
            if len(data) == 0:
                continue
            xyz = np.stack([data["x"], data["y"], data["z"]], 1)
            fields = dict(
                rgb=np.stack([data["red"], data["green"], data["blue"]],
                             1) if "red" in data.dtype.names
                else np.zeros((len(data), 3), "u1"),
                semantic=data["semantic"].astype(np.int64),
                instance=data["instance"],
                visible=data["visible"]
                if "visible" in data.dtype.names
                else np.ones(len(data), "u1"))
            dyn_ts = data["timestamp"] if kind == "dynamic" \
                and "timestamp" in data.dtype.names else None
            for fidx in range(fstart, fend):
                if dyn_ts is not None:
                    sel = dyn_ts == fidx
                    if not sel.any():
                        continue
                    wxyz = xyz[sel]
                    wfields = {k: v[sel] for k, v in fields.items()}
                else:
                    # pre-crop the (multi-million-point) window to lidar
                    # range around the frame pose: distant points can
                    # never win the min-distance merge
                    origin = self._poses_t[seq_id][fidx]
                    near = np.sum((xyz - origin) ** 2, axis=1) \
                        < crop_radius2
                    if not near.any():
                        continue
                    wxyz = xyz[near]
                    wfields = {k: v[near] for k, v in fields.items()}
                if fidx not in frame_clouds:
                    frame_clouds[fidx] = list(
                        self._iter_frame_clouds(seq_id, fidx))
                    frame_children[fidx] = [
                        (s, i, len(c)) for s, i, c in frame_clouds[fidx]]
                for sensor, sidx, cloud in frame_clouds[fidx]:
                    update(sensor, sidx, cloud, wxyz, wfields)
            # frames below every remaining window's range are final
            min_future = min((w[0] for w in windows[wi + 1:]),
                             default=nframes)
            for fidx in [f for f in list(frame_children)
                         if f < min_future]:
                flush(fidx)

        for fidx in list(frame_children):
            flush(fidx)
        done_marker.touch()

    @expand_idx
    def annotation_3dpoints(self, idx):
        """Per-point semantic labels for the frame's OWN velodyne scan
        (reference kitti360/loader.py:627-652 contract): EDict with
        ``rgb (N, 3) u1``, ``semantic (N,) u1`` (Kitti360Class values),
        ``instance (N,) u2`` and ``visible (N,) bool``, transferred from the
        aggregated windows on first use and cached as binary files."""
        seq_id, frame_idx = idx
        self._preload_3dsemantics(seq_id)
        npoints = len(self.lidar_data(idx, bypass=True))
        return self._read_semantic_bins(seq_id, "velodyne", frame_idx,
                                        npoints)

    # -- poses / timestamps ----------------------------------------------------------
    def _preload_timestamps(self, seq, name):
        if (seq, name) in self._timestamp_cache:
            return
        folder, subfolder, _, archive = self.FRAME_PATH_MAP[name]
        fname = Path(seq, subfolder, "timestamps.txt")
        if self.inzip:
            with PatchedZipFile(self.base_path / archive,
                                to_extract=fname) as src:
                ts = load_timestamps(src, fname)
        else:
            ts = load_timestamps(self.base_path / folder, fname)
        self._timestamp_cache[(seq, name)] = ts

    @expand_idx
    def timestamp(self, idx, names="velo"):
        if names == "sick":
            raise NotImplementedError(
                "Indexing for sick points is unavailable yet!")
        seq_id, frame_idx = idx
        self._preload_timestamps(seq_id, names)
        return int(self._timestamp_cache[(seq_id, names)][frame_idx])

    def _preload_poses(self, seq):
        if seq in self._poses_idx:
            return
        fname = Path("data_poses", seq, "poses.txt")
        if self.inzip:
            with PatchedZipFile(self.base_path / "data_poses.zip",
                                to_extract=fname) as src:
                plist = np.loadtxt(src.open(str(fname)))
        else:
            plist = np.loadtxt(self.base_path / fname)

        pose_indices = plist[:, 0].astype(int)
        matrices = plist[:, 1:].reshape(-1, 3, 4)
        positions = matrices[:, :, 3]
        rotations = Rotation.from_matrix(matrices[:, :, :3])

        self._preload_timestamps(seq, "velo")
        timestamps = self._timestamp_cache[(seq, "velo")]

        fpos = interp1d(timestamps[pose_indices], positions, axis=0,
                        fill_value="extrapolate")
        frot = interp1d(timestamps[pose_indices], rotations.as_rotvec(),
                        axis=0, fill_value="extrapolate")
        self._poses_idx[seq] = set(pose_indices)
        self._poses_t[seq] = fpos(timestamps)
        self._poses_r[seq] = Rotation.from_rotvec(frot(timestamps))

    @expand_idx
    def pose(self, idx):
        seq_id, frame_idx = idx
        self._preload_poses(seq_id)
        if frame_idx not in self._poses_idx[seq_id] \
                and not self.interpolate_pose:
            return None
        return EgoPose(self._poses_t[seq_id][frame_idx],
                       self._poses_r[seq_id][frame_idx])

    @property
    def pose_name(self):
        return "pose"
