"""Multi-object Kalman tracker (reference d3d/tracking/tracker.py:8-204):
per-track pose UKF + dimension KF, frame-to-frame association through a
pluggable matcher, lost-track aging and pruning."""

import numpy as np

from ..abstraction import ObjectTarget3D, Target3DArray, TrackingTarget3D
from .filter import Box_KF, Pose_3DOF_UKF_CTRA
from .matcher import DistanceTypes, HungarianMatcher

__all__ = ["VanillaTracker"]


class VanillaTracker:
    """Vanilla Kalman-filter tracker.

    :param pose_tracker_factory: builds a pose filter from an initial detection
    :param feature_tracker_factory: builds a property filter from a detection
    :param matcher_factory: builds the target matcher
    :param matcher_distance_type: "iou" | "riou" | "position" or DistanceTypes
    :param matcher_distance_threshold: scalar or per-class-value dict
    :param lost_time: seconds a target may stay unmatched before removal
    """

    def __init__(self, pose_tracker_factory=Pose_3DOF_UKF_CTRA,
                 feature_tracker_factory=Box_KF,
                 matcher_factory=HungarianMatcher,
                 matcher_distance_type="position",
                 matcher_distance_threshold=1, lost_time=1,
                 default_position_var=np.eye(3),
                 default_dimension_var=np.eye(3),
                 default_orientation_var=1):
        self._tracked_poses = {}
        self._tracked_features = {}
        self._timer_track = {}
        self._timer_lost = {}

        self._default_position_var = default_position_var
        self._default_dimension_var = default_dimension_var
        self._default_orientation_var = default_orientation_var

        self._last_timestamp = None
        self._last_frameid = None
        self._id_counter = 1  # 0 means "no id"
        self._lost_time = lost_time

        self._pose_factory = pose_tracker_factory
        self._feature_factory = feature_tracker_factory
        self._matcher = matcher_factory()

        if isinstance(matcher_distance_type, str):
            self._match_distance = {
                "iou": DistanceTypes.IoU,
                "riou": DistanceTypes.RIoU,
                "position": DistanceTypes.Position,
            }[matcher_distance_type.lower()]
        else:
            self._match_distance = matcher_distance_type
        self._match_threshold = matcher_distance_threshold

    def _initialize(self, target):
        self._tracked_poses[self._id_counter] = self._pose_factory(target)
        self._tracked_features[self._id_counter] = self._feature_factory(target)
        self._timer_track[self._id_counter] = 0.0
        self._timer_lost[self._id_counter] = 0.0
        self._id_counter += 1

    @property
    def tracked_ids(self):
        return list(self._tracked_poses.keys())

    def _current_objects_array(self):
        # report in the INPUT unit (microseconds) — _last_timestamp holds
        # seconds for filter dt math only
        array = Target3DArray(frame=self._last_frameid,
                              timestamp=getattr(self, "_last_timestamp_us",
                                                0))
        for tid in self.tracked_ids:
            array.append(ObjectTarget3D(
                position=self._tracked_poses[tid].position,
                orientation=self._tracked_poses[tid].orientation,
                dimension=self._tracked_features[tid].dimension,
                tag=self._tracked_features[tid].classification,
                tid=tid,
                position_var=np.nan_to_num(
                    self._tracked_poses[tid].position_var, posinf=1e6),
                orientation_var=self._tracked_poses[tid].orientation_var,
                dimension_var=self._tracked_features[tid].dimension_var,
            ))
        return array

    def _assign_default_var(self, target):
        if not np.any(target.position_var):
            target.position_var = self._default_position_var
        if not np.any(target.dimension_var):
            target.dimension_var = self._default_dimension_var
        if not np.any(target.orientation_var):
            target.orientation_var = self._default_orientation_var
        return target

    def update(self, detections):
        """Feed a new frame of detections (timestamp in microseconds)."""
        current_ts = detections.timestamp / 1e6  # seconds, for filter dt
        self._last_timestamp_us = detections.timestamp
        if self._last_timestamp is None:
            for target in detections:
                self._assign_default_var(target)
                self._initialize(target)
        else:
            dt = current_ts - self._last_timestamp
            for tracker in self._tracked_poses.values():
                tracker.predict(dt)
            for tracker in self._tracked_features.values():
                tracker.predict(dt)

            current_targets = self._current_objects_array()
            if isinstance(self._match_threshold,
                          (float, int, np.floating, np.integer)):
                thresholds = {box.tag_top.value: float(self._match_threshold)
                              for box in list(current_targets) + list(detections)}
            else:
                assert isinstance(self._match_threshold, dict)
                thresholds = self._match_threshold
            # keep frames consistent for the matcher
            current_targets.frame = detections.frame
            self._matcher.prepare_boxes(detections, current_targets,
                                        self._match_distance)
            self._matcher.match(range(len(detections)),
                                range(len(current_targets)), thresholds)

            lost_ids = set(self.tracked_ids)
            for idx, target in enumerate(detections):
                idx_match = self._matcher.query_src_match(idx)
                self._assign_default_var(target)
                if idx_match < 0:
                    self._initialize(target)
                else:
                    tid = current_targets[idx_match].tid
                    self._tracked_poses[tid].update(target)
                    self._tracked_features[tid].update(target)
                    self._timer_lost[tid] = 0.0
                    self._timer_track[tid] += dt
                    lost_ids.discard(tid)

            for tid in lost_ids:
                self._timer_lost[tid] += dt
                self._timer_track[tid] = 0.0

        # prune outdated tracks
        for tid in [t for t, lost in self._timer_lost.items()
                    if lost > self._lost_time]:
            del self._tracked_poses[tid]
            del self._tracked_features[tid]
            del self._timer_lost[tid]
            del self._timer_track[tid]

        self._last_timestamp = current_ts
        self._last_frameid = detections.frame

    def report(self):
        """Current tracked targets as TrackingTarget3D array."""
        # report in the INPUT unit (microseconds) — _last_timestamp holds
        # seconds for filter dt math only
        array = Target3DArray(frame=self._last_frameid,
                              timestamp=getattr(self, "_last_timestamp_us",
                                                0))
        for tid in self.tracked_ids:
            array.append(TrackingTarget3D(
                position=self._tracked_poses[tid].position,
                orientation=self._tracked_poses[tid].orientation,
                dimension=self._tracked_features[tid].dimension,
                velocity=self._tracked_poses[tid].velocity,
                angular_velocity=self._tracked_poses[tid].angular_velocity,
                tag=self._tracked_features[tid].classification,
                tid=tid,
                position_var=np.nan_to_num(
                    self._tracked_poses[tid].position_var, posinf=1e6),
                orientation_var=self._tracked_poses[tid].orientation_var,
                dimension_var=self._tracked_features[tid].dimension_var,
                velocity_var=self._tracked_poses[tid].velocity_var,
                angular_velocity_var=self._tracked_poses[tid].angular_velocity_var,
                history=self._timer_track[tid],
            ))
        return array

    @property
    def match_count(self):
        return self._matcher.num_of_matches()
