from .pointpillars import (PointPillars, PointPillarsConfig, assign_targets,
                           decode_boxes, detection_loss, make_anchors,
                           make_train_step, pillarize)

__all__ = [
    "PointPillars", "PointPillarsConfig", "pillarize", "make_anchors",
    "assign_targets", "detection_loss", "decode_boxes", "make_train_step",
]
