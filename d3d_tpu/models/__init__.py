from .pointpillars import (PointPillars, PointPillarsConfig, assign_targets,
                           decode_boxes, detection_loss, make_anchors,
                           make_train_step, pillarize)
from .centerpoint import (CenterPoint, CenterPointConfig,
                          assign_center_targets, center_loss, decode_centers)
from .centerpoint2 import (CenterPointRefine, RefineConfig,
                           apply_refinements, encode_refinement_targets,
                           make_refine_train_step, roi_grid_features)
from .bevseg import (BEVSeg, BEVSegConfig, bevseg_pillarize,
                     group_instances, make_panoptic_predictor,
                     panoptic_loss, panoptic_targets, point_cell_coords,
                     segmentation_loss)
from .mono3d import (Mono3D, Mono3DConfig, decode_mono3d,
                     make_mono3d_detector)
from .seg2d import Seg2D, Seg2DConfig, make_segmenter
from .second import SECOND, SECONDConfig, second_voxelize
from .voxelnext import (VoxelNeXt, VoxelNeXtConfig, voxelnext_voxelize,
                        decode_voxelnext)
from .sst import SST, SSTConfig, window_slots
from . import presets
from .inference import (make_centerpoint_detector,
                        make_pointpillars_detector, make_second_detector,
                        make_voxelnext_detector,
                        make_sst_detector)
from .tta import make_tta_detector

__all__ = [
    "PointPillars", "PointPillarsConfig", "pillarize", "make_anchors",
    "assign_targets", "detection_loss", "decode_boxes", "make_train_step",
    "CenterPoint", "CenterPointConfig", "assign_center_targets",
    "center_loss", "decode_centers",
    "CenterPointRefine", "RefineConfig", "roi_grid_features",
    "apply_refinements", "encode_refinement_targets",
    "make_refine_train_step",
    "BEVSeg", "BEVSegConfig", "bevseg_pillarize", "point_cell_coords",
    "segmentation_loss", "panoptic_targets", "panoptic_loss",
    "group_instances", "make_panoptic_predictor",
    "SECOND", "SECONDConfig", "second_voxelize", "presets",
    "Mono3D", "Mono3DConfig", "decode_mono3d", "make_mono3d_detector",
    "Seg2D", "Seg2DConfig", "make_segmenter",
    "VoxelNeXt", "VoxelNeXtConfig", "voxelnext_voxelize",
    "decode_voxelnext", "make_voxelnext_detector",
    "SST", "SSTConfig", "window_slots",
    "make_pointpillars_detector", "make_centerpoint_detector",
    "make_second_detector", "make_sst_detector", "make_tta_detector",
]
