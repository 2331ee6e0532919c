from .utils import (KittiObjectClass, SemanticKittiClass,
                    SemanticKittiLearningClass)
from .object import KittiObjectLoader
from .tracking import KittiTrackingLoader
from .odometry import KittiOdometryLoader
from .raw import KittiRawLoader

__all__ = ["KittiObjectClass", "SemanticKittiClass",
           "SemanticKittiLearningClass", "KittiObjectLoader",
           "KittiTrackingLoader", "KittiOdometryLoader", "KittiRawLoader"]
