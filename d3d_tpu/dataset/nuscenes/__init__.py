from .constants import (NuscenesDetectionClass, NuscenesObjectClass,
                        NuscenesSegmentationClass)
from .loader import NuscenesLoader

__all__ = ["NuscenesObjectClass", "NuscenesDetectionClass",
           "NuscenesSegmentationClass", "NuscenesLoader"]
