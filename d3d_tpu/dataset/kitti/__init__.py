from .utils import KittiObjectClass, SemanticKittiClass, SemanticKittiLearningClass
from .object import KittiObjectLoader

__all__ = ["KittiObjectClass", "SemanticKittiClass",
           "SemanticKittiLearningClass", "KittiObjectLoader"]
