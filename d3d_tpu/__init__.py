"""d3d_tpu — a TPU-native framework for 3D object detection & tracking toolchains.

Built from scratch on JAX/XLA/Pallas with the capabilities of the reference
devkit cmpute/d3d (see /root/reference and SURVEY.md): object/box/pose/
calibration data model, differentiable rotated-box geometry, point-cloud
voxelization, grid<->point scatter ops, detection/tracking/segmentation
evaluators, Kalman multi-object tracking, and dataset loaders.

Design notes (TPU-first, not a port):
  * All hot compute paths are fixed-shape jnp/Pallas programs; the host-side
    data model is plain Python + numpy (the reference's Cython layer has no
    reason to exist when the math runs in XLA).
  * float64 is enabled globally because the rotated-box polygon clipping is
    numerically delicate (reference README.md:31 recommends double precision);
    model code uses explicit float32/bfloat16 dtypes.
  * Scale-out is a `jax.sharding.Mesh` + psum-mergeable dense evaluator stats
    instead of the reference's pickling/multiprocessing merge.
"""

import jax as _jax

# The geometry stack (rotated-box polygon clipping) requires fp64 for the
# `precise=True` contract (reference d3d/box/__init__.py:198-200). Enable x64
# before any array is created. Model code opts into f32/bf16 explicitly.
_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from . import utils  # noqa: E402,F401
