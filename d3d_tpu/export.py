"""Ahead-of-time detector export for serving (StableHLO via ``jax.export``).

Production serving wants the compiled compute graph without the Python
model definition: this module serializes a detector's full device
pipeline (voxelize -> network -> decode -> rotated NMS) with its weights
BAKED IN as one portable StableHLO artifact, and loads it back into a
callable that needs only jax — no flax, no model classes, no configs.
The artifact is platform-checked by jax.export (export on TPU, serve on
the same platform; cross-platform lowering via ``platforms=``).

The reference devkit has no deployment story (its kernels are runtime
torch extensions); this is the TPU-native serving analogue of shipping a
TorchScript/ONNX bundle.
"""

import json
import zipfile
from pathlib import Path

import numpy as np
import jax
from jax import export as jax_export

__all__ = ["export_detector", "load_detector", "save_detector",
           "ExportedDetector"]

_META_NAME = "meta.json"
_BLOB_NAME = "detector.stablehlo"


def export_detector(device_fn, example_points, platforms=None, meta=None):
    """Export a detector's jitted device function.

    :param device_fn: the points -> (boxes, scores, labels, keep) device
        function (e.g. the ``device`` closure the
        ``make_*_detector`` factories build — weights are closed over and
        get baked into the artifact as constants)
    :param example_points: example (N, F) input fixing the traced shape
        — or a TUPLE of example inputs for multi-input pipelines (e.g.
        Mono3D's ``(image, intrinsics)``)
    :param platforms: optional lowering platforms tuple, e.g.
        ``("tpu",)`` or ``("cpu", "tpu")``; defaults to the current
        backend
    :param meta: optional JSON-serializable metadata stored alongside
        (class names, score threshold, frame conventions, ...)
    :returns: ExportedDetector
    """
    fn = device_fn if hasattr(device_fn, "lower") else jax.jit(device_fn)
    kw = {}
    if platforms is not None:
        kw["platforms"] = tuple(platforms)
    args = (tuple(example_points)
            if isinstance(example_points, (tuple, list))
            else (example_points,))
    sds = tuple(jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype)
                for a in args)
    exp = jax_export.export(fn, **kw)(*sds)
    return ExportedDetector(exp, dict(meta or {}))


class ExportedDetector:
    """A serialized (or deserialized) detector pipeline."""

    def __init__(self, exported, meta):
        self._exported = exported
        self.meta = meta

    @property
    def input_shape(self):
        """Shape of the FIRST input (the points/image tensor); see
        :attr:`input_shapes` for multi-input pipelines."""
        return tuple(self._exported.in_avals[0].shape)

    @property
    def input_shapes(self):
        """Shapes of every input, in call order."""
        return tuple(tuple(a.shape) for a in self._exported.in_avals)

    @property
    def platforms(self):
        return tuple(self._exported.platforms)

    def __call__(self, *inputs):
        return self._exported.call(*inputs)

    def save(self, path):
        """Write a self-contained artifact: zip(meta.json, StableHLO)."""
        blob = self._exported.serialize()
        with zipfile.ZipFile(str(path), "w") as zf:
            zf.writestr(_META_NAME, json.dumps(self.meta))
            zf.writestr(_BLOB_NAME, blob)
        return Path(path)


def save_detector(device_fn, example_points, path, platforms=None,
                  meta=None):
    """One-shot :func:`export_detector` + save."""
    return export_detector(device_fn, example_points, platforms=platforms,
                           meta=meta).save(path)


def load_detector(path):
    """Load an artifact saved by :meth:`ExportedDetector.save`; the
    returned object is callable on device arrays with no model code."""
    with zipfile.ZipFile(str(path)) as zf:
        meta = json.loads(zf.read(_META_NAME).decode())
        blob = zf.read(_BLOB_NAME)
    if isinstance(blob, bytes):
        blob = bytearray(blob)
    return ExportedDetector(jax_export.deserialize(blob), meta)
