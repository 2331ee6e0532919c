"""Dataset export backends (reference d3d/io): HDF5, LMDB, ROS bag.
Heavy dependencies are imported lazily per backend."""

from . import hdf5  # h5py is baked into the image

__all__ = ["hdf5"]
