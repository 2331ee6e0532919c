"""KITTI shared utilities: class taxonomy, calibration / oxts / velodyne
parsing (fresh implementation of the helpers in reference
d3d/dataset/kitti/utils.py:49-392)."""

from collections import namedtuple
from enum import Enum, auto

import numpy as np

__all__ = [
    "KittiObjectClass",
    "OxtData",
    "load_velo_scan",
    "load_calib_file",
]


class KittiObjectClass(Enum):
    """Object categories of the KITTI benchmarks (devkit label values)."""

    DontCare = 0
    Car = auto()
    Van = auto()
    Truck = auto()
    Pedestrian = auto()
    Person = auto()  # person sitting
    Person_sitting = Person
    Cyclist = auto()
    Tram = auto()
    Misc = auto()


# KITTI raw oxts packet layout (raw-data devkit readme order)
OxtData = namedtuple("OxtData", [
    "lat", "lon", "alt", "roll", "pitch", "yaw",
    "vn", "ve", "vf", "vl", "vu",
    "ax", "ay", "az", "af", "al", "au",
    "wx", "wy", "wz", "wf", "wl", "wu",
    "pos_accuracy", "vel_accuracy",
    "navstat", "numsats", "posmode", "velmode", "orimode",
])


def load_velo_scan(data, binary=True):
    """Parse a KITTI velodyne scan into an (N, 4) float32 array.

    :param data: bytes (in-zip read) or a file path
    """
    if isinstance(data, (bytes, bytearray)):
        scan = np.frombuffer(data, dtype=np.float32)
    else:
        scan = np.fromfile(data, dtype=np.float32)
    return scan.reshape(-1, 4)


def load_calib_file(data):
    """Parse a KITTI calibration text blob into a dict of float arrays.

    Lines look like ``P0: 7.2e+02 0.0 ...``; empty lines are skipped and
    non-numeric entries are kept as strings (e.g. calib_time).
    """
    if isinstance(data, (bytes, bytearray)):
        data = data.decode()
    out = {}
    for line in data.splitlines():
        line = line.strip()
        if not line:
            continue
        key, _, value = line.partition(":")
        value = value.strip()
        try:
            out[key.strip()] = np.array([float(v) for v in value.split()])
        except ValueError:
            out[key.strip()] = value
    return out
