# Sphinx configuration for d3d_tpu (built on CI / readthedocs; the dev
# image has no sphinx).

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "d3d_tpu"
copyright = "2026, d3d_tpu contributors"
author = "d3d_tpu contributors"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.intersphinx",
]

autodoc_member_order = "bysource"
autodoc_default_options = {
    "members": True,
    "undoc-members": False,
    "show-inheritance": True,
}
# heavy / optional deps are mocked so autodoc can import every module on a
# bare CI runner
autodoc_mock_imports = [
    "torch", "tensorflow", "waymo_open_dataset", "rospy", "rosbag",
    "sensor_msgs", "pcl", "websockets", "lmdb", "h5py",
]

intersphinx_mapping = {
    "python": ("https://docs.python.org/3", None),
    "numpy": ("https://numpy.org/doc/stable/", None),
    "jax": ("https://docs.jax.dev/en/latest/", None),
}

templates_path = []
exclude_patterns = ["_build"]

html_theme = "alabaster"
html_static_path = []
