"""Dataset loaders and converters (reference d3d/dataset).

Submodules are imported lazily by the loaders themselves; importing this
package is cheap.
"""

from . import base, zip  # noqa: F401
