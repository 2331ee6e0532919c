"""Attribute-accessible dict, replacing the reference's `addict` dependency
(reference d3d/voxel/__init__.py:1 uses `addict.Dict`). Deliberately minimal:
no recursive conversion magic, just attribute <-> item aliasing."""


class EDict(dict):
    """dict with attribute access: ``d.key`` == ``d['key']``."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def copy(self):
        return EDict(self)


# Register as a JAX pytree so jitted functions can return EDicts.
import jax.tree_util as _tu  # noqa: E402

_tu.register_pytree_node(
    EDict,
    lambda d: ([d[k] for k in sorted(d)], tuple(sorted(d))),
    lambda keys, vals: EDict(zip(keys, vals)),
)
