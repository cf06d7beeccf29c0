"""Radiation-field package.

Re-exports the reference-shaped surface lazily (RadiationField/Opacities
live in stardis_tpu.base, which itself imports submodules of this package —
eager re-export would be circular).
"""

__all__ = ["Opacities", "RadiationField", "create_stellar_radiation_field"]


def __getattr__(name):
    if name in __all__:
        from stardis_tpu.radiation_field import base

        return getattr(base, name)
    raise AttributeError(name)
