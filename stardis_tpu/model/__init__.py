from stardis_tpu.model.base import Composition, Radial1DGeometry, StellarModel

__all__ = ["Composition", "Radial1DGeometry", "StellarModel"]
