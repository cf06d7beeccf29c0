"""stardis_tpu — TPU-native LTE stellar spectral synthesis.

A from-scratch JAX/XLA re-design of the capabilities of
tardis-sn/stardis (reference mounted read-only at /root/reference):
MARCS/MESA model ingest, LTE plasma solve, continuum + Voigt line
opacities, and the van Noort 2001 formal solution, engineered for
TPU hardware (dense padded arrays, log-space Saha, associative-scan
depth sweeps, tiered split-dense line-profile accumulation).

Entry points: ``run_stardis`` (one-shot synthesis),
``serving.SpectralService`` (compiled-plan serving),
``parallel.batch.run_batch`` (atmosphere grids; 1-D batch or 2-D
batch x nu meshes), ``parallel.sharding.shard_spectrum``
(wavelength-sharded meshes running the same scatter-free panel
programs as the single-chip hot path, via host-side per-shard panel
schedules), ``postprocessing`` (differentiable JAX rotational +
instrumental broadening), ``atom_data.convert`` (carsus-store
converter CLI; reads fixed- AND table-format pandas stores without
pytables), ``plasma.molecules`` (11-diatomic Huber & Herzberg
equilibrium pinned absolutely against Korg.jl, with an opt-in
coupled-network solver — ``opacity.line.molecules_coupled``).
"""

from stardis_tpu.base import STARDISOutput, parse_config_to_model, run_stardis

__version__ = "0.5.0"

__all__ = ["run_stardis", "STARDISOutput", "parse_config_to_model"]
