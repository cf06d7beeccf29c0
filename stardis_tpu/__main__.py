"""Command-line synthesis: ``python -m stardis_tpu``.

The reference is Python-API-only (its setup.cfg console_script is template
boilerplate, reference setup.cfg:19-21); this CLI is an extension for
production use — one-shot synthesis from a config file without writing a
driver script:

    python -m stardis_tpu config.yml --lambda 6540:6590:0.01 \
        --output spectrum.h5 --ascii spectrum.txt

``--lambda`` takes ``start:stop:step`` in Angstrom (stop exclusive, like
the reference's benchmark grids).  ``--output`` writes the full
STARDISOutput via util.hdf.output_to_hdf; ``--ascii`` writes a two-column
(wavelength [AA], F_lambda [erg/s/cm^2/AA]) text table.  ``--set`` applies
dotted-key config overrides (the add_config_dict surface, reference
io/base.py:53-65), e.g. ``--set opacity.line.disable=true``.

Library scans: ``--grid`` takes a directory (or glob) of model files of
the config's ``input_model.type`` and synthesizes all of them with
per-chunk checkpointing into ``--scan-out`` (stardis_tpu.grid) — a killed
scan re-run resumes where it stopped:

    python -m stardis_tpu config.yml --lambda 4000:7000:0.02 \
        --grid 'models/*.mod' --scan-out scan_dir --batch-size 8
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _parse_lambda(spec: str):
    try:
        start, stop, step = (float(tok) for tok in spec.split(":"))
    except ValueError:
        raise SystemExit(
            f"--lambda expects start:stop:step in Angstrom, got {spec!r}"
        )
    if not (stop > start and step > 0):
        raise SystemExit(
            f"--lambda needs stop > start and step > 0, got {spec!r}"
        )
    return np.arange(start, stop, step)


def _parse_override(item: str):
    if "=" not in item:
        raise SystemExit(f"--set expects dotted.key=value, got {item!r}")
    key, _, raw = item.partition("=")
    try:
        value = json.loads(raw)  # numbers / true / false / null / quoted
    except json.JSONDecodeError:
        value = raw  # bare string
    return key, value


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="python -m stardis_tpu",
        description="LTE stellar spectral synthesis (TPU-native)",
    )
    parser.add_argument("config", help="YAML config file")
    parser.add_argument(
        "--lambda", dest="lambda_spec", required=True, metavar="A:B:STEP",
        help="wavelength grid start:stop:step in Angstrom (stop exclusive)",
    )
    parser.add_argument(
        "--output", metavar="FILE.h5",
        help="write the full output (nus/lambdas/spectra) as HDF5",
    )
    parser.add_argument(
        "--ascii", metavar="FILE.txt",
        help="write a two-column (lambda [AA], F_lambda) text table",
    )
    parser.add_argument(
        "--set", dest="overrides", action="append", default=[],
        metavar="KEY=VALUE",
        help="dotted-key config override (repeatable), e.g. "
        "--set opacity.line.disable=true",
    )
    parser.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (skip any accelerator)",
    )
    parser.add_argument(
        "--segments", default="1", metavar="K",
        help="synthesize the grid in K serial wavelength segments "
        "(exact partition; needed on one chip for grids beyond HBM, "
        "e.g. >~300k points at 20 angles on v5e); 'auto' sizes K from "
        "the device memory model",
    )
    parser.add_argument(
        "--compile-cache", metavar="DIR",
        help="persistent XLA compilation cache directory (repeat runs "
        "skip the 20-40s first compile); the STARDIS_COMPILE_CACHE env "
        "var does the same for library use",
    )
    parser.add_argument(
        "--grid", metavar="DIR_OR_GLOB",
        help="synthesize a GRID of model files (directory or glob of the "
        "config's input_model.type) with checkpoint/resume; needs "
        "--scan-out",
    )
    parser.add_argument(
        "--scan-out", metavar="DIR",
        help="checkpoint directory for --grid (chunk_XXXXX.npz + manifest)",
    )
    parser.add_argument(
        "--batch-size", type=int, default=None,
        help="models per compiled chunk for --grid (default: min(8, "
        "number of models))",
    )
    args = parser.parse_args(argv)

    if args.segments != "auto":
        try:
            args.segments = int(args.segments)
        except ValueError:
            raise SystemExit(
                f"--segments expects an integer or 'auto', got "
                f"{args.segments!r}"
            )

    lambdas_aa = _parse_lambda(args.lambda_spec)
    overrides = dict(_parse_override(item) for item in args.overrides)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        # CPU can afford f64, and the host plan defaults to it — without
        # x64 every device transfer warns and truncates to f32
        jax.config.update("jax_enable_x64", True)

    if args.compile_cache:
        from stardis_tpu.util.compile_cache import enable_compilation_cache

        enable_compilation_cache(args.compile_cache)

    from stardis_tpu import run_stardis
    from stardis_tpu import units as u

    if args.grid and args.segments != 1:
        # grid scans batch over models; wavelength segmentation is not
        # plumbed through synthesize_grid — refuse rather than silently
        # dropping the flag the user relied on for OOM protection
        raise SystemExit(
            "--segments is not supported with --grid: shard the scan "
            "over a mesh or narrow the wavelength grid instead"
        )
    if args.grid:
        return _run_grid(args, lambdas_aa, overrides)

    t0 = time.perf_counter()
    sim = run_stardis(
        args.config,
        u.Quantity(lambdas_aa, u.AA),
        add_config_dict=overrides or None,
        nu_segments=args.segments,
    )
    wall = time.perf_counter() - t0

    f_lam = np.asarray(sim.spectrum_lambda)
    lam = np.asarray(sim.lambdas)
    print(
        f"synthesized {len(lam)} points in {wall:.2f}s "
        f"({lambdas_aa[0]:.2f}-{lambdas_aa[-1]:.2f} AA); "
        f"F_lambda range [{f_lam.min():.4e}, {f_lam.max():.4e}] "
        "erg/s/cm^2/AA"
    )
    if args.output:
        from stardis_tpu.util.hdf import output_to_hdf

        output_to_hdf(sim, args.output)
        print(f"wrote {args.output}")
    if args.ascii:
        np.savetxt(
            args.ascii,
            np.column_stack([lam, f_lam]),
            header="wavelength_AA  F_lambda_erg_s_cm2_AA",
        )
        print(f"wrote {args.ascii}")
    return 0


def _run_grid(args, lambdas_aa, overrides):
    """--grid: checkpointed library scan over many model files."""
    import glob as _glob
    from pathlib import Path

    if not args.scan_out:
        raise SystemExit("--grid needs --scan-out DIR for the checkpoints")
    root = Path(args.grid)
    if root.is_dir():
        # directory mode keeps only model-looking files (.mod / .mod.gz /
        # .dat) so a stray README or config.yml in the folder doesn't
        # become a garbage grid member; use a glob for other layouts
        files = sorted(
            p for p in root.iterdir()
            if p.is_file() and (
                p.suffix in (".mod", ".dat")
                or p.name.endswith((".mod.gz", ".dat.gz"))
            )
        )
    else:
        files = sorted(Path(p) for p in _glob.glob(args.grid))
    if not files:
        raise SystemExit(f"--grid matched no model files: {args.grid!r}")

    from stardis_tpu import parse_config_to_model
    from stardis_tpu import units as u
    from stardis_tpu.base import read_stellar_model
    from stardis_tpu.grid import synthesize_grid

    config, adata, _model0 = parse_config_to_model(
        args.config, overrides or None
    )
    models = [read_stellar_model(config, adata, f) for f in files]
    nus = np.asarray(
        u.Quantity(lambdas_aa, u.AA).to(u.Hz, u.spectral())
    )
    t0 = time.perf_counter()
    res = synthesize_grid(
        config, adata, models, nus, args.scan_out,
        batch_size=args.batch_size,
        labels=[{"fname": str(f)} for f in files],
    )
    wall = time.perf_counter() - t0
    state = "complete" if res["done"] else "PARTIAL (re-run to resume)"
    print(
        f"grid scan {state}: {len(files)} models x {len(lambdas_aa)} "
        f"points, {res['computed']} chunk(s) computed "
        f"(+{res['skipped']} resumed) in {wall:.2f}s -> {res['out_dir']}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
