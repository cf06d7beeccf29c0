"""Grid scans with checkpoint/resume (stardis_tpu.grid).

The reference has no mid-run persistence (SURVEY.md §5); these tests pin
the library-scan story: atomic per-chunk checkpoints, resume-where-killed
equality, identity guards, and corrupted-checkpoint recovery.
"""

import json

import numpy as np
import pytest
import yaml

jax = pytest.importorskip("jax")

from stardis_tpu import parse_config_to_model
from stardis_tpu import units as u
from stardis_tpu.grid import load_grid, synthesize_grid
from stardis_tpu.io.marcs import read_marcs_model
from stardis_tpu.io.synthetic import write_marcs_file


@pytest.fixture(scope="module")
def grid_setup(tmp_path_factory):
    base = tmp_path_factory.mktemp("grid")
    teffs = [4800.0, 5200.0, 5777.0, 6400.0, 7000.0]
    paths = []
    for teff in teffs:
        p = base / f"t{int(teff)}.mod"
        write_marcs_file(p, teff=teff)
        paths.append(p)
    config_dict = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:5",
        "input_model": {
            "type": "marcs", "fname": str(paths[0]),
            "final_atomic_number": 5,
        },
        "opacity": {
            "bf": {"H_I": {}},
            "ff": {"H_I": {}},
            "line": {"disable": False, "broadening": ["radiation"]},
        },
        "no_of_thetas": 3,
        "result_options": {},
    }
    cfg = base / "config.yml"
    cfg.write_text(yaml.safe_dump(config_dict))
    config, adata, model0 = parse_config_to_model(cfg)
    models = [model0] + [
        read_marcs_model(p).to_stellar_model(adata, final_atomic_number=5)
        for p in paths[1:]
    ]
    lam = np.arange(6555.0, 6570.0, 0.1)
    nus = np.asarray(u.Quantity(lam, u.AA).to(u.Hz, u.spectral()))
    labels = [{"teff": t} for t in teffs]
    return config, adata, models, nus, labels


def test_grid_scan_resume_equals_fresh(grid_setup, tmp_path):
    """Kill-and-resume: a scan stopped after one chunk resumes at the next
    chunk, does not recompute the finished checkpoint, and the assembled
    library is bit-identical to an uninterrupted scan."""
    config, adata, models, nus, labels = grid_setup

    # 5 models / batch 2 -> 3 chunks, last one padded internally
    fresh_dir = tmp_path / "fresh"
    res = synthesize_grid(config, adata, models, nus, fresh_dir,
                          batch_size=2, labels=labels)
    assert res["done"] and res["computed"] == 3
    spec_fresh, nus_out, labels_out = load_grid(fresh_dir)
    assert spec_fresh.shape == (5, len(nus))
    assert np.isfinite(spec_fresh).all() and (spec_fresh > 0).all()
    np.testing.assert_allclose(nus_out, nus)
    assert labels_out == labels
    # hotter models are brighter — a physical sanity check on ordering
    assert spec_fresh[-1].mean() > spec_fresh[0].mean()

    # interrupted scan: one chunk, then "killed"
    part_dir = tmp_path / "partial"
    res1 = synthesize_grid(config, adata, models, nus, part_dir,
                           batch_size=2, labels=labels, max_chunks=1)
    assert res1["computed"] == 1 and not res1["done"]
    spec_part, *_ = load_grid(part_dir)
    assert np.isfinite(spec_part[:2]).all()
    assert np.isnan(spec_part[2:]).all()

    chunk0 = part_dir / "chunk_00000.npz"
    mtime0 = chunk0.stat().st_mtime_ns

    # resume: finishes the remaining chunks without touching chunk 0
    res2 = synthesize_grid(config, adata, models, nus, part_dir,
                           batch_size=2, labels=labels)
    assert res2["done"] and res2["computed"] == 2 and res2["skipped"] == 1
    assert chunk0.stat().st_mtime_ns == mtime0, "finished chunk recomputed"

    spec_resumed, *_ = load_grid(part_dir)
    np.testing.assert_array_equal(spec_resumed, spec_fresh)


def test_grid_identity_guard(grid_setup, tmp_path):
    """A different grid in the same out_dir must be refused, not mixed."""
    config, adata, models, nus, labels = grid_setup
    out = tmp_path / "scan"
    synthesize_grid(config, adata, models[:2], nus, out, batch_size=2,
                    max_chunks=0)
    with pytest.raises(ValueError, match="DIFFERENT grid"):
        synthesize_grid(config, adata, models[:2], nus[:-3], out,
                        batch_size=2)
    with pytest.raises(ValueError, match="DIFFERENT grid"):
        synthesize_grid(config, adata, models[:4], nus, out, batch_size=2)


def test_grid_corrupted_chunk_recomputed(grid_setup, tmp_path):
    """An unreadable checkpoint is recomputed, not trusted."""
    config, adata, models, nus, _ = grid_setup
    out = tmp_path / "scan"
    synthesize_grid(config, adata, models[:2], nus, out, batch_size=2)
    spec_before, *_ = load_grid(out)
    chunk0 = out / "chunk_00000.npz"
    chunk0.write_bytes(b"not a zipfile")
    res = synthesize_grid(config, adata, models[:2], nus, out, batch_size=2)
    assert res["computed"] == 1 and res["done"]
    spec_after, *_ = load_grid(out)
    np.testing.assert_array_equal(spec_after, spec_before)


def test_grid_store_depths_and_manifest(grid_setup, tmp_path):
    """store_depths keeps the full [D, N] field; the manifest records the
    grid's shape parameters."""
    config, adata, models, nus, _ = grid_setup
    out = tmp_path / "scan"
    res = synthesize_grid(config, adata, models[:2], nus, out, batch_size=2,
                          store_depths=True)
    assert res["done"]
    spec, *_ = load_grid(out)
    n_depth = models[0].no_of_depth_points
    assert spec.shape == (2, n_depth, len(nus))
    manifest = json.loads((out / "manifest.json").read_text())
    assert manifest["store_depths"] and manifest["n_models"] == 2
