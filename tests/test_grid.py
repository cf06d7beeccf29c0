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


def test_grid_interpolator_multilinear_exact():
    """Multilinear interpolation is exact for spectra linear in the
    parameters, on an unordered 2-D tensor grid; outside the hull the
    query clamps to the boundary."""
    from stardis_tpu.grid import GridInterpolator

    t_ax = np.array([4000.0, 5000.0, 6000.0])
    g_ax = np.array([1.0, 2.5, 4.0, 5.5])
    pts, spec = [], []
    rng = np.random.default_rng(1)
    a = rng.normal(size=7)
    b = rng.normal(size=7)
    c = rng.normal(size=7)
    for t in t_ax:
        for g in g_ax:
            pts.append((t, g))
            spec.append(a * t + b * g + c)
    order = rng.permutation(len(pts))
    interp = GridInterpolator(
        np.asarray(pts)[order], np.asarray(spec)[order]
    )
    for t, g in [(4321.0, 1.7), (5999.0, 5.4), (4000.0, 1.0), (5500.0, 2.5)]:
        np.testing.assert_allclose(
            np.asarray(interp(t, g)), a * t + b * g + c, rtol=1e-12
        )
    # clamped extrapolation = boundary value
    np.testing.assert_allclose(
        np.asarray(interp(3000.0, 0.0)),
        np.asarray(interp(4000.0, 1.0)), rtol=1e-12,
    )

    # non-tensor layouts are refused
    with pytest.raises(ValueError, match="tensor grid"):
        GridInterpolator(np.asarray(pts)[:-1], np.asarray(spec)[:-1])


def test_grid_interpolator_from_scan_and_gradient(grid_setup, tmp_path):
    """An emulator built from a completed scan reproduces grid nodes
    exactly, tracks a directly synthesized intermediate Teff to a few
    percent, and is differentiable in Teff (the fit-through-the-library
    story)."""
    import jax.numpy as jnp

    from stardis_tpu.grid import GridInterpolator, synthesize_grid
    from stardis_tpu.parallel.batch import make_batch, run_batch

    config, adata, models, nus, labels = grid_setup
    out = tmp_path / "scan"
    res = synthesize_grid(config, adata, models, nus, out, batch_size=5,
                          labels=labels)
    assert res["done"]
    interp = GridInterpolator.from_scan(out, keys=("teff",))

    # exact at a node
    node = np.asarray(interp(5777.0))
    plan_b, batch = make_batch(config, adata, [models[2], models[2]], nus)
    direct = np.asarray(run_batch(plan_b, batch))[0, -1, :]
    np.testing.assert_allclose(node, direct, rtol=1e-10)

    # intermediate Teff: emulator vs direct synthesis at 5500 K
    from stardis_tpu.io.marcs import read_marcs_model
    from stardis_tpu.io.synthetic import write_marcs_file
    from stardis_tpu.base import read_stellar_model

    p = tmp_path / "t5500.mod"
    write_marcs_file(p, teff=5500.0)
    m55 = read_stellar_model(config, adata, p)
    plan_b, batch = make_batch(config, adata, [m55, m55], nus)
    direct55 = np.asarray(run_batch(plan_b, batch))[0, -1, :]
    emul55 = np.asarray(interp(5500.0))
    err = np.max(np.abs(emul55 - direct55) / direct55)
    assert err < 0.05, f"emulator error {err:.3f}"

    # differentiable in Teff: recover the target by gradient descent
    target = jnp.asarray(interp(5600.0))

    def loss(t):
        model = interp(t)
        return jnp.sum(((model - target) / target) ** 2)

    g = jax.grad(loss)(5300.0)
    eps = 1.0
    fd = (loss(5300.0 + eps) - loss(5300.0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-3)
    t = 5300.0
    gfn = jax.jit(jax.grad(loss))
    for _ in range(200):
        t = t - float(np.clip(2e4 * float(gfn(t)), -20.0, 20.0))
    assert abs(t - 5600.0) < 10.0, t


def test_grid_identity_covers_config_and_models(grid_setup, tmp_path):
    """The identity hash covers the validated config and the model
    arrays: resuming with changed opacity settings or an edited model is
    refused (review finding: it used to cover only grid/chunking/labels,
    silently mixing physics on resume)."""
    import copy

    config, adata, models, nus, _ = grid_setup
    out = tmp_path / "scan"
    synthesize_grid(config, adata, models[:2], nus, out, batch_size=2,
                    max_chunks=0)

    # same grid, different physics -> refused
    config2 = copy.deepcopy(config)
    config2.set_config_item("opacity.line.disable", True)
    with pytest.raises(ValueError, match="DIFFERENT grid"):
        synthesize_grid(config2, adata, models[:2], nus, out, batch_size=2)

    # same config, perturbed model -> refused
    import dataclasses as _dc  # noqa: F401

    m_edit = copy.deepcopy(models[1])
    m_edit.temperatures = np.asarray(m_edit.temperatures) * 1.01
    with pytest.raises(ValueError, match="DIFFERENT grid"):
        synthesize_grid(config, adata, [models[0], m_edit], nus, out,
                        batch_size=2)


def test_grid_rejects_bad_batch_size(grid_setup, tmp_path):
    config, adata, models, nus, _ = grid_setup
    for bad in (0, -2):
        with pytest.raises(ValueError, match="batch_size"):
            synthesize_grid(config, adata, models[:2], nus,
                            tmp_path / "scan", batch_size=bad)


def test_grid_ascending_nus_normalized(grid_setup, tmp_path):
    """Caller frequency ordering must not matter: an ascending input grid
    produces the same (spectra, nus) pairing as a descending one (review
    finding: the saved tracing_nus used to keep caller order while chunk
    spectra followed the plan's descending grid)."""
    config, adata, models, nus, _ = grid_setup
    asc = np.sort(np.asarray(nus))
    desc = asc[::-1].copy()
    out_a = tmp_path / "asc"
    out_d = tmp_path / "desc"
    synthesize_grid(config, adata, models[:2], asc, out_a, batch_size=2)
    synthesize_grid(config, adata, models[:2], desc, out_d, batch_size=2)
    spec_a, nus_a, _ = load_grid(out_a)
    spec_d, nus_d, _ = load_grid(out_d)
    np.testing.assert_array_equal(nus_a, nus_d)
    assert nus_a[0] > nus_a[-1]  # pipeline convention: descending Hz
    np.testing.assert_array_equal(spec_a, spec_d)


def test_grid_empty_store_depths_shape(grid_setup, tmp_path):
    """load_grid on a scan with no chunks yet returns the promised
    [M, D, N] NaN shape for store_depths scans."""
    config, adata, models, nus, _ = grid_setup
    out = tmp_path / "scan"
    synthesize_grid(config, adata, models[:2], nus, out, batch_size=2,
                    store_depths=True, max_chunks=0)
    spec, *_ = load_grid(out)
    n_depth = models[0].no_of_depth_points
    assert spec.shape == (2, n_depth, len(nus))
    assert np.isnan(spec).all()


def test_grid_identity_ignores_model_path(grid_setup, tmp_path):
    """The identity hash covers model CONTENT, not the config's model
    path: the same atmosphere read from a different file path (multi-host
    per-process copies, or a moved model directory) must resume, not
    refuse.  (Regression: the two-process live scan raced on this —
    whichever worker read the other's manifest first saw a different
    input_model.fname and raised DIFFERENT grid.)"""
    import copy

    config, adata, models, nus, _ = grid_setup
    out = tmp_path / "scan"
    synthesize_grid(config, adata, models[:2], nus, out, batch_size=2)

    config2 = copy.deepcopy(config)
    config2.set_config_item(
        "input_model.fname", str(tmp_path / "elsewhere" / "sun.mod")
    )
    res = synthesize_grid(config2, adata, models[:2], nus, out,
                          batch_size=2)
    assert res["done"] and res["skipped"] == 1 and res["computed"] == 0


def test_grid_interpolator_leave_one_out(grid_setup):
    """Round-4 verdict #5: bound the emulator.  Leave-one-out over a real
    synthesized Teff scan: drop each interior grid member, interpolate it
    from its neighbours, and measure the max relative flux error — in
    linear flux and in log flux.  Spectra vary near-exponentially in
    Teff, so log_flux must shrink the error on the same scan; both modes
    must be bounded (figures below are asserted, so they cannot rot)."""
    from stardis_tpu.grid import GridInterpolator
    from stardis_tpu.parallel.batch import make_batch, run_batch

    config, adata, models, nus, labels = grid_setup
    teffs = np.asarray([lab["teff"] for lab in labels])
    plan, batch = make_batch(config, adata, models, nus)
    spectra = np.asarray(run_batch(plan, batch))[:, -1, :]  # [M, N] surface

    def loo_error(log_flux):
        worst = 0.0
        for i in range(1, len(teffs) - 1):
            keep = np.arange(len(teffs)) != i
            interp = GridInterpolator(
                teffs[keep], spectra[keep], log_flux=log_flux
            )
            pred = np.asarray(interp(teffs[i]))
            rel = np.abs(pred - spectra[i]) / spectra[i]
            worst = max(worst, float(rel.max()))
        return worst

    err_lin = loo_error(False)
    err_log = loo_error(True)
    # log interpolation removes the dominant exponential curvature
    assert err_log < err_lin, (err_log, err_lin)
    # measured on this scan (400-625 K spacings): see docstring guidance
    # in GridInterpolator; generous ceilings so platform jitter cannot
    # flake the test while still catching an interpolation regression
    assert err_lin < 0.20, err_lin
    assert err_log < 0.10, err_log


def test_grid_interpolator_log_flux_exact_and_positive():
    """log_flux mode stays exact on grid nodes, rejects nonpositive
    spectra, and composes with from_scan."""
    from stardis_tpu.grid import GridInterpolator

    pts = np.array([1.0, 2.0, 4.0])
    spec = np.exp(np.array([[1.0, 2.0], [3.0, 1.0], [0.5, 4.0]]))
    gi = GridInterpolator(pts, spec, log_flux=True)
    for k, p in enumerate(pts):
        np.testing.assert_allclose(np.asarray(gi(p)), spec[k], rtol=1e-12)
    # mid-cell: log-linear means geometric mean of the node values
    np.testing.assert_allclose(
        np.asarray(gi(1.5)), np.sqrt(spec[0] * spec[1]), rtol=1e-12
    )
    with pytest.raises(ValueError, match="positive"):
        GridInterpolator(pts, spec - spec.min() - 1.0, log_flux=True)
