"""Spectral-library grid scans with checkpoint/resume.

The reference is a single-shot, minutes-scale code: it has no mid-run
persistence at all (SURVEY.md §5 — checkpoint/resume "none"; persistence
is `to_hdf` of finished outputs, reference util/regression_data.py:136-160).
A TPU production deployment synthesizes spectral LIBRARIES — grids of
thousands of atmospheres over (Teff, log g, [Fe/H], ...) — where losing
hours of completed work to a preemption is not acceptable.

``synthesize_grid`` partitions the model list into fixed-size chunks,
runs each chunk through ``parallel.batch.run_batch`` (one template plan,
so the compiled-stage cache makes every chunk after the first
compile-free), and checkpoints each completed chunk ATOMICALLY
(write to a temp file in the same directory, then ``os.replace``) as
``chunk_XXXXX.npz`` under ``out_dir`` next to a ``manifest.json`` that
pins the grid's identity (frequency grid, model count, chunking, labels).
A re-run over the same ``out_dir``:

* verifies the manifest matches the requested grid — the identity hash
  covers the frequency grid, chunking, labels, the full validated config
  AND every model's physical arrays, so a different grid, changed
  opacity settings, or an edited model file in the same directory is an
  error, not a silent mix (this is why resuming re-reads the model
  files: their content feeds the identity check);
* skips chunks whose files exist and load cleanly (a chunk truncated by
  a kill cannot exist — the rename is atomic — but unreadable files are
  recomputed, not trusted);
* computes only the missing chunks.

So a scan killed at chunk k resumes at chunk k, bit-identically to an
uninterrupted run (chunking fixes the batch contents, and each batch is
an independent computation).

Multi-host: every process executes every chunk (run_batch over a global
mesh is a collective program), but only process 0 writes checkpoints —
``out_dir`` must be a SHARED filesystem so the skip decisions (which are
filesystem reads) agree across processes; divergent skip decisions would
desynchronize the collective.
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path

import numpy as np

from stardis_tpu.parallel.batch import collect_batch_inputs, make_batch, run_batch

_MANIFEST = "manifest.json"


def _chunk_name(i: int) -> str:
    return f"chunk_{i:05d}.npz"


def _grid_identity(tracing_nus_hz, batch_size, labels, store_depths,
                   config, stellar_models):
    """Fingerprint of everything that defines chunk contents: the
    frequency grid, the chunking, the labels, the full validated config
    (opacity sources, broadening list, window mode, ...) and each model's
    physical arrays — so a resumed scan cannot silently mix spectra
    computed under different physics or edited model files."""
    import hashlib

    h = hashlib.md5()
    h.update(np.ascontiguousarray(np.asarray(tracing_nus_hz, np.float64)).tobytes())
    h.update(str((len(stellar_models), int(batch_size),
                  bool(store_depths))).encode())
    if labels is not None:
        h.update(json.dumps(labels, sort_keys=True, default=float).encode())
    import copy

    cfg_dict = config.to_dict() if hasattr(config, "to_dict") else config
    cfg_dict = copy.deepcopy(cfg_dict)
    # the config's model PATH is irrelevant (and harmful) here: the model
    # CONTENT is hashed below, and the same atmosphere at a different
    # path — per-process file copies on multi-host, or a user moving
    # their model directory — must not invalidate the checkpoints
    if isinstance(cfg_dict, dict):
        cfg_dict.get("input_model", {}).pop("fname", None)
    h.update(json.dumps(cfg_dict, sort_keys=True, default=str).encode())
    for m in stellar_models:
        h.update(np.ascontiguousarray(
            np.asarray(m.temperatures, np.float64)).tobytes())
        h.update(np.ascontiguousarray(
            np.asarray(m.geometry.r, np.float64)).tobytes())
        h.update(np.ascontiguousarray(np.asarray(
            m.composition.elemental_number_density.values, np.float64
        )).tobytes())
    return h.hexdigest()


def _atomic_savez(path: Path, **arrays):
    fd, tmp = tempfile.mkstemp(
        prefix=path.name + ".", suffix=".tmp", dir=str(path.parent)
    )
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def _chunk_ok(path: Path, idx_expected) -> bool:
    """A checkpoint counts only if it loads cleanly and covers the right
    model indices — anything else is recomputed, not trusted."""
    if not path.exists():
        return False
    try:
        with np.load(path) as z:
            return bool(np.array_equal(z["idx"], idx_expected)) and (
                "spectrum" in z.files
            )
    except Exception:
        return False


def synthesize_grid(
    config,
    atom_data,
    stellar_models,
    tracing_nus_hz,
    out_dir,
    batch_size: int | None = None,
    mesh=None,
    dtype=np.float64,
    labels: list | None = None,
    store_depths: bool = False,
    max_chunks: int | None = None,
    resume: bool = True,
):
    """Synthesize a grid of atmospheres with per-chunk checkpointing.

    Parameters
    ----------
    config, atom_data : parsed STARDIS config + atom data (shared by every
        grid member — one compiled program serves the whole scan).
    stellar_models : list of StellarModel (equal depth counts/geometry).
    tracing_nus_hz : [N] frequency grid (Hz, descending).
    out_dir : checkpoint directory; created if missing.  Completed chunks
        are ``chunk_XXXXX.npz`` files with ``idx`` (model indices) and
        ``spectrum`` ([b, N] emergent F_nu, or [b, D, N] with
        ``store_depths``).
    batch_size : models per chunk (static compile shape).  Defaults to the
        mesh's batch-axis size, else ``min(8, len(models))``.  The last
        chunk is padded by repeating its final model (padding is sliced
        off before saving), so every chunk runs the SAME compiled program.
    mesh : optional jax mesh with a 'batch' axis (optionally x 'nu') —
        passed through to run_batch; batch_size must then be a multiple of
        the batch-axis size.
    labels : optional JSON-serializable per-model labels (e.g. Teff/logg
        dicts), pinned into the manifest and returned by load_grid.
    max_chunks : stop after this many newly computed chunks (for tests /
        time-budgeted scans); the scan stays resumable.
    resume : reuse existing valid chunk files (default).  ``False``
        recomputes everything (existing files are overwritten).

    Returns
    -------
    dict with ``computed`` / ``skipped`` / ``total`` chunk counts,
    ``out_dir``, and ``done`` (True when every chunk is finished).
    """
    from stardis_tpu.util.compile_cache import enable_compilation_cache

    enable_compilation_cache()  # no-op unless STARDIS_COMPILE_CACHE set
    try:
        import jax

        lead = jax.process_index() == 0
    except Exception:
        lead = True
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    n_models = len(stellar_models)
    if n_models == 0:
        raise ValueError("empty model list")
    if labels is not None and len(labels) != n_models:
        raise ValueError("labels must match stellar_models")
    if batch_size is None:
        if mesh is not None and "batch" in mesh.axis_names:
            batch_size = int(mesh.shape["batch"])
        else:
            batch_size = min(8, n_models)
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    if mesh is not None and "batch" in mesh.axis_names and (
        batch_size % int(mesh.shape["batch"])
    ):
        raise ValueError(
            f"batch_size {batch_size} must be a multiple of the mesh "
            f"batch axis ({int(mesh.shape['batch'])})"
        )

    # normalize to the pipeline's grid convention (descending Hz) so the
    # saved tracing_nus always matches the chunk spectra's frequency axis
    # regardless of the caller's ordering
    nus = np.sort(np.asarray(tracing_nus_hz, dtype=np.float64))[::-1].copy()
    n_chunks = -(-n_models // batch_size)
    identity = _grid_identity(nus, batch_size, labels, store_depths,
                              config, stellar_models)

    manifest_path = out_dir / _MANIFEST
    manifest = {
        "identity": identity,
        "n_models": n_models,
        "batch_size": batch_size,
        "n_chunks": n_chunks,
        "n_nu": int(len(nus)),
        "n_depth": int(stellar_models[0].no_of_depth_points),
        "store_depths": store_depths,
        "labels": labels,
    }
    if manifest_path.exists():
        existing = json.loads(manifest_path.read_text())
        if existing.get("identity") != identity:
            raise ValueError(
                f"{out_dir} holds checkpoints for a DIFFERENT grid "
                "(frequency grid / model count / chunking / labels "
                "mismatch); use a fresh out_dir or delete the old scan"
            )
    elif lead:
        tmp = manifest_path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(manifest, indent=1, default=float))
        os.replace(tmp, manifest_path)
    # the frequency grid itself, once (needed to interpret the spectra)
    nus_path = out_dir / "tracing_nus.npz"
    if lead and not nus_path.exists():
        _atomic_savez(nus_path, tracing_nus=nus)

    plan = None
    computed = 0
    skipped = 0
    finished = set()  # chunk indices done in THIS invocation or on disk
    for ci in range(n_chunks):
        lo = ci * batch_size
        hi = min(lo + batch_size, n_models)
        idx = np.arange(lo, hi)
        path = out_dir / _chunk_name(ci)
        if resume and _chunk_ok(path, idx):
            skipped += 1
            finished.add(ci)
            continue
        if max_chunks is not None and computed >= max_chunks:
            break
        members = list(stellar_models[lo:hi])
        pad = batch_size - len(members)
        if pad:
            members = members + [members[-1]] * pad
        if plan is None:
            plan, batch = make_batch(config, atom_data, members, nus,
                                     dtype=dtype)
        else:
            batch = collect_batch_inputs(config, members, plan, dtype=dtype)
        out = run_batch(plan, batch, mesh=mesh)  # [b, D, N]
        if getattr(out, "is_fully_addressable", True):
            f_nu = np.asarray(out)
        else:
            # multi-host global mesh: every process holds only its shards;
            # gather so the lead process can write the whole chunk
            from jax.experimental import multihost_utils

            f_nu = np.asarray(multihost_utils.process_allgather(out,
                                                                tiled=True))
        f_nu = f_nu[: len(idx)]
        spectrum = f_nu if store_depths else f_nu[:, -1, :]
        if lead:
            _atomic_savez(path, idx=idx, spectrum=spectrum)
        computed += 1
        finished.add(ci)

    # chunks computed in this invocation count as done without re-reading
    # the filesystem (a non-lead process never writes, and the lead's
    # write may not be visible to peers yet)
    done = all(
        ci in finished
        or _chunk_ok(
            out_dir / _chunk_name(ci),
            np.arange(ci * batch_size, min((ci + 1) * batch_size, n_models)),
        )
        for ci in range(n_chunks)
    )
    return {
        "out_dir": str(out_dir),
        "total": n_chunks,
        "computed": computed,
        "skipped": skipped,
        "done": done,
    }


class GridInterpolator:
    """Differentiable multilinear interpolation over a spectral library.

    The standard consumption pattern for a synthetic grid: spectra are
    synthesized at tensor-grid parameter points (Teff, log g, ...) and
    interpolated to arbitrary parameter values when fitting an observed
    spectrum.  The interpolation is pure jnp, so ``jax.grad`` flows
    through the query parameters — a chi-square fit against an observed
    spectrum can descend on (Teff, ...) directly through the emulator
    (and compose with the differentiable post-processing kernels for
    v sin i / resolution).

    Parameters
    ----------
    points : [M, P] parameter values of the library members.  They must
        form a full tensor grid (every combination of each axis's unique
        values present exactly once) — the library layout
        ``synthesize_grid`` produces when driven over nested parameter
        loops.
    spectra : [M, ...] per-member spectra (any trailing shape).
    log_flux : interpolate ``log(spectra)`` and exponentiate the result.
        Stellar fluxes vary near-exponentially in Teff (Planck tail:
        F ~ exp(-h nu / k T)), so LINEAR interpolation between grid
        nodes systematically overestimates flux mid-cell; interpolating
        in log space removes the dominant (exponential) part of that
        curvature error.  Requires strictly positive spectra.

    Accuracy guidance (measured by the leave-one-out test,
    tests/test_grid.py::test_grid_interpolator_leave_one_out, on a
    solar-type Halpha scan with 400-625 K node spacing): dropping a
    node and predicting it across the resulting ~1000-1200 K cell
    gives <=9.9% max relative flux error in linear flux and <=6.0%
    with ``log_flux=True``.  Both modes converge as O(spacing^2), so
    at the scan's own ~500 K spacing the mid-cell error is ~1/4 of
    those figures (~2.5% / ~1.5%), and halving the spacing quarters
    it again.  Pick the Teff spacing so that
    (spacing / 1100 K)^2 x 6% meets the fit's accuracy target, and
    prefer ``log_flux=True`` whenever spectra are positive.

    Queries outside the grid hull are clamped to the boundary (constant
    extrapolation) — clamping keeps gradients finite and a fit inside
    the hull unaffected.
    """

    def __init__(self, points, spectra, log_flux: bool = False):
        import jax.numpy as jnp

        points = np.asarray(points, dtype=np.float64)
        spectra = np.asarray(spectra)
        self.log_flux = bool(log_flux)
        if self.log_flux:
            if not (spectra > 0).all():
                raise ValueError(
                    "log_flux=True needs strictly positive spectra"
                )
            spectra = np.log(spectra)
        if points.ndim == 1:
            points = points[:, None]
        m, p = points.shape
        if spectra.shape[0] != m:
            raise ValueError("points and spectra disagree on member count")
        self.axes = [np.unique(points[:, a]) for a in range(p)]
        shape = tuple(len(ax) for ax in self.axes)
        if int(np.prod(shape)) != m:
            raise ValueError(
                f"{m} members do not form a tensor grid over axis sizes "
                f"{shape} — every parameter combination must appear "
                "exactly once"
            )
        # place each member at its grid cell
        grid = np.empty(shape + spectra.shape[1:], dtype=spectra.dtype)
        filled = np.zeros(shape, dtype=bool)
        for k in range(m):
            idx = tuple(
                int(np.searchsorted(self.axes[a], points[k, a]))
                for a in range(p)
            )
            if filled[idx]:
                raise ValueError(
                    f"duplicate grid point {tuple(points[k])}"
                )
            filled[idx] = True
            grid[idx] = spectra[k]
        if not filled.all():
            raise ValueError("missing tensor-grid combinations")
        self.grid = jnp.asarray(grid)
        self._axes_dev = [jnp.asarray(ax) for ax in self.axes]

    def __call__(self, *params):
        """Interpolated spectrum at the given parameter values (one scalar
        per axis; traced values are fine — jit/grad-compatible)."""
        import itertools

        import jax.numpy as jnp

        if len(params) != len(self.axes):
            raise ValueError(
                f"expected {len(self.axes)} parameters, got {len(params)}"
            )
        cells = []
        for x, ax in zip(params, self._axes_dev):
            if len(ax) == 1:
                cells.append((jnp.asarray(0), jnp.asarray(0.0)))
                continue
            i = jnp.clip(jnp.searchsorted(ax, x) - 1, 0, len(ax) - 2)
            t = (x - ax[i]) / (ax[i + 1] - ax[i])
            cells.append((i, jnp.clip(t, 0.0, 1.0)))
        out = 0.0
        for corner in itertools.product((0, 1), repeat=len(cells)):
            w = 1.0
            idx = []
            for (i, t), c in zip(cells, corner):
                w = w * (t if c else 1.0 - t)
                idx.append(i + c)
            out = out + w * self.grid[tuple(idx)]
        if self.log_flux:
            out = jnp.exp(out)
        return out

    @classmethod
    def from_scan(cls, out_dir, keys, log_flux: bool = False):
        """Build from a completed synthesize_grid directory whose labels
        carry numeric parameters, e.g. keys=("teff", "logg")."""
        spectra, _nus, labels = load_grid(out_dir)
        if labels is None:
            raise ValueError("the scan has no labels to interpolate over")
        if np.isnan(spectra).any():
            raise ValueError("the scan is incomplete (NaN members present)")
        points = np.asarray(
            [[float(lab[k]) for k in keys] for lab in labels]
        )
        return cls(points, spectra, log_flux=log_flux)


def load_grid(out_dir):
    """Assemble a completed (or partial) grid scan.

    Returns (spectra, tracing_nus, labels): spectra is [M, N] emergent
    F_nu (or [M, D, N] for store_depths scans) with NaN rows for chunks
    not yet computed; labels is the manifest's per-model list (or None).
    """
    out_dir = Path(out_dir)
    manifest = json.loads((out_dir / _MANIFEST).read_text())
    with np.load(out_dir / "tracing_nus.npz") as z:
        nus = z["tracing_nus"]
    n_models = manifest["n_models"]
    spectra = None
    for ci in range(manifest["n_chunks"]):
        path = out_dir / _chunk_name(ci)
        if not path.exists():
            continue
        try:
            with np.load(path) as z:
                idx, spec = z["idx"], z["spectrum"]
        except Exception:
            continue
        if spectra is None:
            spectra = np.full((n_models,) + spec.shape[1:], np.nan,
                              dtype=spec.dtype)
        spectra[idx] = spec
    if spectra is None:
        shape = (n_models, manifest["n_nu"])
        if manifest.get("store_depths") and "n_depth" in manifest:
            shape = (n_models, manifest["n_depth"], manifest["n_nu"])
        spectra = np.full(shape, np.nan)
    return spectra, nus, manifest.get("labels")
