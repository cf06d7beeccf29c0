"""Fit stellar parameters through a checkpointed spectral library.

The library-scale companion to examples/fit_stellar_parameters.py (which
differentiates through the full pipeline): here a Teff grid is
synthesized ONCE with checkpoint/resume (stardis_tpu.grid), and the fit
descends on (Teff, v sin i) through the differentiable multilinear
emulator composed with the differentiable rotational convolution — each
fit iteration costs microseconds instead of a pipeline execution, the
standard trade when fitting many observed spectra against one library.

Run:  python examples/fit_with_emulator.py
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import yaml


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from stardis_tpu import parse_config_to_model
    from stardis_tpu import units as u
    from stardis_tpu.base import read_stellar_model
    from stardis_tpu.constants import C_KMS
    from stardis_tpu.grid import GridInterpolator, synthesize_grid
    from stardis_tpu.io.synthetic import write_marcs_file
    from stardis_tpu.parallel.batch import make_batch, run_batch
    from stardis_tpu.postprocessing import rotation_broadening_jax

    tmp = Path(tempfile.mkdtemp(prefix="stardis_emul_"))
    teffs = [5000.0, 5200.0, 5400.0, 5600.0, 5800.0, 6000.0]
    model_paths = []
    for teff in teffs:
        p = tmp / f"t{int(teff)}.mod"
        write_marcs_file(p, teff=teff)
        model_paths.append(p)
    config_dict = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:5",
        "input_model": {
            "type": "marcs", "fname": str(model_paths[0]),
            "final_atomic_number": 5,
        },
        "opacity": {
            "bf": {"H_I": {}}, "ff": {"H_I": {}}, "rayleigh": ["H"],
            "line": {"disable": False, "broadening": ["radiation"]},
        },
        "no_of_thetas": 5,
        "result_options": {},
    }
    cfg = tmp / "c.yml"
    cfg.write_text(yaml.safe_dump(config_dict))
    config, adata, _m0 = parse_config_to_model(cfg)
    models = [read_stellar_model(config, adata, p) for p in model_paths]

    lams = np.arange(6556.0, 6572.0, 0.05)
    nus = np.asarray(u.Quantity(lams, u.AA).to(u.Hz, u.spectral()))

    # one checkpointed scan; re-running this script reuses it chunk by chunk
    print(f"synthesizing the {len(teffs)}-point Teff library ...")
    res = synthesize_grid(
        config, adata, models, nus, tmp / "library", batch_size=3,
        labels=[{"teff": t} for t in teffs],
    )
    print(f"  scan: {res['computed']} chunk(s) computed, "
          f"{res['skipped']} resumed")
    # log_flux: spectra vary near-exponentially in Teff, so interpolating
    # log F roughly halves the mid-cell emulator error (measured in
    # tests/test_grid.py::test_grid_interpolator_leave_one_out)
    emul = GridInterpolator.from_scan(tmp / "library", keys=("teff",),
                                      log_flux=True)

    # "observed" star: direct synthesis OFF the grid nodes + rotation
    true_teff, true_vrot = 5640.0, 9.0
    p_obs = tmp / "obs.mod"
    write_marcs_file(p_obs, teff=true_teff)
    m_obs = read_stellar_model(config, adata, p_obs)
    plan_b, batch = make_batch(config, adata, [m_obs, m_obs], nus)
    surface = jnp.asarray(np.asarray(run_batch(plan_b, batch))[0, -1, :])

    vel_pix = float(0.05 / lams.mean() * C_KMS)  # km/s per pixel
    HALF = 24

    def forward(teff, vrot, spec=None):
        s = emul(teff) if spec is None else spec
        b = rotation_broadening_jax(vel_pix, s, vrot, half_width_pix=HALF)
        return b / b.mean()

    observed = forward(None, true_vrot, spec=surface)

    @jax.jit
    def loss_and_grad(params):
        def loss(p):
            return jnp.mean((forward(p[0], p[1]) - observed) ** 2)

        return jax.value_and_grad(loss)(params)

    params = jnp.asarray([5300.0, 3.0])
    pscale = jnp.asarray([2000.0, 60.0])
    m = v = 0.0
    lr, b1, b2 = 5e-2, 0.9, 0.999
    print(f"target: Teff {true_teff:.0f} K, v sin i {true_vrot:.1f} km/s; "
          f"start ({float(params[0]):.0f}, {float(params[1]):.1f})")
    for i in range(120):
        val, g = loss_and_grad(params)
        g = g * pscale
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mhat = m / (1 - b1 ** (i + 1))
        vhat = v / (1 - b2 ** (i + 1))
        params = params - lr / (1 + 0.02 * i) * pscale * mhat / (
            jnp.sqrt(vhat) + 1e-12
        )
        if i % 15 == 0 or i == 119:
            print(f"  iter {i:3d}: loss {float(val):.3e} "
                  f"Teff {float(params[0]):7.1f} "
                  f"vsini {float(params[1]):.2f}")

    err_t = abs(float(params[0]) - true_teff)
    err_v = abs(float(params[1]) - true_vrot)
    print(f"recovered Teff {float(params[0]):.1f} K (|err| {err_t:.1f}), "
          f"v sin i {float(params[1]):.2f} km/s (|err| {err_v:.2f})")
    # the Teff bias budget is the emulator's linear-interpolation error
    # over the 200 K node spacing, not the optimizer
    assert err_t < 40.0, "emulator fit failed to converge on Teff"
    assert err_v < 0.5, "emulator fit failed to converge on v sin i"
    print("OK")


if __name__ == "__main__":
    main()
