"""Post-processing utilities: unit conversions, CRSW, depth diagnostics."""
import numpy as np
import pytest

from lightweaver_tpu.utils import (CrswIterator, UnityCrswIterator,
                                   air_to_vac, compute_contribution_fn,
                                   compute_radiative_losses,
                                   convert_specific_intensity, vac_to_air)


def test_vac_air_roundtrip():
    lam = np.linspace(300.0, 1000.0, 64)
    assert np.allclose(air_to_vac(vac_to_air(lam)), lam, rtol=1e-10)
    # Ca II K: vacuum 393.4776 nm -> air 393.3663 nm (NIST)
    assert abs(vac_to_air(393.4776) - 393.3663) < 1e-3
    # air < vacuum wavelength always
    assert np.all(vac_to_air(lam) < lam)


def test_intensity_conversion():
    lam = 500.0                      # nm
    I_nu = 1e-8                      # J/s/m2/sr/Hz
    I_ang = convert_specific_intensity(lam, I_nu, 'erg/s/cm2/sr/A')
    # I_lambda = I_nu c/lambda^2; 1 J/m2 = 1e3 erg/cm2; per A = 1e-10 m
    expected = I_nu * 2.99792458e8 / (500e-9) ** 2 * 1e3 * 1e-10
    assert np.isclose(I_ang, expected, rtol=1e-12)


def test_crsw_schedule():
    crsw = CrswIterator(initVal=1e3)
    vals = [crsw() for _ in range(5000)]
    assert vals[0] < 1e3
    assert all(b <= a for a, b in zip(vals, vals[1:]))
    assert vals[-1] == 1.0
    assert UnityCrswIterator()() == 1.0


@pytest.fixture(scope='module')
def converged_ctx():
    from lightweaver_tpu.atmosphere import Atmosphere
    from lightweaver_tpu.atomic_set import RadiativeSet
    from lightweaver_tpu.context import Context
    from lightweaver_tpu.fal import Falc82
    from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom

    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 30).astype(int))
    atmos = Atmosphere(height=full.height[idx],
                      temperature=full.temperature[idx],
                      vlos=full.vlos[idx], vturb=full.vturb[idx],
                      ne=full.ne[idx], nHTot=full.nHTot[idx])
    atmos.quadrature(3)
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    ctx = Context(atmos, spect, eqPops)
    for it in range(60):
        ctx.formal_sol_gamma_matrices()
        if it >= 3:
            ctx.stat_equil()
    ctx.depthData.fill = True
    ctx.formal_sol_gamma_matrices()
    return ctx


@pytest.mark.slow
def test_contribution_fn(converged_ctx):
    ctx = converged_ctx
    cfn = compute_contribution_fn(ctx, mu=-1)
    assert cfn.shape == (ctx.cfg.Nlam, ctx.cfg.Nk)
    assert np.all(np.isfinite(cfn)) and np.all(cfn >= 0)
    # continuum forms deeper than the K-line core
    lam = np.asarray(ctx.spect.wavelength)
    core = np.argmin(np.abs(lam - 393.48))
    cont = np.argmin(np.abs(lam - 500.0))
    hCore = np.asarray(ctx.atmos.height)[np.argmax(cfn[core])]
    hCont = np.asarray(ctx.atmos.height)[np.argmax(cfn[cont])]
    assert hCore > hCont


@pytest.mark.slow
def test_radiative_losses(converged_ctx):
    ctx = converged_ctx
    loss = compute_radiative_losses(ctx)
    assert loss.shape == (ctx.cfg.Nlam, ctx.cfg.Nk)
    assert np.all(np.isfinite(loss))
    # at the optically-thick Ca II K core, deep layers are in detailed
    # balance (S -> I): relative departure small there
    chi = np.asarray(ctx.depthData.chi)
    eta = np.asarray(ctx.depthData.eta)
    sca = np.asarray(ctx.bgSca)
    J = np.asarray(ctx.J)
    S = (eta + (sca * J)[:, None, None, :]) / chi
    I = np.asarray(ctx.depthData.I)
    lam = np.asarray(ctx.spect.wavelength)
    core = np.argmin(np.abs(lam - 393.48))
    rel = np.abs(S - I)[core, :, :, -3:-1] / S[core, :, :, -3:-1]
    assert rel.max() < 0.01
