"""Hybrid PRD (Doppler-shift coherent redistribution in the comoving frame).

Oracles:

1. With zero velocities the comoving and observer frames coincide, so
   hprd=True must reproduce plain angle-averaged PRD.
2. Galilean frame invariance: under a UNIFORM velocity field the
   comoving-frame problem is exactly the static problem (every ray's
   Doppler shift is undone by the comoving transform), so the hPRD
   emission-profile ratio rho — defined in the comoving frame — must
   match the static-atmosphere rho quantitatively, while plain
   angle-averaged PRD (observer frame, velocity-shifted profiles
   smearing the redistribution integral) departs.

   The comparison excludes the outermost window wavelengths: JRest is a
   linear interpolation of the spectrum on the Doppler-shifted global
   grid, and at the PRD-window edges the neighbouring global-grid point
   can be ~1 nm away (other transitions' sparse coverage), so any shift
   leaks continuum-level intensity into deep-wing wavelengths where
   J is orders of magnitude smaller.  This is the reference's behaviour
   too: its tent-adjoint JCoeffs accumulation
   (ref: /root/reference/Source/Prd.cpp:820-897,
   SimdFullIterationTemplates.hpp:397-408) is algebraically the same
   linear interpolation, with the same sparse-gap leak.  Interior
   window wavelengths (dense local grid, shift << spacing) are the
   quantitative test surface.
"""
import numpy as np
import pytest

from lightweaver_tpu.atmosphere import Atmosphere
from lightweaver_tpu.atomic_set import RadiativeSet
from lightweaver_tpu.context import Context
from lightweaver_tpu.fal import Falc82
from lightweaver_tpu.rh_atoms import H_6_atom

V0 = 15e3          # uniform velocity for the frame-invariance oracle
TRIM = 10          # window-edge rows excluded (sparse-gap leak; see above)


def _setup(v0=0.0, nDepth=24):
    full = Falc82()
    idx = np.unique(np.linspace(0, 81, nDepth).astype(int))
    atmos = Atmosphere(height=full.height[idx],
                       temperature=full.temperature[idx],
                       vlos=np.full(len(idx), v0), vturb=full.vturb[idx],
                       ne=full.ne[idx], nHTot=full.nHTot[idx])
    atmos.quadrature(3)
    rs = RadiativeSet([H_6_atom()])
    rs.set_active('H')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    return atmos, spect, eqPops


def _run(ctx, nIter=40, nPrd=4):
    for it in range(nIter):
        ctx.formal_sol_gamma_matrices()
        if it < 3:
            continue
        ctx.stat_equil()
        ctx.prd_redistribute(maxIter=nPrd, tol=1e-3)


def _converged_rho(v0, hprd):
    atmos, spect, eqPops = _setup(v0)
    ctx = Context(atmos, spect, eqPops, hprd=hprd)
    if hprd:
        assert ctx.cfg.hprd and len(ctx.cfg.prdIdxs) > 0
    _run(ctx)
    ai, ti, a, t = ctx._prd_lines()[0]
    return np.asarray(ctx.rhoPrd[ai][ti])


@pytest.fixture(scope='module')
def rho_static_hprd():
    """Converged Ly-alpha rho for the static atmosphere (hprd=True)."""
    return _converged_rho(0.0, hprd=True)


@pytest.mark.slow
def test_hprd_static_matches_prd(rho_static_hprd):
    # identical physics at v = 0 (JRest == J on the window; the shifted
    # rho interpolation is the identity)
    rhoP = _converged_rho(0.0, hprd=False)
    assert np.allclose(rho_static_hprd, rhoP, rtol=1e-6), \
        np.abs(rho_static_hprd / rhoP - 1).max()


@pytest.mark.slow
def test_hprd_uniform_velocity_frame_invariance(rho_static_hprd):
    """Quantitative comoving-frame oracle (measured tolerances at
    v0 = 15 km/s, ~1.2x the chromospheric H Doppler width):

    - hPRD rho on interior window wavelengths matches the static rho
      (max ~7.7e-2 from shift-interpolation error, median ~1e-5);
    - plain observer-frame PRD departs ~2.3x more at the max and ~30x
      at the median -- the comoving treatment is what preserves the
      invariance, not smallness of the velocity."""
    rho0 = rho_static_hprd[TRIM:-TRIM]
    rhoH = _converged_rho(V0, hprd=True)[TRIM:-TRIM]
    rhoP = _converged_rho(V0, hprd=False)[TRIM:-TRIM]
    assert np.all(np.isfinite(rhoH)) and np.all(rhoH > 0)

    errH = np.abs(rhoH / rho0 - 1.0)
    errP = np.abs(rhoP / rho0 - 1.0)
    # frame invariance of the comoving formulation
    assert errH.max() < 0.1, errH.max()
    assert np.median(errH) < 1e-4, np.median(errH)
    # ...which the observer-frame formulation does not share
    assert errP.max() > 1.5 * errH.max(), (errP.max(), errH.max())
    assert np.median(errP) > 5.0 * np.median(errH), \
        (np.median(errP), np.median(errH))
