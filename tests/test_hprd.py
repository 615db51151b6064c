"""Hybrid PRD (Doppler-shift coherent redistribution).

Oracles: with zero velocities the comoving and observer frames coincide,
so hprd=True must reproduce plain angle-averaged PRD; with a strong
velocity gradient the hPRD rho departs from the static-frame rho.
"""
import numpy as np
import pytest

from lightweaver_tpu.atmosphere import Atmosphere
from lightweaver_tpu.atomic_set import RadiativeSet
from lightweaver_tpu.context import Context
from lightweaver_tpu.fal import Falc82
from lightweaver_tpu.rh_atoms import H_6_atom


def _setup(vel=None, nDepth=24):
    full = Falc82()
    idx = np.unique(np.linspace(0, 81, nDepth).astype(int))
    vlos = np.zeros(len(idx)) if vel is None else vel(len(idx))
    atmos = Atmosphere(height=full.height[idx],
                       temperature=full.temperature[idx],
                       vlos=vlos, vturb=full.vturb[idx],
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


@pytest.mark.slow
def test_hprd_static_matches_prd():
    atmos, spect, eqPops = _setup()
    ctx = Context(atmos, spect, eqPops, hprd=True)
    assert ctx.cfg.hprd and len(ctx.cfg.prdIdxs) > 0
    _run(ctx)
    ai, ti, a, t = ctx._prd_lines()[0]
    rhoH = np.asarray(ctx.rhoPrd[ai][ti])

    atmos2, spect2, eqPops2 = _setup()
    ctx2 = Context(atmos2, spect2, eqPops2, hprd=False)
    _run(ctx2)
    rhoP = np.asarray(ctx2.rhoPrd[ai][ti])
    # identical physics at v = 0 (JRest == J on the window; the shifted
    # rho interpolation is the identity)
    assert np.allclose(rhoH, rhoP, rtol=1e-6), np.abs(rhoH/rhoP-1).max()


@pytest.mark.slow
def test_hprd_velocity_gradient_departs():
    def vel(n):
        return np.linspace(-30e3, 30e3, n)      # +-30 km/s gradient
    atmos, spect, eqPops = _setup(vel=vel)
    ctx = Context(atmos, spect, eqPops, hprd=True)
    _run(ctx, nIter=30)
    ai, ti, a, t = ctx._prd_lines()[0]
    rhoH = np.asarray(ctx.rhoPrd[ai][ti])

    atmos2, spect2, eqPops2 = _setup(vel=vel)
    ctx2 = Context(atmos2, spect2, eqPops2, hprd=False)
    _run(ctx2, nIter=30)
    rhoP = np.asarray(ctx2.rhoPrd[ai][ti])
    assert np.all(np.isfinite(rhoH)) and np.all(rhoH > 0)
    # the comoving treatment changes rho measurably under the gradient
    assert np.abs(rhoH / rhoP - 1.0).max() > 0.01
