"""Extended model-atom library: construction and NLTE synthesis."""
import numpy as np
import pytest

from lightweaver_tpu.atmosphere import Atmosphere
from lightweaver_tpu.atomic_set import RadiativeSet
from lightweaver_tpu.context import Context
from lightweaver_tpu.fal import Falc82
from lightweaver_tpu.rh_atoms import (Al_atom, C_atom, CaII_atom, Fe_atom,
                                      H_4_atom, H_6_atom, He_atom, MgII_atom,
                                      N_atom, NaI_atom, O_atom, S_atom,
                                      Si_atom)


def _atmos(nDepth=30):
    full = Falc82()
    idx = np.unique(np.linspace(0, 81, nDepth).astype(int))
    return Atmosphere(height=full.height[idx],
                      temperature=full.temperature[idx],
                      vlos=full.vlos[idx], vturb=full.vturb[idx],
                      ne=full.ne[idx], nHTot=full.nHTot[idx])


def test_all_atoms_construct_and_compute_lte():
    atmos = _atmos()
    atoms = [H_6_atom(), H_4_atom(), CaII_atom(), MgII_atom(), NaI_atom(),
             He_atom(), C_atom(), N_atom(), O_atom(), Si_atom(), Al_atom(),
             S_atom(), Fe_atom()]
    # one RadiativeSet per element family (H_4 conflicts with H_6)
    rs = RadiativeSet([a for a in atoms if a is not atoms[1]])
    eqPops = rs.compute_eq_pops(atmos)
    for a in rs:
        nStar = eqPops.atomicPops[a.element].nStar
        assert np.all(np.isfinite(nStar)) and np.all(nStar >= 0)
        # populations sum to nTotal
        assert np.allclose(nStar.sum(axis=0),
                           eqPops.atomicPops[a.element].nTotal, rtol=1e-8)


@pytest.mark.slow
def test_NaI_D_lines_synthesis():
    atmos = _atmos()
    atmos.quadrature(3)
    rs = RadiativeSet([H_6_atom(), NaI_atom()])
    rs.set_active('Na')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    ctx = Context(atmos, spect, eqPops)
    # the Na I grid reaches scattering-dominated UV continuum wavelengths
    # (sca/chi ~ 0.999) where J relaxes by pure Lambda iteration, so the
    # J criterion needs many iterations (matches the reference's lagged
    # background-scattering treatment)
    for it in range(400):
        ju = ctx.formal_sol_gamma_matrices()
        if it < 3:
            continue
        pu = ctx.stat_equil()
        if float(ju.dJMax) < 5e-3 and pu.dPopsMax < 1e-3:
            break
    assert it < 399
    lam = np.linspace(588.8, 590.2, 201)
    I = ctx.compute_rays(wavelengths=lam, mus=[1.0])
    d2 = I[np.argmin(np.abs(lam - 589.16)), 0]
    d1 = I[np.argmin(np.abs(lam - 589.76)), 0]
    cont = I[0, 0]
    # D lines in absorption, D2 deeper than D1
    assert d2 < 0.6 * cont and d1 < 0.7 * cont
    assert d2 < d1


@pytest.mark.slow
def test_MgII_hk_synthesis():
    atmos = _atmos()
    atmos.quadrature(3)
    rs = RadiativeSet([H_6_atom(), MgII_atom()])
    rs.set_active('Mg')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    ctx = Context(atmos, spect, eqPops)
    for it in range(400):
        ju = ctx.formal_sol_gamma_matrices()
        if it < 3:
            continue
        pu = ctx.stat_equil()
        if float(ju.dJMax) < 5e-3 and pu.dPopsMax < 1e-3:
            break
    assert it < 399
    # PRD lines present on the Mg II model
    assert len(ctx._prd_lines()) == 2
    I = np.asarray(ctx.I)
    assert np.all(np.isfinite(I)) and np.all(I > 0)
