"""Escape-probability initial solution."""
import numpy as np
import pytest

from lightweaver_tpu.atmosphere import Atmosphere
from lightweaver_tpu.atomic_set import RadiativeSet
from lightweaver_tpu.context import Context
from lightweaver_tpu.fal import Falc82
from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom
from lightweaver_tpu.utils import InitialSolution


def _setup():
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
    return atmos, spect, eqPops


@pytest.mark.slow
def test_escape_prob_init_speeds_convergence():
    atmos, spect, eqPops = _setup()
    ctx = Context(atmos, spect, eqPops,
                  initSol=InitialSolution.EscapeProbability)
    nInit = np.asarray(ctx.popsState[0]['n'])
    nStar = np.asarray(ctx.popsState[0]['nStar'])
    assert np.all(np.isfinite(nInit)) and np.all(nInit > 0)
    # populations conserve the total
    nTotal = np.asarray(eqPops.atomicPops['Ca'].nTotal)
    assert np.allclose(nInit.sum(axis=0), nTotal, rtol=1e-6)
    # the init departs from LTE in the chromosphere (NLTE overionisation /
    # depopulation of the metastable levels)
    assert np.abs(nInit / nStar - 1.0).max() > 0.05

    def iterate(ctx, NmaxIter=400):
        for it in range(NmaxIter):
            ju = ctx.formal_sol_gamma_matrices()
            if it < 3:
                continue
            pu = ctx.stat_equil()
            if float(ju.dJMax) < 5e-3 and pu.dPopsMax < 1e-3:
                return it + 1
        return NmaxIter

    nEsc = iterate(ctx)
    atmos2, spect2, eqPops2 = _setup()
    ctx2 = Context(atmos2, spect2, eqPops2)
    nLte = iterate(ctx2)
    assert nEsc <= nLte + 10, (nEsc, nLte)
