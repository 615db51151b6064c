"""User-callable boundary conditions.

Oracle: a callable lower BC returning the same Planck-extrapolated
intensities as ThermalisedRadiation reproduces the thermalised run;
doubling the incident intensity brightens the emergent continuum.
"""
import numpy as np
import pytest

from lightweaver_tpu.atmosphere import (Atmosphere, BoundaryCondition,
                                        ZeroRadiation)
from lightweaver_tpu.atomic_set import RadiativeSet
from lightweaver_tpu.context import Context
from lightweaver_tpu.fal import Falc82
from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom


class PlanckIncidentRadiation(BoundaryCondition):
    """I_incident = scale * B(T) per (wavelength, mu)."""

    def __init__(self, T, scale=1.0):
        self.T = T
        self.scale = scale

    def compute_bc(self, atmos, spect):
        from lightweaver_tpu.ops.planck import planck_nu
        lam = np.asarray(spect.wavelength)
        B = np.asarray(planck_nu(self.T, lam))
        return self.scale * np.broadcast_to(B[:, None],
                                            (len(lam), atmos.Nrays)).copy()


def _run(lowerBc=None, upperBc=None):
    from lightweaver_tpu.atmosphere import ThermalisedRadiation
    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 25).astype(int))
    atmos = Atmosphere(height=full.height[idx],
                       temperature=full.temperature[idx],
                       vlos=full.vlos[idx], vturb=full.vturb[idx],
                       ne=full.ne[idx], nHTot=full.nHTot[idx],
                       lowerBc=lowerBc or ThermalisedRadiation(),
                       upperBc=upperBc or ZeroRadiation())
    atmos.quadrature(3)
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    ctx = Context(atmos, spect, eqPops)
    for it in range(25):
        ctx.formal_sol_gamma_matrices()
        if it >= 3:
            ctx.stat_equil()
    return np.asarray(ctx.I), np.asarray(ctx.J), np.asarray(spect.wavelength)


@pytest.mark.slow
def test_callable_bc_lower_planck_matches_thermalised():
    """Incident B(T_bottom) at the lower boundary ~ the thermalised BC
    (which only adds a small gradient-extrapolation correction)."""
    full = Falc82()
    Ibc, _, lam = _run(lowerBc=PlanckIncidentRadiation(
        full.temperature[81]))
    Itherm, _, _ = _run()
    cont = np.argmin(np.abs(lam - 500.0))
    assert np.allclose(Ibc[cont], Itherm[cont], rtol=0.05)


@pytest.mark.slow
def test_callable_bc_irradiation_from_above():
    """Strong irradiation from above raises J in the upper atmosphere
    (the optically-thin layers see the incident field directly)."""
    Iref, Jref, lam = _run()
    Iirr, Jirr, _ = _run(upperBc=PlanckIncidentRadiation(8000.0))
    cont = np.argmin(np.abs(lam - 500.0))
    # J at the top increases strongly; deep J unchanged
    assert Jirr[cont, 0] > 2.0 * Jref[cont, 0]
    assert np.isclose(Jirr[cont, -1], Jref[cont, -1], rtol=1e-2)
