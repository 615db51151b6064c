"""Newton-Raphson charge conservation (conserveCharge=True).

Physics oracle: FAL-C tabulates the NLTE electron density, so starting
from a perturbed ne and iterating H with charge conservation must drive
ne back towards the tabulated values (ref workflow:
/root/reference/examples/plot_SimpleLineTest.py cases 2/3).
"""
import numpy as np
import pytest

from lightweaver_tpu.atmosphere import Atmosphere
from lightweaver_tpu.atomic_set import RadiativeSet
from lightweaver_tpu.context import Context
from lightweaver_tpu.fal import Falc82
from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom


def _atmos(nDepth=30, neScale=1.0):
    full = Falc82()
    idx = np.unique(np.linspace(0, 81, nDepth).astype(int))
    return Atmosphere(height=full.height[idx],
                      temperature=full.temperature[idx],
                      vlos=full.vlos[idx], vturb=full.vturb[idx],
                      ne=full.ne[idx] * neScale, nHTot=full.nHTot[idx])


@pytest.mark.slow
def test_conserve_charge_restores_ne():
    # NOTE: only H+Ca are in the set, so metal electron donors are absent
    # and the achievable ne at the temperature minimum differs from FAL-C;
    # we perturb modestly and check the H-dominated deep photosphere.
    atmos = _atmos(neScale=1.05)     # 5% perturbed electron density
    neRef = _atmos(neScale=1.0).ne.copy()
    atmos.quadrature(3)
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('H')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    ctx = Context(atmos, spect, eqPops, conserveCharge=True)

    dNe = None
    for it in range(150):
        ju = ctx.formal_sol_gamma_matrices()
        if it < 3:
            continue
        pu = ctx.stat_equil()
        assert pu.updatedNe
        dNe = pu.dNeMax
        if float(ju.dJMax) < 5e-3 and pu.dPopsMax < 1e-3 and dNe < 1e-3:
            break
    assert dNe is not None and dNe < 1e-3, 'ne update did not settle'
    assert np.all(atmos.ne > 0)
    # In the deep photosphere H/metal LTE ionisation fixes ne: the 30%
    # perturbation must have been pulled back towards the FAL-C values.
    lower = slice(-4, None)
    relErr = np.abs(atmos.ne[lower] / neRef[lower] - 1.0)
    assert np.max(relErr) < 0.10, f'ne not restored: {relErr}'


def test_nr_solve_exact_on_linear_system():
    """With fixed Gamma, no continuum precondition and no dC terms the NR
    residual is linear in (n, ne): one Newton step must land exactly on
    the solution of {kinetic rows, particle conservation, charge row}."""
    import jax.numpy as jnp

    from lightweaver_tpu.nr_update import build_nr_fn

    rng = np.random.default_rng(7)
    Nl, Nk = 4, 9
    stages = np.array([0.0, 0.0, 1.0, 2.0])
    # random rate matrix with zero column sums (a valid Gamma)
    G = rng.uniform(0.1, 2.0, size=(Nl, Nl, Nk))
    for l in range(Nl):
        G[l, l] = 0.0
    G[np.arange(Nl), np.arange(Nl)] = -G.sum(axis=0)
    n = rng.uniform(0.5, 2.0, size=(Nl, Nk))
    nTotal = np.full(Nk, 10.0)
    ne = rng.uniform(1.0, 3.0, size=Nk)
    bgNe = rng.uniform(0.0, 1.0, size=Nk)

    fn = build_nr_fn([Nl], [stages], [[]], timeDep=False, dtype=jnp.float64)
    (nNew,), neNew = fn([jnp.asarray(G)], [jnp.asarray(n)],
                        [jnp.asarray(nTotal)], [jnp.asarray(np.zeros_like(G))],
                        None, jnp.asarray(ne), jnp.asarray(bgNe),
                        jnp.asarray(1.0))
    nNew = np.asarray(nNew)
    neNew = np.asarray(neNew)
    # kinetic rows (all but the conservation row)
    Gn = np.einsum('ijk,jk->ik', G, nNew)
    assert np.allclose(Gn[:Nl - 1], 0.0, atol=1e-8)
    # particle conservation
    assert np.allclose(nNew.sum(axis=0), nTotal, rtol=1e-12)
    # charge conservation
    assert np.allclose(neNew, np.einsum('l,lk->k', stages, nNew) + bgNe,
                       rtol=1e-12)


@pytest.mark.slow
def test_conserve_charge_full_species_set():
    """Regression: H+Ca active with the full 12-species background used
    to overshoot into negative ne / NaN (or period-2 cycles) under raw
    Newton; with step limiting it converges like the fixed-ne run."""
    from lightweaver_tpu.rh_atoms import (Al_atom, C_atom, Fe_atom, He_atom,
                                          MgII_atom, N_atom, NaI_atom,
                                          O_atom, S_atom, Si_atom)
    atmos = _atmos(nDepth=30)
    atmos.quadrature(3)
    rs = RadiativeSet([H_6_atom(), CaII_atom(), C_atom(), O_atom(),
                       Si_atom(), Al_atom(), Fe_atom(), He_atom(),
                       MgII_atom(), N_atom(), NaI_atom(), S_atom()])
    rs.set_active('H', 'Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    ctx = Context(atmos, spect, eqPops, conserveCharge=True)
    for it in range(250):
        ju = ctx.formal_sol_gamma_matrices()
        if it < 3:
            continue
        pu = ctx.stat_equil()
        assert np.isfinite(pu.dPopsMax), f'NaN at iteration {it}'
        if (float(ju.dJMax) < 5e-3 and pu.dPopsMax < 1e-3
                and pu.dNeMax < 1e-3):
            break
    assert it < 249
    assert np.all(atmos.ne > 0)
