"""2D NLTE context: x-uniform slab equivalence with 1D.

With an atmosphere uniform in x and wide columns (all upwind points on
z-planes), the 2D MALI problem is exactly a set of identical 1D columns:
converged populations must be x-uniform and equal to a 1D run with the
same angular quadrature.
"""
import numpy as np
import pytest

from lightweaver_tpu.atmosphere import Atmosphere
from lightweaver_tpu.atomic_set import RadiativeSet
from lightweaver_tpu.context import Context
from lightweaver_tpu.fal import Falc82
from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom


def _sets():
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('Ca')
    return rs


@pytest.mark.slow
def test_2d_x_uniform_equals_1d():
    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 25).astype(int))
    Nz = len(idx)
    Nx = 6
    Lx = 1e8                       # very wide columns: tx > tz always
    x = np.arange(Nx) * Lx

    def bc(a):
        return np.broadcast_to(a[:, None], (Nz, Nx)).copy()

    atmos2 = Atmosphere.make_2d(
        height=full.height[idx], x=x,
        temperature=bc(full.temperature[idx]),
        vx=np.zeros((Nz, Nx)), vz=bc(full.vlos[idx]),
        vturb=bc(full.vturb[idx]), ne=bc(full.ne[idx]),
        nHTot=bc(full.nHTot[idx]))
    atmos2.quadrature(3)
    assert atmos2.Nrays == 6       # 3-ray set doubled over +-mux
    # all upwind intersections on z-planes for this geometry
    rs2 = _sets()
    spect2 = rs2.compute_wavelength_grid()
    eqPops2 = rs2.compute_eq_pops(atmos2)
    ctx2 = Context(atmos2, spect2, eqPops2,
                   formalSolver='piecewise_linear_1d')
    for g in ctx2.cfg.geom2d.values():
        assert not g['axisZ'].any()

    for it in range(400):
        ju2 = ctx2.formal_sol_gamma_matrices()
        if it < 3:
            continue
        pu2 = ctx2.stat_equil()
        if float(ju2.dJMax) < 5e-3 and pu2.dPopsMax < 1e-3:
            break
    assert it < 399, 'no 2D convergence'

    n2 = np.asarray(ctx2.popsState[0]['n']).reshape(-1, Nz, Nx)
    # x-uniformity of the converged populations
    for j in range(1, Nx):
        assert np.allclose(n2[:, :, j], n2[:, :, 0], rtol=1e-8)

    # matched 1D run: same |muz| set, pair weights summed
    atmos1 = Atmosphere(height=full.height[idx],
                        temperature=full.temperature[idx],
                        vlos=full.vlos[idx], vturb=full.vturb[idx],
                        ne=full.ne[idx], nHTot=full.nHTot[idx])
    nPair = atmos2.Nrays // 2
    atmos1.quadrature(mu=atmos2.muz[:nPair],
                      wmu=2.0 * atmos2.wmu[:nPair])
    rs1 = _sets()
    spect1 = rs1.compute_wavelength_grid()
    eqPops1 = rs1.compute_eq_pops(atmos1)
    ctx1 = Context(atmos1, spect1, eqPops1,
                   formalSolver='piecewise_linear_1d')
    for it in range(400):
        ju1 = ctx1.formal_sol_gamma_matrices()
        if it < 3:
            continue
        pu1 = ctx1.stat_equil()
        if float(ju1.dJMax) < 5e-3 and pu1.dPopsMax < 1e-3:
            break

    n1 = np.asarray(ctx1.popsState[0]['n'])
    assert np.allclose(n2[:, :, 0], n1, rtol=1e-4), (
        np.abs(n2[:, :, 0] / n1 - 1).max())


@pytest.mark.slow
def test_2d_horizontal_structure():
    """A hot column in an otherwise uniform slab: emergent intensity above
    the hot column is brighter; periodic neighbours feel it through the
    slanted rays."""
    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 25).astype(int))
    Nz = len(idx)
    Nx = 8
    x = np.arange(Nx) * 2e5        # narrow columns: slanted coupling

    def bc(a):
        return np.broadcast_to(a[:, None], (Nz, Nx)).copy()

    T = bc(full.temperature[idx])
    T[:, 3] *= 1.3                 # hot column
    atmos2 = Atmosphere.make_2d(
        height=full.height[idx], x=x, temperature=T,
        vx=np.zeros((Nz, Nx)), vz=bc(full.vlos[idx]),
        vturb=bc(full.vturb[idx]), ne=bc(full.ne[idx]),
        nHTot=bc(full.nHTot[idx]))
    atmos2.quadrature(3)
    rs2 = _sets()
    spect2 = rs2.compute_wavelength_grid()
    eqPops2 = rs2.compute_eq_pops(atmos2)
    ctx2 = Context(atmos2, spect2, eqPops2,
                   formalSolver='piecewise_linear_1d')
    for it in range(60):
        ctx2.formal_sol_gamma_matrices()
        if it >= 3:
            ctx2.stat_equil()
    I = np.asarray(ctx2.I)         # [Nlam, Nmu, Nx]
    assert np.all(np.isfinite(I)) and np.all(I > 0)
    lam = np.asarray(spect2.wavelength)
    cont = np.argmin(np.abs(lam - 500.0))
    mostVertical = int(np.argmax(np.asarray(atmos2.muz)))
    Icont = I[cont, mostVertical]
    # the hot column produces horizontal contrast in the emergent
    # continuum (displaced along the slanted ray direction)
    assert Icont.max() > 1.15 * Icont.min()
    # and the slanted-ray displacement differs between +mux and -mux rays
    muxArr = np.asarray(atmos2.mux)
    muzArr = np.asarray(atmos2.muz)
    partner = int(np.argmin(np.abs(muzArr - muzArr[mostVertical])
                            + np.abs(muxArr + muxArr[mostVertical])))
    Ipartner = I[cont, partner]
    assert int(np.argmax(Icont)) != int(np.argmax(Ipartner))
