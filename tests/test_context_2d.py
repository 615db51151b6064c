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


class _FixedXBc:
    """Callable x BC returning a fixed [Nlam, Nmu, 2, Nz] array."""

    def __init__(self, data):
        self.data = data

    def compute_bc(self, atmos, spect):
        return self.data


def test_2d_nonperiodic_callable_xbc_matches_periodic():
    """x-invariant slab: feeding the periodic solution's boundary-column
    intensity through callable x BCs must reproduce the periodic formal
    solution exactly at every column (the fixed-column chain propagates
    the same x-invariant values).
    ref: /root/reference/Source/FormalScalar2d.cpp:496-546"""
    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 18).astype(int))
    Nz = len(idx)
    Nx = 6
    x = np.arange(Nx) * 2e5        # narrow columns: slanted coupling

    def bc(a):
        return np.broadcast_to(a[:, None], (Nz, Nx)).copy()

    def mk(xLowerBc=None, xUpperBc=None):
        atmos = Atmosphere.make_2d(
            height=full.height[idx], x=x,
            temperature=bc(full.temperature[idx]),
            vx=np.zeros((Nz, Nx)), vz=bc(full.vlos[idx]),
            vturb=bc(full.vturb[idx]), ne=bc(full.ne[idx]),
            nHTot=bc(full.nHTot[idx]),
            xLowerBc=xLowerBc, xUpperBc=xUpperBc)
        atmos.quadrature(3)
        rs = _sets()
        spect = rs.compute_wavelength_grid()
        eqPops = rs.compute_eq_pops(atmos)
        return Context(atmos, spect, eqPops,
                       formalSolver='piecewise_besser_1d')

    ctxP = mk()
    assert ctxP.cfg.xPeriodic
    # slanted coupling actually present in this geometry
    assert any(g['axisZ'].any() for g in ctxP.cfg.geom2d.values())
    ctxP.depthData.fill = True
    ctxP.formal_sol_gamma_matrices()
    IP = np.asarray(ctxP.depthData.I)              # [Nlam, Nmu, 2, Nk]
    IP5 = IP.reshape(IP.shape[0], IP.shape[1], 2, Nz, Nx)
    assert np.allclose(IP5[..., 1:], IP5[..., :1], rtol=1e-10)

    bcData = IP5[..., 0]                           # [Nlam, Nmu, 2, Nz]
    ctxN = mk(xLowerBc=_FixedXBc(bcData), xUpperBc=_FixedXBc(bcData))
    assert not ctxN.cfg.xPeriodic
    ctxN.depthData.fill = True
    ctxN.formal_sol_gamma_matrices()
    IN = np.asarray(ctxN.depthData.I)
    assert np.allclose(IN, IP, rtol=1e-9), np.abs(IN / IP - 1).max()


@pytest.mark.slow
def test_2d_f32_converges_with_compensated_split():
    """2D mixed precision: the compensated IeffBase split in the 2D
    sweep must let an f32-state context converge to the standard
    tolerances (plain f32 I - Psi*S cancellation stalls at dJ ~1e-2)."""
    import jax.numpy as jnp

    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 20).astype(int))
    Nz = len(idx)
    Nx = 4
    x = np.arange(Nx) * 2e5

    def bc(a):
        return np.broadcast_to(a[:, None], (Nz, Nx)).copy()

    atmos = Atmosphere.make_2d(
        height=full.height[idx], x=x,
        temperature=bc(full.temperature[idx]),
        vx=np.zeros((Nz, Nx)), vz=bc(full.vlos[idx]),
        vturb=bc(full.vturb[idx]), ne=bc(full.ne[idx]),
        nHTot=bc(full.nHTot[idx]))
    atmos.quadrature(3)
    rs = _sets()
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    ctx = Context(atmos, spect, eqPops, dtype=jnp.float32)
    for it in range(300):
        ju = ctx.formal_sol_gamma_matrices()
        if it < 3:
            continue
        pu = ctx.stat_equil()
        if float(ju.dJMax) < 5e-3 and pu.dPopsMax < 1e-3:
            break
    assert it < 299, (float(ju.dJMax), pu.dPopsMax)
    n = np.asarray(ctx.popsState[0]['n'])
    assert np.all(np.isfinite(n)) and np.all(n > 0)


def test_2d_compute_rays():
    """compute_rays on a 2D atmosphere: clone onto a new mu set and
    return emergent [Nlam, Nmu, Nx] (ref LwMiddleLayer.pyx:3898-4003)."""
    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 15).astype(int))
    Nz, Nx = len(idx), 4
    x = np.arange(Nx) * 2e5

    def bc(a):
        return np.broadcast_to(a[:, None], (Nz, Nx)).copy()

    atmos = Atmosphere.make_2d(
        height=full.height[idx], x=x,
        temperature=bc(full.temperature[idx]), vx=np.zeros((Nz, Nx)),
        vz=bc(full.vlos[idx]), vturb=bc(full.vturb[idx]),
        ne=bc(full.ne[idx]), nHTot=bc(full.nHTot[idx]))
    atmos.quadrature(3)
    rs = _sets()
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    ctx = Context(atmos, spect, eqPops)
    for it in range(12):
        ctx.formal_sol_gamma_matrices()
        if it >= 3:
            ctx.stat_equil()
    Iray = ctx.compute_rays(mus=[0.7, 1.0])
    assert Iray.shape == (ctx.cfg.Nlam, 2, Nx)
    assert np.all(np.isfinite(Iray)) and np.all(Iray > 0)
