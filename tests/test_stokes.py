"""Full-Stokes Zeeman synthesis.

Physics oracles: B->0 reduces to the scalar solution with zero
polarisation; a longitudinal field gives an antisymmetric V signal and
no Q/U; a transverse field gives Q and no V.
"""
import numpy as np
import pytest

from lightweaver_tpu.atmosphere import Atmosphere
from lightweaver_tpu.atomic_set import RadiativeSet
from lightweaver_tpu.context import Context
from lightweaver_tpu.fal import Falc82
from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom


def _ctx(B=None, gammaB=None, chiB=None, nDepth=30):
    full = Falc82()
    idx = np.unique(np.linspace(0, 81, nDepth).astype(int))
    Nk = len(idx)
    kwargs = {}
    if B is not None:
        kwargs = dict(B=np.full(Nk, B), gammaB=np.full(Nk, gammaB),
                      chiB=np.full(Nk, chiB))
    atmos = Atmosphere(height=full.height[idx],
                       temperature=full.temperature[idx],
                       vlos=full.vlos[idx], vturb=full.vturb[idx],
                       ne=full.ne[idx], nHTot=full.nHTot[idx], **kwargs)
    atmos.quadrature(3)
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    ctx = Context(atmos, spect, eqPops)
    for it in range(40):
        ctx.formal_sol_gamma_matrices()
        if it >= 3:
            ctx.stat_equil()
    return ctx


@pytest.fixture(scope='module')
def scalarI():
    ctx = _ctx()
    ctx.formal_sol()
    return np.asarray(ctx.I), np.asarray(ctx.spect.wavelength)


@pytest.mark.slow
def test_weak_field_limit(scalarI):
    Iref, lam = scalarI
    ctx = _ctx(B=1e-4, gammaB=0.3, chiB=0.2)    # 1 gauss: negligible
    ctx.single_stokes_fs()
    I = np.asarray(ctx.I)
    Quv = np.asarray(ctx.Quv)
    assert np.allclose(I, Iref, rtol=2e-3)
    assert np.abs(Quv).max() < 1e-4 * np.abs(I).max()


@pytest.mark.slow
def test_longitudinal_field(scalarI):
    """Vertical 1.5 kG field seen along a vertical ray: pure sigma+/-
    splitting -> antisymmetric V, no linear polarisation."""
    _, lamFull = scalarI
    ctx = _ctx(B=0.15, gammaB=0.0, chiB=0.0)
    lam = np.linspace(853.9, 855.0, 161)
    IQUV = ctx.compute_rays(wavelengths=lam, mus=[1.0], stokes=True)
    I, Q, U, V = IQUV[:, :, 0]
    core = np.argmin(np.abs(lam - 854.44))
    # cos(gamma) = 1, sin^2(gamma) = 0: no linear polarisation
    assert np.abs(Q).max() < 1e-8 * I.max()
    assert np.abs(U).max() < 1e-8 * I.max()
    # circular polarisation present and antisymmetric about the core
    assert np.abs(V).max() > 1e-4 * I[core]
    asym = abs(V.sum()) / np.abs(V).sum()
    assert asym < 0.2, asym


@pytest.mark.slow
def test_transverse_field(scalarI):
    """Horizontal field seen along a vertical ray: cos(gamma) = 0 -> no V,
    linear polarisation Q with the pi/sigma pattern."""
    _, lamFull = scalarI
    ctx = _ctx(B=0.15, gammaB=np.pi / 2, chiB=0.0)
    lam = np.linspace(853.9, 855.0, 161)
    IQUV = ctx.compute_rays(wavelengths=lam, mus=[1.0], stokes=True)
    I, Q, U, V = IQUV[:, :, 0]
    core = np.argmin(np.abs(lam - 854.44))
    assert np.abs(V).max() < 1e-8 * I.max()
    assert np.abs(Q).max() > 1e-5 * I[core]
    # chiB = 0: U vanishes (sin 2chi = 0)
    assert np.abs(U).max() < 1e-8 * I.max()


@pytest.mark.slow
def test_j20_scattering_polarisation():
    """J^2_0 anisotropic-scattering tensor (ref FormalStokes.cpp:418-486):
    lambda-iterating single_stokes_fs(J20=True, updateJ=True) must
    converge, leave J20/J ~ 0 deep in the atmosphere (isotropic
    radiation), give J20 > 0 at the surface (outward-peaked field), and
    imprint a Q signal absent without J20."""
    ctx = _ctx(B=1e-4, gammaB=0.3, chiB=0.2, nDepth=25)

    ctx.single_stokes_fs(updateJ=False)
    Quv0 = np.asarray(ctx.Quv).copy()

    changes = []
    prev = None
    for _ in range(8):
        ctx.single_stokes_fs(updateJ=True, J20=True)
        cur = np.asarray(ctx.J20)
        if prev is not None:
            denom = np.abs(cur).max()
            changes.append(np.abs(cur - prev).max() / denom)
        prev = cur
    assert np.all(np.isfinite(cur))
    # lambda iteration on the scattering term contracts
    assert changes[-1] < changes[0]
    assert changes[-1] < 1e-2, changes

    J = np.asarray(ctx.J)
    ratio = np.abs(cur) / np.maximum(np.abs(J), 1e-300)
    # continuum rows: far more anisotropy at the surface than at depth
    assert np.median(ratio[:, 0]) > 10 * np.median(ratio[:, -1])
    # outward-peaked continuum field: J20 > 0 at the surface away from
    # the line cores (strong-line cores can legitimately flip sign;
    # the Ca II H&K cores here do).  Check the strongest-signal row and
    # the significant-row majority.
    s = cur[:, 0]
    assert s[np.argmax(np.abs(s))] > 0
    sig = np.abs(s) > 1e-3 * np.abs(s).max()
    assert sig.any()
    assert (s[sig] > 0).mean() > 0.7

    # the scattering term sources additional linear polarisation; only a
    # tiny fraction leaks into V (magneto-optical rotation of the added
    # Q through the 4x4 propagation matrix)
    Quv1 = np.asarray(ctx.Quv)
    dQ = np.abs(Quv1[0] - Quv0[0]).max()
    assert dQ > 0
    assert np.abs(Quv1[2] - Quv0[2]).max() < 1e-2 * dQ
