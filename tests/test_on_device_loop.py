"""On-device MALI loop (lax.while_loop): matches the host-driven loop."""
import numpy as np
import pytest

from lightweaver_tpu.atmosphere import Atmosphere
from lightweaver_tpu.atomic_set import RadiativeSet
from lightweaver_tpu.context import Context
from lightweaver_tpu.fal import Falc82
from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom


def _setup():
    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 25).astype(int))
    atmos = Atmosphere(height=full.height[idx],
                       temperature=full.temperature[idx],
                       vlos=full.vlos[idx], vturb=full.vturb[idx],
                       ne=full.ne[idx], nHTot=full.nHTot[idx])
    atmos.quadrature(3)
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    return Context(atmos, spect, eqPops)


@pytest.mark.slow
def test_on_device_loop_converges_and_matches_host():
    ctx = _setup()
    nIter, dJ, dPops = ctx.iterate_on_device(NmaxIter=400)
    assert nIter < 400
    assert dJ < 5e-3 and dPops < 1e-3
    nDev = np.asarray(ctx.popsState[0]['n'])

    ctx2 = _setup()
    for it in range(400):
        ju = ctx2.formal_sol_gamma_matrices()
        if it < 3:
            continue
        pu = ctx2.stat_equil()
        if float(ju.dJMax) < 5e-3 and pu.dPopsMax < 1e-3:
            break
    nHost = np.asarray(ctx2.popsState[0]['n'])
    # same fixed point to within the convergence tolerance
    assert np.abs(nDev / nHost - 1.0).max() < 5e-3


@pytest.mark.slow
def test_on_device_ng_matches_host_ng():
    """On-device Ng (ring buffer + weighted LS inside the while_loop)
    reproduces the host Ng class: same iteration count and populations."""
    from lightweaver_tpu.ops.ng import NgOptions

    ng = NgOptions(Norder=2, Nperiod=5, Ndelay=8)

    ctxD = _setup()
    nIterDev, dJ, dPops = ctxD.iterate_on_device(NmaxIter=400, ngOptions=ng)
    assert dJ < 5e-3 and dPops < 1e-3
    nDev = np.asarray(ctxD.popsState[0]['n'])

    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 25).astype(int))
    atmos = Atmosphere(height=full.height[idx],
                       temperature=full.temperature[idx],
                       vlos=full.vlos[idx], vturb=full.vturb[idx],
                       ne=full.ne[idx], nHTot=full.nHTot[idx])
    atmos.quadrature(3)
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    ctxH = Context(atmos, spect, eqPops, ngOptions=ng)
    for it in range(400):
        ju = ctxH.formal_sol_gamma_matrices()
        if it < 3:
            continue
        pu = ctxH.stat_equil()
        if float(ju.dJMax) < 5e-3 and pu.dPopsMax < 1e-3:
            break
    nIterHost = it + 1
    nHost = np.asarray(ctxH.popsState[0]['n'])

    assert nIterDev == nIterHost
    np.testing.assert_allclose(nDev, nHost, rtol=1e-7)
    # Ng must actually help on this problem: fewer iterations than no-Ng
    ctx0 = _setup()
    nIterNoNg, _, _ = ctx0.iterate_on_device(NmaxIter=400)
    assert nIterDev < nIterNoNg


@pytest.mark.slow
def test_on_device_prd_matches_host_prd():
    """iterate_on_device(prd=True) runs the scattering integral + subset
    FS sub-iterations inside the compiled loop and lands on the host
    driver's PRD fixed point (same schedule, same tracking-only Ng)."""
    from lightweaver_tpu.iterate_ctx import iterate_ctx_se

    def setup_prd():
        full = Falc82()
        idx = np.unique(np.linspace(0, 81, 30).astype(int))
        atmos = Atmosphere(height=full.height[idx],
                           temperature=full.temperature[idx],
                           vlos=full.vlos[idx], vturb=full.vturb[idx],
                           ne=full.ne[idx], nHTot=full.nHTot[idx])
        atmos.quadrature(3)
        rs = RadiativeSet([H_6_atom()])
        rs.set_active('H')
        spect = rs.compute_wavelength_grid()
        eqPops = rs.compute_eq_pops(atmos)
        return Context(atmos, spect, eqPops, accelerateScattering=True)

    ctxD = setup_prd()
    nIterDev, dJ, dPops = ctxD.iterate_on_device(
        NmaxIter=300, prd=True, maxPrdSubIter=10, prdTol=2e-4)
    assert dJ < 5e-3 and dPops < 1e-3
    ai, ti, a, t = ctxD._prd_lines()[0]
    rhoDev = np.asarray(ctxD.rhoPrd[ai][ti])
    nDev = np.asarray(ctxD.popsState[0]['n'])
    assert np.all(np.isfinite(rhoDev)) and np.all(rhoDev > 0)
    assert np.abs(rhoDev - 1.0).max() > 0.1     # real PRD departure

    ctxH = setup_prd()
    nIterHost = iterate_ctx_se(ctxH, prd=True, NmaxIter=300, quiet=True,
                               maxPrdSubIter=10, prdIterTol=2e-4)
    rhoHost = np.asarray(ctxH.rhoPrd[ai][ti])
    nHost = np.asarray(ctxH.popsState[0]['n'])

    assert abs(nIterDev - nIterHost) <= 2, (nIterDev, nIterHost)
    assert np.abs(nDev / nHost - 1.0).max() < 5e-3
    assert np.abs(rhoDev - rhoHost).max() < 1e-3


@pytest.mark.slow
def test_on_device_hprd_matches_host():
    """The hPRD variant (JRest tracked through the compiled loop) lands
    on the host driver's fixed point under a velocity gradient."""
    from lightweaver_tpu.iterate_ctx import iterate_ctx_se

    def setup_hprd():
        full = Falc82()
        idx = np.unique(np.linspace(0, 81, 24).astype(int))
        v = 8e3 * np.linspace(0.0, 1.0, len(idx))[::-1]
        atmos = Atmosphere(height=full.height[idx],
                           temperature=full.temperature[idx],
                           vlos=v, vturb=full.vturb[idx],
                           ne=full.ne[idx], nHTot=full.nHTot[idx])
        atmos.quadrature(3)
        rs = RadiativeSet([H_6_atom()])
        rs.set_active('H')
        spect = rs.compute_wavelength_grid()
        eqPops = rs.compute_eq_pops(atmos)
        return Context(atmos, spect, eqPops, hprd=True,
                       accelerateScattering=True)

    ctxD = setup_hprd()
    assert ctxD.cfg.hprd
    nIterDev, dJ, dPops = ctxD.iterate_on_device(
        NmaxIter=300, prd=True, maxPrdSubIter=6, prdTol=1e-3)
    assert dJ < 5e-3 and dPops < 1e-3
    ai, ti, a, t = ctxD._prd_lines()[0]
    rhoDev = np.asarray(ctxD.rhoPrd[ai][ti])
    assert ctxD.JRest is not None
    assert np.all(np.isfinite(np.asarray(ctxD.JRest)))

    ctxH = setup_hprd()
    nIterHost = iterate_ctx_se(ctxH, prd=True, NmaxIter=300, quiet=True,
                               maxPrdSubIter=6, prdIterTol=1e-3)
    rhoHost = np.asarray(ctxH.rhoPrd[ai][ti])
    nHost = np.asarray(ctxH.popsState[0]['n'])
    nDev = np.asarray(ctxD.popsState[0]['n'])
    assert abs(nIterDev - nIterHost) <= 2, (nIterDev, nIterHost)
    assert np.abs(nDev / nHost - 1.0).max() < 5e-3
    assert np.abs(rhoDev - rhoHost).max() < 1e-3
