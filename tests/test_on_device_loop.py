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
