"""Time-dependent population updates (backward Euler).

Oracles: (1) with Gamma fixed, repeated implicit steps relax perturbed
populations to the statistical-equilibrium solution while conserving the
total number density; (2) one small step changes populations by ~dt *
Gamma n; (3) rollback restores the previous state.
"""
import numpy as np
import pytest

from lightweaver_tpu.atmosphere import Atmosphere
from lightweaver_tpu.atomic_set import RadiativeSet
from lightweaver_tpu.context import Context
from lightweaver_tpu.fal import Falc82
from lightweaver_tpu.rh_atoms import H_6_atom


@pytest.fixture(scope='module')
def ctx():
    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 25).astype(int))
    atmos = Atmosphere(height=full.height[idx],
                       temperature=full.temperature[idx],
                       vlos=full.vlos[idx], vturb=full.vturb[idx],
                       ne=full.ne[idx], nHTot=full.nHTot[idx])
    atmos.quadrature(3)
    rs = RadiativeSet([H_6_atom()])
    rs.set_active('H')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    c = Context(atmos, spect, eqPops)
    for it in range(120):
        ju = c.formal_sol_gamma_matrices()
        if it < 3:
            continue
        pu = c.stat_equil()
        if float(ju.dJMax) < 5e-3 and pu.dPopsMax < 1e-3:
            break
    return c


@pytest.mark.slow
def test_relaxation_to_equilibrium(ctx):
    import jax.numpy as jnp
    nEq = np.asarray(ctx.popsState[0]['n']).copy()
    # perturb: move 20% of the ground level into level 1
    nPert = nEq.copy()
    nPert[1] += 0.2 * nPert[0]
    nPert[0] *= 0.8
    ctx.popsState[0]['n'] = jnp.asarray(nPert, ctx.dtype)
    ctx.formal_sol_gamma_matrices()

    # increasing steps: the top of the atmosphere has recombination
    # timescales of hours, so relax through to large dt (backward Euler
    # is unconditionally stable)
    prevState = None
    for step in range(140):
        dt = min(1.0 * 2.0 ** step, 1e6)
        upd, prevState = ctx.time_dep_update(dt, None)
        ctx.formal_sol_gamma_matrices()
    nFinal = np.asarray(ctx.popsState[0]['n'])
    # conservation (limited by the conditioning of I - dt*Gamma
    # at dt*Gamma ~ 1e14)
    assert np.allclose(nFinal.sum(axis=0), nEq.sum(axis=0), rtol=2e-3)
    # relaxed back towards the stat-eq solution
    assert np.abs(nFinal / nEq - 1.0).max() < 0.05
    ctx.popsState[0]['n'] = jnp.asarray(nEq, ctx.dtype)
    ctx.formal_sol_gamma_matrices()


@pytest.mark.slow
def test_small_step_euler_consistency(ctx):
    import jax.numpy as jnp
    nEq = np.asarray(ctx.popsState[0]['n']).copy()
    nPert = nEq.copy()
    nPert[1] += 0.1 * nPert[0]
    nPert[0] *= 0.9
    ctx.popsState[0]['n'] = jnp.asarray(nPert, ctx.dtype)
    ctx.formal_sol_gamma_matrices()
    G = np.asarray(ctx._Gamma[0])

    dt = 1e-6       # much shorter than any rate timescale at depth? no --
    # rates reach 1e8 s^-1; pick dt so dt*Gamma is a small correction
    dt = 1e-14
    upd, prev = ctx.time_dep_update(dt, None)
    nNew = np.asarray(ctx.popsState[0]['n'])
    expected = nPert + dt * np.einsum('ijk,jk->ik', G, nPert)
    assert np.allclose(nNew, expected, rtol=1e-4)

    # rollback restores the pre-step populations
    ctx.time_dep_restore_prev_pops(prev)
    assert np.allclose(np.asarray(ctx.popsState[0]['n']), nPert)
    ctx.popsState[0]['n'] = jnp.asarray(nEq, ctx.dtype)
