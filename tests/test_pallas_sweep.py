"""Fused Pallas depth-sweep formal solver vs the XLA solver.

The sweep kernel (ops/pallas_sweep.py, run in Pallas interpreter mode
off-TPU) evaluates the same Bezier-3 short-characteristics numerics as
ops/formal_solver.py (ref: /root/reference/Source/FormalScalar.cpp:
209-325) in one VMEM-resident pass; it must reproduce I, Psi and the
compensated IeffBase, and drive the full MALI iteration identically.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightweaver_tpu.ops.formal_solver import formal_sol_1d
from lightweaver_tpu.ops.pallas_sweep import formal_solve_sweep


def _smooth(x, w=9):
    k = np.ones(w) / w
    return np.apply_along_axis(lambda r: np.convolve(r, k, mode='same'),
                               -1, x)


@pytest.mark.slow
def test_sweep_matches_formal_sol_1d():
    rng = np.random.default_rng(0)
    NL, Nmu, Nk = 37, 3, 83
    h = np.sort(rng.uniform(0, 1e6, Nk))[::-1].copy()
    muz = np.array([0.11, 0.5, 0.887])
    chi = _smooth(10 ** rng.uniform(-8, -2, (NL, Nmu, 2, Nk)))
    S = _smooth(10 ** rng.uniform(-2, 2, (NL, Nmu, 2, Nk)))
    IupwD = rng.uniform(0, 1, (NL, Nmu))
    IupwU = rng.uniform(0, 1, (NL, Nmu))

    wmu = np.array([0.3, 0.4, 0.3])
    chi_j, S_j = jnp.asarray(chi), jnp.asarray(S)
    I, Psi, Ieffb, moments = formal_solve_sweep(
        chi_j, S_j, jnp.asarray(h), jnp.asarray(muz),
        jnp.asarray(IupwD), jnp.asarray(IupwU), wmu=jnp.asarray(wmu))

    # in-kernel angular moments match the host reduction
    w2 = 0.5 * wmu
    J = (np.asarray(moments['Jhi'][0]) + np.asarray(moments['Jlo'][0])
         + np.asarray(moments['Jhi'][1]) + np.asarray(moments['Jlo'][1]))
    Jref = (np.asarray(I) * w2[None, :, None, None]).sum(axis=(1, 2))
    np.testing.assert_allclose(J, Jref, rtol=1e-12)
    PsiBarRef = (np.asarray(Psi) * w2[None, :, None, None]).sum(axis=(1, 2))
    np.testing.assert_allclose(np.asarray(moments['PsiBar']), PsiBarRef,
                               rtol=1e-12)

    muzB = jnp.broadcast_to(jnp.asarray(muz)[None, :],
                            (NL, Nmu)).reshape(-1)
    for d, toObs, Iupw in ((0, False, IupwD), (1, True, IupwU)):
        c = chi_j[:, :, d].reshape(-1, Nk)
        s = S_j[:, :, d].reshape(-1, Nk)
        Ir, Pr, Er = formal_sol_1d(
            c, s, jnp.asarray(h), muzB, jnp.asarray(Iupw).reshape(-1),
            to_obs=toObs, method='piecewise_bezier3_1d', mode='scan')
        for name, a, b in (('I', I[:, :, d], Ir),
                           ('Psi', Psi[:, :, d], Pr),
                           ('Ieffb', Ieffb[:, :, d], Er)):
            a = np.asarray(a).reshape(-1, Nk)
            b = np.asarray(b).reshape(-1, Nk)
            scale = np.abs(b).max()
            err = np.abs(a - b).max() / scale
            assert err < 5e-12, (d, name, err)


@pytest.mark.slow
def test_sweep_recurrence_mode_in_context():
    """recurrenceMode='pallas' drives the full MALI iteration to the
    same populations as the XLA recurrence."""
    from lightweaver_tpu.atmosphere import Atmosphere
    from lightweaver_tpu.atomic_set import RadiativeSet
    from lightweaver_tpu.context import Context
    from lightweaver_tpu.fal import Falc82
    from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom

    def build(**kw):
        full = Falc82()
        idx = np.unique(np.linspace(0, 81, 24).astype(int))
        atmos = Atmosphere(height=full.height[idx],
                           temperature=full.temperature[idx],
                           vlos=full.vlos[idx], vturb=full.vturb[idx],
                           ne=full.ne[idx], nHTot=full.nHTot[idx])
        atmos.quadrature(3)
        rs = RadiativeSet([H_6_atom(), CaII_atom()])
        rs.set_active('H', 'Ca')
        spect = rs.compute_wavelength_grid()
        eqPops = rs.compute_eq_pops(atmos)
        return Context(atmos, spect, eqPops, **kw)

    ctxA = build()
    ctxB = build(recurrenceMode='pallas')
    for _ in range(4):
        ua = ctxA.formal_sol_gamma_matrices()
        ctxA.stat_equil()
        ub = ctxB.formal_sol_gamma_matrices()
        ctxB.stat_equil()
    np.testing.assert_allclose(float(ub.dJMax), float(ua.dJMax),
                               rtol=1e-9)
    for stA, stB in zip(ctxA.popsState, ctxB.popsState):
        np.testing.assert_allclose(np.asarray(stB['n']),
                                   np.asarray(stA['n']), rtol=1e-9)


def test_sweep_mode_validation():
    """recurrenceMode='pallas' rejects unsupported solver configs."""
    from lightweaver_tpu.atmosphere import Atmosphere
    from lightweaver_tpu.atomic_set import RadiativeSet
    from lightweaver_tpu.context import Context
    from lightweaver_tpu.fal import Falc82
    from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom

    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 12).astype(int))
    atmos = Atmosphere(height=full.height[idx],
                       temperature=full.temperature[idx],
                       vlos=full.vlos[idx], vturb=full.vturb[idx],
                       ne=full.ne[idx], nHTot=full.nHTot[idx])
    atmos.quadrature(2)
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    with pytest.raises(ValueError, match='pallas'):
        Context(atmos, spect, eqPops, recurrenceMode='pallas',
                formalSolver='piecewise_besser_1d')
