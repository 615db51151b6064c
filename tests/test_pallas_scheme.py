"""XLA vs Pallas iteration-scheme numerical identity.

The reference validates its SIMD iteration-scheme plugins by their
interchangeability with the scalar scheme (SURVEY §4); here the fused
Mosaic Gamma/rate kernel ('mali_full_precond_pallas', run in Pallas
interpreter mode off-TPU) must reproduce the XLA scheme's Gamma, rates,
J and emergent intensity on the same params pytree.
"""
import dataclasses

import numpy as np
import pytest

import jax

from lightweaver_tpu.atmosphere import Atmosphere
from lightweaver_tpu.atomic_set import RadiativeSet
from lightweaver_tpu.context import Context, build_iteration_fn
from lightweaver_tpu.fal import Falc82
from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom


def _build_ctx(active=('H', 'Ca'), Nk=24, **kw):
    full = Falc82()
    idx = np.unique(np.linspace(0, 81, Nk).astype(int))
    atmos = Atmosphere(height=full.height[idx],
                       temperature=full.temperature[idx],
                       vlos=full.vlos[idx], vturb=full.vturb[idx],
                       ne=full.ne[idx], nHTot=full.nHTot[idx])
    atmos.quadrature(3)
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active(*active)
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    return Context(atmos, spect, eqPops, **kw)


def _scaled_close(a, b, tol):
    a, b = np.asarray(a), np.asarray(b)
    scale = np.max(np.abs(b))
    np.testing.assert_allclose(a / scale, b / scale, atol=tol, rtol=0)


def _compare_schemes(ctx, tol):
    # a few MALI steps so populations/J are non-trivial
    for _ in range(3):
        ctx.formal_sol_gamma_matrices()
        ctx.stat_equil()
    ctx.formal_sol_gamma_matrices()
    params = dict(ctx._params)

    outs = {}
    for scheme in ('mali_full_precond', 'mali_full_precond_pallas'):
        cfg = dataclasses.replace(ctx.cfg, fsIterScheme=scheme)
        it = jax.jit(build_iteration_fn(cfg))
        outs[scheme] = it(params)
    x, p = outs['mali_full_precond'], outs['mali_full_precond_pallas']
    _scaled_close(p['J'], x['J'], tol)
    _scaled_close(p['I'], x['I'], tol)
    np.testing.assert_allclose(float(p['dJ']), float(x['dJ']), rtol=1e-6)
    for ai in range(len(x['Gamma'])):
        _scaled_close(p['Gamma'][ai], x['Gamma'][ai], tol)
        for ti in range(len(x['Rij'][ai])):
            _scaled_close(p['Rij'][ai][ti], x['Rij'][ai][ti], tol)
            _scaled_close(p['Rji'][ai][ti], x['Rji'][ai][ti], tol)


@pytest.mark.slow
def test_pallas_scheme_matches_xla_f64():
    _compare_schemes(_build_ctx(), tol=5e-13)


@pytest.mark.slow
def test_pallas_scheme_matches_xla_f32_state():
    """Mixed precision (f32 state + f64 accumDtype): the kernel's
    in-block partial sums are f32 (Mosaic has no f64 vectors) over only
    BW*Nmu*2 ~ 100 terms, with the inter-block lambda reduction in f64
    -- so it must track the XLA scheme (f32 integrand, f64 sums) to a
    few times f32 epsilon, scaled."""
    import jax.numpy as jnp
    _compare_schemes(_build_ctx(dtype=jnp.float32), tol=2e-5)


@pytest.mark.slow
def test_pallas_scheme_converges_f32_state():
    """f32-state convergence floor under the Pallas scheme.

    Plain f32 stalls at dJ ~ 1e-2 (CLAUDE.md); the mixed-precision
    mechanisms (f64 lambda-reductions + compensated Ieff) push the
    floor well below that.  The Pallas kernel's in-block partials are
    f32 (Mosaic has no f64 vectors), which raises the observed dJ floor
    slightly (~8e-3 vs ~4e-3 for XLA on this decimated FAL-C) but
    leaves the dPops floor -- the reference's actual convergence
    criterion -- untouched: both schemes reach dPops < 1e-3 and agree
    on the converged populations."""
    import jax.numpy as jnp
    ctxX = _build_ctx(active=('Ca',), dtype=jnp.float32)
    ctxP = _build_ctx(active=('Ca',), dtype=jnp.float32,
                      fsIterScheme='mali_full_precond_pallas')

    def run(ctx):
        for it in range(400):
            ju = ctx.formal_sol_gamma_matrices()
            if it < 3:
                continue
            pu = ctx.stat_equil()
            if float(ju.dJMax) < 1e-2 and pu.dPopsMax < 1e-3:
                return it
        raise AssertionError('no convergence')

    run(ctxX)
    run(ctxP)
    # per-step scheme agreement is pinned at ~2e-5 by the identity test;
    # here the two runs stop at different points on the f32 noise floor,
    # so converged pops agree only to the floor itself (~dPops tol)
    np.testing.assert_allclose(np.asarray(ctxP.popsState[0]['n']),
                               np.asarray(ctxX.popsState[0]['n']),
                               rtol=5e-3)


@pytest.mark.slow
def test_pallas_scheme_matches_xla_prd():
    """Angle-averaged PRD: the rho factor rides through the kernel."""
    ctx = _build_ctx(active=('H',))
    for _ in range(3):
        ctx.formal_sol_gamma_matrices()
        ctx.stat_equil()
        ctx.prd_redistribute()
    _compare_schemes(ctx, tol=5e-13)


def test_pallas_scheme_selection_api():
    ctx = _build_ctx(Nk=12)
    assert ctx.get_fs_iter_scheme_properties()['name'] \
        == 'mali_full_precond'
    ctx.set_fs_iter_scheme('mali_full_precond_pallas')
    assert ctx.get_fs_iter_scheme_properties()['name'] \
        == 'mali_full_precond_pallas'
    ctx.set_fs_iter_scheme('mali_full_precond_AVX512')   # ref alias
    assert ctx.get_fs_iter_scheme_properties()['name'] \
        == 'mali_full_precond'
    with pytest.raises(ValueError, match='Unknown iteration scheme'):
        ctx.set_fs_iter_scheme('nonsense')


@pytest.mark.slow
def test_pallas_scheme_converges():
    """End-to-end: the Pallas scheme drives FAL-C Ca II to the same
    converged populations as the XLA scheme."""
    ctxX = _build_ctx(active=('Ca',))
    ctxP = _build_ctx(active=('Ca',),
                      fsIterScheme='mali_full_precond_pallas')

    def run(ctx):
        for it in range(300):
            ju = ctx.formal_sol_gamma_matrices()
            if it < 3:
                continue
            pu = ctx.stat_equil()
            if float(ju.dJMax) < 5e-3 and pu.dPopsMax < 1e-3:
                return it
        raise AssertionError('no convergence')

    nX, nP = run(ctxX), run(ctxP)
    assert nX == nP
    np.testing.assert_allclose(np.asarray(ctxP.popsState[0]['n']),
                               np.asarray(ctxX.popsState[0]['n']),
                               rtol=1e-10)
