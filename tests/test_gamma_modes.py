"""gammaMode='dense' vs 'factored' numerical identity.

CLAUDE.md's architectural invariant: the factored Gamma path (continuum
transitions contracted against precomputed angular moments) must stay
numerically identical to the dense reference-shaped path.  This test
runs both iteration functions on the SAME params pytree — a few MALI
steps deep so populations/J are non-trivial — and compares Gamma, Rij,
Rji and J.  ref Gamma accumulation:
/root/reference/Source/SimdFullIterationTemplates.hpp:206-234.
"""
import numpy as np
import pytest


def _build_ctx(dtype=None):
    from lightweaver_tpu.atmosphere import Atmosphere
    from lightweaver_tpu.atomic_set import RadiativeSet
    from lightweaver_tpu.context import Context
    from lightweaver_tpu.fal import Falc82
    from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom

    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 24).astype(int))
    atmos = Atmosphere(height=full.height[idx],
                       temperature=full.temperature[idx],
                       vlos=full.vlos[idx], vturb=full.vturb[idx],
                       ne=full.ne[idx], nHTot=full.nHTot[idx])
    atmos.quadrature(3)
    # H active too: overlapping multi-transition windows exercise the
    # cross-term (chiLists/ULists) machinery of the factored path
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('H', 'Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    return Context(atmos, spect, eqPops, dtype=dtype)


def _run_both(ctx):
    import dataclasses

    import jax

    from lightweaver_tpu.context import build_iteration_fn

    # advance a few MALI steps so n/J are away from the LTE start
    for _ in range(3):
        ctx.formal_sol_gamma_matrices()
        ctx.stat_equil()
    ctx.formal_sol_gamma_matrices()
    params = dict(ctx._params)

    outs = {}
    for mode in ('factored', 'dense'):
        cfg = dataclasses.replace(ctx.cfg, gammaMode=mode)
        it = jax.jit(build_iteration_fn(cfg))
        outs[mode] = it(params)
    return outs


def _assert_scaled_close(a, b, tol):
    """Elementwise |a-b| <= tol * max|b|: rates/Gamma rows span many
    orders of magnitude and near-zero entries differ by summation order
    alone, so comparison is against the row scale."""
    a, b = np.asarray(a), np.asarray(b)
    scale = np.max(np.abs(b))
    np.testing.assert_allclose(a / scale, b / scale, atol=tol, rtol=0)


def _assert_outputs_match(outs, tol):
    f, d = outs['factored'], outs['dense']
    _assert_scaled_close(f['J'], d['J'], tol)
    for ai in range(len(f['Gamma'])):
        _assert_scaled_close(f['Gamma'][ai], d['Gamma'][ai], tol)
        for ti in range(len(f['Rij'][ai])):
            _assert_scaled_close(f['Rij'][ai][ti], d['Rij'][ai][ti], tol)
            _assert_scaled_close(f['Rji'][ai][ti], d['Rji'][ai][ti], tol)


@pytest.mark.slow
def test_dense_matches_factored_f64():
    outs = _run_both(_build_ctx())
    _assert_outputs_match(outs, tol=1e-12)


@pytest.mark.slow
def test_dense_matches_factored_f32_state():
    import jax.numpy as jnp
    # f32 windows + f64 accumulation: the two paths reorder the f32
    # angular/segment sums, so agreement is at the f32 noise floor
    # (measured ~6e-6 of row max on this problem)
    outs = _run_both(_build_ctx(dtype=jnp.float32))
    _assert_outputs_match(outs, tol=3e-5)
