"""Oracle test: the batched jitted MALI step must reproduce a literal
per-wavelength numpy transcription of the reference algorithm."""
import jax.numpy as jnp
import numpy as np
import pytest

from lightweaver_tpu.atomic_set import RadiativeSet
from lightweaver_tpu.context import Context
from lightweaver_tpu.fal import Falc82
from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom
from tests.reference_impl import gamma_matrices_ref


def small_falc(n=24):
    """Coarsened FAL-C to keep the oracle loops fast."""
    atmos = Falc82()
    idx = np.unique(np.linspace(0, 81, n).astype(int))
    from lightweaver_tpu.atmosphere import Atmosphere
    sub = Atmosphere(height=atmos.height[idx],
                     temperature=atmos.temperature[idx],
                     vlos=atmos.vlos[idx], vturb=atmos.vturb[idx],
                     ne=atmos.ne[idx], nHTot=atmos.nHTot[idx])
    sub.quadrature(3)
    return sub


@pytest.fixture(scope='module', params=['Ca', 'HCa'])
def ctx_pair(request):
    atmos = small_falc()
    if request.param == 'Ca':
        rs = RadiativeSet([H_6_atom(), CaII_atom()])
        rs.set_active('Ca')
    else:
        rs = RadiativeSet([H_6_atom(), CaII_atom()])
        rs.set_active('H', 'Ca')
    spect = rs.compute_wavelength_grid()
    eq = rs.compute_eq_pops(atmos)
    ctx = Context(atmos, spect, eq, formalSolver='piecewise_linear_1d')
    return ctx


@pytest.mark.parametrize('lambdaIterate', [True, False])
def test_gamma_matches_reference_transcription(ctx_pair, lambdaIterate):
    ctx = ctx_pair
    # run the oracle BEFORE the ctx call (ctx mutates J)
    J_ref, I_ref, Gamma_ref, dJ_ref = gamma_matrices_ref(
        ctx, lambdaIterate=lambdaIterate)
    upd = ctx.formal_sol_gamma_matrices(lambdaIterate=lambdaIterate)

    np.testing.assert_allclose(np.asarray(ctx.J), J_ref, rtol=1e-8,
                               atol=1e-30)
    np.testing.assert_allclose(np.asarray(ctx.I), I_ref, rtol=1e-8,
                               atol=1e-30)
    for ai in range(len(ctx.activeAtoms)):
        G = np.asarray(ctx._Gamma[ai])
        np.testing.assert_allclose(G, Gamma_ref[ai], rtol=1e-6,
                                   atol=np.abs(Gamma_ref[ai]).max() * 1e-9)
    # reset J for next param
    ctx.J = jnp.zeros_like(ctx.J)
