"""Numerical failures raise typed exceptions instead of silently
propagating NaN (ref: LuSolve.cpp:23 throws on a singular pivot;
utils.py:111-117 defines the exception types)."""
import numpy as np
import pytest

from lightweaver_tpu.atmosphere import Atmosphere
from lightweaver_tpu.atomic_set import RadiativeSet
from lightweaver_tpu.context import Context
from lightweaver_tpu.fal import Falc82
from lightweaver_tpu.iterate_ctx import iterate_ctx_se
from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom
from lightweaver_tpu.utils import ConvergenceError, ExplodingMatrixError


def _small_ctx():
    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 12).astype(int))
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


def test_singular_gamma_raises_exploding_matrix():
    import jax.numpy as jnp
    ctx = _small_ctx()
    ctx.formal_sol_gamma_matrices()
    # sabotage Gamma: a singular system (zero matrix leaves Nl-1 zero
    # rows after the conservation-row replacement)
    ctx._Gamma[0] = jnp.zeros_like(ctx._Gamma[0])
    with pytest.raises(ExplodingMatrixError):
        ctx.stat_equil()


def test_non_convergence_raises_when_asked():
    ctx = _small_ctx()
    with pytest.raises(ConvergenceError):
        iterate_ctx_se(ctx, NmaxIter=5, quiet=True,
                       raiseOnUnconverged=True)


def test_non_convergence_returns_by_default():
    ctx = _small_ctx()
    nIter = iterate_ctx_se(ctx, NmaxIter=5, quiet=True)
    assert nIter == 5
