"""End-to-end NLTE convergence on FAL-C with physics assertions."""
import numpy as np
import pytest

from lightweaver_tpu.atomic_set import RadiativeSet
from lightweaver_tpu.context import Context
from lightweaver_tpu.fal import Falc82
from lightweaver_tpu.iterate_ctx import iterate_ctx_se
from lightweaver_tpu.ops.planck import planck_nu
from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom


@pytest.fixture(scope='module')
def converged_ca():
    atmos = Falc82()
    atmos.quadrature(5)
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    ctx = Context(atmos, spect, eqPops)
    nIter = iterate_ctx_se(ctx, NmaxIter=300, quiet=True)
    return ctx, nIter


def test_converges(converged_ca):
    ctx, nIter = converged_ca
    assert nIter < 300


def test_pops_positive_and_conserved(converged_ca):
    ctx, _ = converged_ca
    n = np.asarray(ctx.popsState[0]['n'])
    assert np.all(n > 0)
    nTotal = ctx.eqPops.atomicPops['Ca'].nTotal
    np.testing.assert_allclose(n.sum(axis=0), nTotal, rtol=1e-8)


def test_gamma_stat_eq_residual(converged_ca):
    # Converged pops satisfy Gamma n = 0 (excluding the conservation row).
    ctx, _ = converged_ca
    G = np.asarray(ctx._Gamma[0])
    n = np.asarray(ctx.popsState[0]['n'])
    rate = np.einsum('ijk,jk->ik', G, n)
    outflow = np.abs(np.einsum('iik->ik', G * np.eye(G.shape[0])[:, :, None])
                     * n)
    rel = np.abs(rate) / np.maximum(outflow, 1e-300)
    assert rel.max() < 5e-2


def test_caii_k_line_in_absorption(converged_ca):
    # Emergent disk-centre intensity: K line core must be far below the
    # neighbouring continuum.
    ctx, _ = converged_ca
    lam = np.asarray(ctx.spect.wavelength)
    I = np.asarray(ctx.I)       # [Nlam, Nmu]
    mu_idx = np.argmax(np.asarray(ctx.atmos.muz))   # most vertical ray
    core = np.argmin(np.abs(lam - 393.48))
    cont = np.argmin(np.abs(lam - 500.0))
    assert I[core, mu_idx] < 0.3 * I[cont, mu_idx]
    assert I[core, mu_idx] > 0


def test_limb_darkening(converged_ca):
    # Continuum at 500 nm: I(mu~1) > I(mu small).
    ctx, _ = converged_ca
    lam = np.asarray(ctx.spect.wavelength)
    I = np.asarray(ctx.I)
    cont = np.argmin(np.abs(lam - 500.0))
    muz = np.asarray(ctx.atmos.muz)
    order = np.argsort(muz)
    assert I[cont, order[-1]] > I[cont, order[0]]


def test_continuum_intensity_reasonable(converged_ca):
    # Disk-centre 500 nm continuum should be within ~25% of B_nu at the
    # tau500=1 temperature (~6500 K in FAL-C).
    ctx, _ = converged_ca
    lam = np.asarray(ctx.spect.wavelength)
    I = np.asarray(ctx.I)
    mu_idx = np.argmax(np.asarray(ctx.atmos.muz))
    cont = np.argmin(np.abs(lam - 500.0))
    B = float(planck_nu(6520.0, 500.0))
    assert 0.75 * B < I[cont, mu_idx] < 1.25 * B


def test_nlte_departures(converged_ca):
    # Ca II ground level overpopulated relative to LTE in upper
    # chromosphere (scattering), departure coefficients ~O(1) at depth.
    ctx, _ = converged_ca
    n = np.asarray(ctx.popsState[0]['n'])
    nStar = np.asarray(ctx.popsState[0]['nStar'])
    b = n / nStar
    # Deep photosphere: LTE recovered
    np.testing.assert_allclose(b[:, -1], 1.0, atol=0.1)
    # Departures exist somewhere
    assert np.abs(b - 1.0).max() > 0.1
