import numpy as np
import pytest

from lightweaver_tpu import constants as C
from lightweaver_tpu.atomic_set import RadiativeSet
from lightweaver_tpu.background import (basic_background, hminus_bf,
                                        hminus_ff, hydrogen_ff,
                                        thomson_scattering)
from lightweaver_tpu.fal import Falc82
from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom


@pytest.fixture(scope='module')
def falc_setup():
    atmos = Falc82()
    atmos.quadrature(5)
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('H', 'Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    bg = basic_background(spect, atmos, eqPops, rs)
    return atmos, rs, spect, eqPops, bg


def test_thomson():
    ne = np.array([1e20])
    sigma_T = 6.6524587e-29  # m^2
    np.testing.assert_allclose(thomson_scattering(ne)[0], ne[0] * sigma_T,
                               rtol=1e-5)


def test_hminus_bf_peak():
    # Geltman peak cross-section ~ 3.95e-21 m^2 near 850 nm, zero beyond
    # the 1641.9 nm photodetachment edge.
    lam = np.array([850.0, 1700.0])
    T = np.array([6000.0])
    nHm = np.array([1.0])
    chi, eta = hminus_bf(lam[:, None], T[None, :], nHm[None, :])
    kappa850 = chi[0, 0] / (1 - np.exp(-C.HC_K / 850.0 / 6000.0))
    assert abs(kappa850 - 3.95e-21) < 0.05e-21
    assert chi[1, 0] == 0.0


def test_background_positive(falc_setup):
    atmos, rs, spect, eqPops, bg = falc_setup
    assert np.all(bg.chi > 0)
    assert np.all(bg.eta >= 0)
    assert np.all(bg.sca > 0)
    assert np.all(np.isfinite(bg.chi + bg.eta + bg.sca))


def test_tau500_unity_in_photosphere(falc_setup):
    # Continuum tau500 = 1 should fall at T ~ 6400-6700 K in FAL-C.
    atmos, rs, spect, eqPops, bg = falc_setup
    la = np.argmin(np.abs(spect.wavelength - 500.0))
    chi = bg.chi[la]
    tau = np.concatenate([[0.0], np.cumsum(
        0.5 * (chi[1:] + chi[:-1]) * -np.diff(atmos.height))])
    Ttau1 = np.interp(1.0, tau, atmos.temperature)
    assert 6300.0 < Ttau1 < 6800.0


def test_background_lte_source_function(falc_setup):
    # Absorption part satisfies Kirchhoff: eta / (chi - sca) = B_nu.
    from lightweaver_tpu.ops.planck import planck_nu
    atmos, rs, spect, eqPops, bg = falc_setup
    la = np.argmin(np.abs(spect.wavelength - 500.0))
    k = 70
    S = bg.eta[la, k] / (bg.chi[la, k] - bg.sca[la, k])
    B = float(planck_nu(atmos.temperature[k], spect.wavelength[la]))
    np.testing.assert_allclose(S, B, rtol=2e-2)


def test_hydrogen_ff_scaling():
    # chi_ff ~ ne * np * lambda^3 (modulo Gaunt/stim)
    lam = np.array([1000.0])
    T = np.array([8000.0])
    c1 = hydrogen_ff(lam[:, None], T[None, :], np.array([[1e19]]),
                     np.array([[1e19]]))
    c2 = hydrogen_ff(lam[:, None], T[None, :], np.array([[2e19]]),
                     np.array([[1e19]]))
    np.testing.assert_allclose(c2 / c1, 2.0, rtol=1e-12)
