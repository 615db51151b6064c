import numpy as np
import pytest

from lightweaver_tpu import constants as C
from lightweaver_tpu.atomic_set import RadiativeSet, lte_pops
from lightweaver_tpu.atomic_table import (DefaultAtomicAbundance, KuruczPfTable,
                                          PeriodicTable)
from lightweaver_tpu.fal import Falc82
from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom


def test_periodic_table():
    assert PeriodicTable['H'].Z == 1
    assert PeriodicTable[20].name == 'Ca'
    assert abs(PeriodicTable['Fe'].mass - 55.845) < 1e-3


def test_abundance():
    ab = DefaultAtomicAbundance
    assert ab['H'] == 1.0
    assert abs(ab['He'] - 10 ** (10.93 - 12)) < 1e-6
    assert 1.3 < ab.massPerH < 1.5


def test_lte_pops_vs_direct_saha_boltzmann():
    # Two-level atom without Debye: n1/n0 = g1/g0 exp(-dE/kT); ion stage
    # follows Saha.
    H = H_6_atom()
    T = np.array([6000.0, 8000.0])
    ne = np.array([1e19, 1e20])
    nTot = np.array([1e20, 1e21])
    nStar = lte_pops(H, T, ne, nTot, debye=False)
    E = np.array([l.E_SI for l in H.levels])
    g = np.array([l.g for l in H.levels])
    # Boltzmann ratio level1/level0
    expected = g[1] / g[0] * np.exp(-(E[1] - E[0]) / (C.KBoltzmann * T))
    np.testing.assert_allclose(nStar[1] / nStar[0], expected, rtol=1e-10)
    # Saha ratio for the continuum
    c1 = C.HPlanck / (2 * np.pi * C.MElectron) * C.HPlanck / C.KBoltzmann
    saha = (g[5] / g[0] * np.exp(-(E[5] - E[0]) / (C.KBoltzmann * T))
            / (0.5 * ne * (c1 / T) ** 1.5))
    np.testing.assert_allclose(nStar[5] / nStar[0], saha, rtol=1e-10)
    np.testing.assert_allclose(nStar.sum(axis=0), nTot, rtol=1e-12)


def test_falc82_structure():
    atmos = Falc82()
    assert atmos.Nspace == 82
    assert atmos.temperature[0] == 100000.0
    assert abs(atmos.temperature.min() - 4400.0) < 200.0
    # height decreasing, ~2.2 Mm total extent
    assert np.all(np.diff(atmos.height) < 0)
    assert 2.0e6 < atmos.height[0] - atmos.height[-1] < 2.6e6


def test_quadrature_weights():
    atmos = Falc82()
    atmos.quadrature(5)
    assert atmos.Nrays == 5
    np.testing.assert_allclose(atmos.wmu.sum(), 1.0, rtol=1e-12)
    assert np.all(atmos.muz > 0) and np.all(atmos.muz < 1)


def test_wavelength_grid_windows():
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('H', 'Ca')
    spect = rs.compute_wavelength_grid()
    grid = spect.wavelength
    assert np.all(np.diff(grid) > 0)
    # 500nm reference is present
    assert np.any(np.isclose(grid, 500.0))
    # Each transition window brackets its own grid
    for ident, tg in spect.transWavelengths.items():
        b, r = spect.blueIdx[ident], spect.redIdx[ident]
        np.testing.assert_array_equal(grid[b:r], tg)


def test_line_einstein_relations():
    Ca = CaII_atom()
    K = Ca.lines[1]   # K line
    assert abs(K.lambda0 - 393.48) < 0.05
    # B ratios follow statistical weights
    np.testing.assert_allclose(K.Bij / K.Bji, K.jLevel.g / K.iLevel.g,
                               rtol=1e-12)
    # A consistent with f: A = 6.67e13 * gi/gj * f / lambda_nm^2  (approx)
    A_approx = 6.6702e13 * (K.iLevel.g / K.jLevel.g) * K.f / K.lambda0 ** 2
    np.testing.assert_allclose(K.Aji, A_approx, rtol=1e-3)


def test_kurucz_pf():
    pf = KuruczPfTable()
    ca = pf['Ca']
    # Ionisation potential of Ca I is 6.11 eV
    assert abs(ca.ionPot[0] / C.EV - 6.11) < 0.05
    assert abs(ca.ionPot[1] / C.EV - 11.87) < 0.1


def test_hminus_pops_magnitude():
    atmos = Falc82()
    rs = RadiativeSet([H_6_atom()])
    rs.set_active('H')
    eqPops = rs.compute_eq_pops(atmos)
    # H- fraction peaks ~1e-8..1e-7 of H in the photosphere
    frac = eqPops.HminPops / eqPops['H'].sum(axis=0)
    assert 1e-9 < frac.max() < 1e-5


def test_collisional_rates_lte_consistency():
    # With Cij built from detailed balance, C should satisfy
    # C[j,i]*nStar_i ~= C[i,j]*nStar_j for two-body processes.
    atmos = Falc82()
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('Ca')
    eqPops = rs.compute_eq_pops(atmos)
    Ca = rs['Ca']
    Nl = len(Ca.levels)
    Cmat = np.zeros((Nl, Nl, atmos.Nspace))
    for col in Ca.collisions:
        col.compute_rates(atmos, eqPops, Cmat)
    nStar = eqPops.atomicPops['Ca'].nStar
    for i in range(Nl):
        for j in range(i + 1, Nl):
            up = Cmat[j, i] * nStar[i]
            down = Cmat[i, j] * nStar[j]
            mask = up > 0
            np.testing.assert_allclose(up[mask], down[mask], rtol=1e-8)
