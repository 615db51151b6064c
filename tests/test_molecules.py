"""Molecular models and chemical equilibrium."""
import numpy as np
import pytest

from lightweaver_tpu.atmosphere import Atmosphere
from lightweaver_tpu.atomic_set import RadiativeSet
from lightweaver_tpu.fal import Falc82
from lightweaver_tpu.molecule import MolecularTable
from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom


def test_molecular_table_loads():
    mt = MolecularTable.default()
    assert len(mt) >= 15
    for name in ('H2', 'CO', 'OH', 'CH', 'H2+', 'CN', 'TIO'):
        assert name in mt
    h2 = mt['H2']
    assert h2.Nnuclei == 2 and h2.charge == 0
    assert np.isclose(h2.Ediss / 1.60217733e-19, 4.478)


def test_equilibrium_constants_monotone():
    """Phi decreases with T (easier dissociation) and vanishes outside
    the formation range."""
    mt = MolecularTable.default(['H2', 'CO'])
    T = np.linspace(2000.0, 8000.0, 20)
    for m in mt:
        lo, hi = m.formationTempRange
        Tin = T[(T > lo) & (T < hi)]
        phi = m.equilibrium_constant(Tin)
        assert np.all(phi > 0)
        assert np.all(np.diff(phi) < 0)
        assert m.equilibrium_constant(np.array([hi * 1.5]))[0] == 0.0


def _falc(n=30):
    full = Falc82()
    idx = np.unique(np.linspace(0, 81, n).astype(int))
    return Atmosphere(height=full.height[idx],
                      temperature=full.temperature[idx],
                      vlos=full.vlos[idx], vturb=full.vturb[idx],
                      ne=full.ne[idx], nHTot=full.nHTot[idx])


def test_chemical_equilibrium_falc():
    atmos = _falc()
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    mols = MolecularTable.default(['H2', 'CO', 'OH', 'CH'])
    eqPops = rs.compute_eq_pops(atmos, mols=mols)
    nH2 = eqPops['H2']
    nH = eqPops['H'].sum(axis=0)
    assert np.all(np.isfinite(nH2)) and np.all(nH2 >= 0)
    frac = 2 * nH2 / (nH + 2 * nH2)
    # H2 fraction small but nonzero at the FAL-C temperature minimum
    assert 1e-5 < frac.max() < 0.05
    # molecules live near the temperature minimum, not the corona
    Tmin = int(np.argmin(atmos.temperature))
    assert abs(int(np.argmax(eqPops['CO'])) - Tmin) <= 3
    assert eqPops['CO'][0] == 0.0       # too hot at the top
    # nuclei conservation after rescaling: free + bound = abundance
    nC = eqPops.atomicPops['C'].nTotal if 'C' in eqPops.atomicPops else None


def test_background_with_molecules():
    atmos = _falc()
    atmos.quadrature(3)
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('Ca')
    spect = rs.compute_wavelength_grid()
    mols = MolecularTable.default(['H2', 'OH', 'CH'])
    eqPops = rs.compute_eq_pops(atmos, mols=mols)
    from lightweaver_tpu.background import basic_background
    bg = basic_background(spect, atmos, eqPops, rs)
    assert np.all(np.isfinite(bg.chi)) and np.all(bg.chi > 0)
    assert np.all(np.isfinite(bg.eta))

    eqPops0 = rs.compute_eq_pops(atmos)
    bg0 = basic_background(spect, atmos, eqPops0, rs)
    # chemical equilibrium rescales the free nuclei slightly (H bound in
    # H2), but molecular opacity sources appear on top
    assert np.all(bg.chi >= bg0.chi * (1 - 0.01))
    assert (bg.chi / bg0.chi).max() > 1.0 + 1e-8
