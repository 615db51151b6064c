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


def test_molecule_file_parser(tmp_path):
    """Runtime parsing of a user-supplied RH .molecule file matches the
    shipped table entry (ref format:
    /root/reference/lightweaver/molecule.py:100-175)."""
    from lightweaver_tpu.molecule import Molecule

    src = tmp_path / 'OH.molecule'
    src.write_text("""# A comment line
  OH

# Charge
  0

# constituents
  H, O

# Ediss [eV]
  4.392

# Fit type
  SAUVAL_TATUM_84

# Tmin and Tmax [K]
  1.0E+3  9.0E+3

# pf_coef
  4   3.0929 -1.6778 0.6743 -0.1874

# eqc_coef
  3  10.7881 -0.8762 -0.5436

## end
""")
    m = Molecule.from_file(src)
    ref = MolecularTable.default(['OH'])['OH']
    assert m.name == 'OH'
    assert m.charge == 0
    assert sorted(e.name for e in m.elements) == ['H', 'O']
    T = np.linspace(1500.0, 8000.0, 7)
    np.testing.assert_allclose(m.equilibrium_constant(T),
                               ref.equilibrium_constant(T), rtol=1e-12)
    # outside the formation range the constant is zero
    assert m.equilibrium_constant(np.array([500.0, 1e4])).tolist() == [0, 0]


def test_molecular_table_from_paths(tmp_path):
    """MolecularTable accepts paths like the reference's constructor."""
    src = tmp_path / 'H2.molecule'
    src.write_text("""  H2
  0
  2H
  4.478
  KURUCZ_85
  2.0E3 9.0E3
  2   1.0 0.5
  3   1.0 0.5 0.25
""")
    t = MolecularTable([src])
    assert 'H2' in t and len(t) == 1
    assert t['h2'].Nnuclei == 2


def test_co_nlte_shipped():
    """CO_NLTE (identical equilibrium data to CO; separate line-list
    pointer upstream) is available in the default table."""
    t = MolecularTable.default(['CO', 'CO_NLTE'])
    T = np.array([2000.0, 4000.0])
    np.testing.assert_allclose(t['CO_NLTE'].equilibrium_constant(T),
                               t['CO'].equilibrium_constant(T), rtol=0)
