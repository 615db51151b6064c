"""RH atom-file reader (rh_format.py) vs the reference converter's
grammar (ref: /root/reference/Utils/ConvertAtom.py:110-350)."""
import numpy as np
import pytest

from lightweaver_tpu.atomic_model import (ExplicitContinuum,
                                          HydrogenicContinuum, LineType)
from lightweaver_tpu.broadening import (MultiplicativeStarkBroadening,
                                        QuadraticStarkBroadening,
                                        VdwBarklem, VdwRidderRensbergen,
                                        VdwUnsold)
from lightweaver_tpu.collisional_rates import (CE, CI, Ar85Cdi, Burgess,
                                               ChargeExchangeProton, Omega)
from lightweaver_tpu.rh_format import RhAtomParseError, parse_rh_atom

CA_ATOM = """# Test Ca II model in RH format
  CA

# Nlevel  Nline   Ncont   Nfixed
    6        5       5       0

#  E[cm^-1]    g           label[20]         stage   levelNo
#                     '|----|----|----|----'
      0.000    2.00    'CA II 3P6 4S 2SE    '    1       0
  13650.190    4.00    'CA II 3P6 3D 2DE 3  '    1       1
  13710.880    6.00    'CA II 3P6 3D 2DE 5  '    1       2
  25191.510    2.00    'CA II 3P6 4P 2PO 1  '    1       3
  25414.400    4.00    'CA II 3P6 4P 2PO 3  '    1       4
  95751.870    1.00    'CA III 3P6 1SE      '    2       5

# j   i       f     type  Nlambda symmetr  q_core q_wing  vdWapprx        vdWaals          radiative  Stark
#                                                            H            He
  3   0  3.300E-01  VOIGT    70    ASYMM    3.0   150.0   UNSOLD  1.50  0.0  1.50  0.0  1.48E+08  1.0
  4   0  6.600E-01   PRD     70    ASYMM    3.0   150.0   UNSOLD  1.50  0.0  1.50  0.0  1.50E+08  1.0  1.10
  3   1  2.200E-02  VOIGT    40    ASYMM    2.0    80.0  BARKLEM  250.0 .253 1.00  0.0  1.48E+08 -3.0
  4   1  4.400E-03  VOIGT    40    ASYMM    2.0    80.0  PARAMTR  1.00  0.30 0.50  0.30 1.48E+08  1.0
  4   2  4.000E-02  VOIGT    40    ASYMM    2.0    80.0   UNSOLD  1.00  0.0  1.00  0.0  1.48E+08  1.0

# j   i    alpha0 [m^-2]   Nlambda   Wavel. Dep.   laMin [nm]
  5   0    2.0363E-23        5        EXPLICIT      20.0
# explicit rows, red to blue
   104.4     2.0363E-23
    80.0     1.0E-23
    60.0     5.0E-24
    40.0     2.4E-24
    20.0     1.0E-24
  5   1    1.0E-22           5        HYDROGENIC    30.0
  5   2    1.0E-22           5        HYDROGENIC    30.0
  5   3    3.0E-23           5        HYDROGENIC    30.0
  5   4    3.0E-23           5        HYDROGENIC    30.0

 TEMP    6          3000.0     5000.0     7000.0    15000.0    50000.0   100000.0
 OMEGA   1  0       4.71       4.47       4.33       4.06       3.57       3.10
 OMEGA   0  2       7.07       6.72       6.50       6.09       5.36       4.65
 CE      3  1       1.0E-16    1.1E-16    1.2E-16    1.3E-16    1.4E-16    1.5E-16
 CI      5  0       5.0E-17    5.5E-17    6.0E-17    7.0E-17    8.0E-17    9.0E-17
 CH+     5  4       1.0E-15    1.0E-15    1.0E-15    1.0E-15    1.0E-15    1.0E-15
 AR85-CDI 0 5  1
  11.30  4.60  -2.00  1.70  -0.50
 BURGESS 1 5  1.5
 SHULL82 0 5  0. 0. 0. 0. 0. 0. 0. 0.
END
"""


@pytest.fixture(scope='module')
def atom():
    with pytest.warns(UserWarning, match='SHULL82'):
        return parse_rh_atom(CA_ATOM)


def test_levels(atom):
    assert len(atom.levels) == 6
    assert atom.element.Z == 20
    g = [2, 4, 6, 2, 4, 1]
    assert [l.g for l in atom.levels] == g
    assert atom.levels[5].stage == 2
    # term parsing: 4p 2PO 3/2 -> S=1/2, L=1, J=3/2
    lev = atom.levels[4]
    assert float(lev.S) == 0.5 and lev.L == 1 and float(lev.J) == 1.5
    assert atom.levels[0].L == 0
    # singlet continuum parent: 1SE, J=(g-1)/2=0
    assert atom.levels[5].L == 0 and float(atom.levels[5].S) == 0


def test_lines(atom):
    assert len(atom.lines) == 5
    k = atom.lines[1]
    assert k.type == LineType.PRD
    assert k.gLandeEff == pytest.approx(1.10)
    assert abs(k.lambda0 - 393.4) < 0.5      # Ca II K
    assert atom.lines[0].type == LineType.CRD
    assert atom.lines[0].gLandeEff is None
    # vdW dispatch
    assert isinstance(atom.lines[0].broadening.elastic[0], VdwUnsold)
    assert isinstance(atom.lines[2].broadening.elastic[0], VdwBarklem)
    assert isinstance(atom.lines[3].broadening.elastic[0],
                      VdwRidderRensbergen)
    # stark sign convention
    assert isinstance(atom.lines[0].broadening.elastic[1],
                      QuadraticStarkBroadening)
    assert isinstance(atom.lines[2].broadening.elastic[1],
                      MultiplicativeStarkBroadening)
    assert atom.lines[2].broadening.elastic[1].coeff == pytest.approx(3.0)


def test_continua(atom):
    assert len(atom.continua) == 5
    expl = atom.continua[0]
    assert isinstance(expl, ExplicitContinuum)
    # reversed to ascending wavelength
    assert np.all(np.diff(expl.wavelengthGrid) > 0)
    assert expl.alpha(np.array([104.0]))[0] == pytest.approx(2.03e-23,
                                                             rel=1e-2)
    assert isinstance(atom.continua[1], HydrogenicContinuum)
    assert atom.continua[1].minLambda == pytest.approx(30.0)


def test_collisions(atom):
    kinds = [type(c).__name__ for c in atom.collisions]
    assert kinds == ['Omega', 'Omega', 'CE', 'CI', 'ChargeExchangeProton',
                     'Ar85Cdi', 'Burgess']
    om = atom.collisions[1]
    # i/j normalised regardless of order in the file
    assert (om.i, om.j) == (0, 2)
    assert om.rates[0] == pytest.approx(7.07)
    assert atom.collisions[0].temperature[3] == pytest.approx(15000.0)
    cdi = atom.collisions[5]
    assert np.asarray(cdi.cdi).shape == (1, 5)
    assert atom.collisions[6].fudge == pytest.approx(1.5)


def test_nfixed_rejected():
    bad = CA_ATOM.replace('5       5       0', '5       5       1')
    with pytest.raises(RhAtomParseError, match='Fixed'):
        parse_rh_atom(bad)


def test_converges_on_falc():
    """The parsed atom must run end-to-end: build a Context on (coarse)
    FAL-C and converge statistical equilibrium."""
    from lightweaver_tpu.atmosphere import Atmosphere
    from lightweaver_tpu.atomic_set import RadiativeSet
    from lightweaver_tpu.context import Context
    from lightweaver_tpu.fal import Falc82
    from lightweaver_tpu.iterate_ctx import iterate_ctx_se
    from lightweaver_tpu.rh_atoms import H_6_atom

    with pytest.warns(UserWarning):
        ca = parse_rh_atom(CA_ATOM)
    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 16).astype(int))
    atmos = Atmosphere(height=full.height[idx],
                       temperature=full.temperature[idx],
                       vlos=full.vlos[idx], vturb=full.vturb[idx],
                       ne=full.ne[idx], nHTot=full.nHTot[idx])
    atmos.quadrature(3)
    rs = RadiativeSet([H_6_atom(), ca])
    rs.set_active('Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    ctx = Context(atmos, spect, eqPops)
    nIter = iterate_ctx_se(ctx, NmaxIter=200, quiet=True, popsTol=1e-3)
    assert nIter < 200
    pops = np.asarray(ctx.popsState[0]['n'])
    assert np.isfinite(pops).all() and pops.min() > 0
