"""Standard model atoms for common solar species.

The reference distribution generates its model-atom library
(`rh_atoms.py`) from RH's atom files; that file is absent from the
reference snapshot (see SURVEY.md P18), so these models are built here
from published data:

- level energies / statistical weights: NIST ASD
- oscillator strengths: NIST ASD
- natural broadening: sum of Einstein A coefficients out of the upper level
- collisional rates: van Regemorter (permitted), constant effective
  collision strengths (forbidden; magnitudes from Melendez et al. 2007 for
  Ca II), Seaton (ionisation)
- photoionisation: hydrogenic cross-sections with Seaton Gaunt factors

These reproduce the standard 6-level H and Ca II NLTE problems; rate data
can be refined per-species without touching the framework.
"""
from fractions import Fraction as F

import numpy as np

from . import constants as Const
from .atomic_model import (AtomicLevel, AtomicModel, HydrogenicContinuum,
                           LinearCoreExpWings, LineType, VoigtLine)
from .atomic_table import PeriodicTable
from .broadening import (HydrogenLinearStarkBroadening, LineBroadening,
                         QuadraticStarkBroadening, RadiativeBroadening,
                         VdwUnsold)
from .collisional_rates import Omega, SeatonCI, VanRegemorter


def _lambda0_nm(levels, i, j):
    dE = (levels[j][0] - levels[i][0]) * Const.HC / Const.CM_TO_M
    return Const.HC / dE / Const.NM_TO_M


def _Aji(levels, i, j, f):
    lam_m = _lambda0_nm(levels, i, j) * Const.NM_TO_M
    gi, gj = levels[i][1], levels[j][1]
    C = (2 * np.pi * (Const.QElectron / Const.Epsilon0)
         * (Const.QElectron / Const.MElectron) / Const.CLight)
    return C / lam_m ** 2 * (gi / gj) * f


def _gamma_rad(levels, lines):
    """Natural broadening per upper level: sum of A out of that level."""
    gamma = {}
    for (i, j, f, *_rest) in lines:
        gamma[j] = gamma.get(j, 0.0) + _Aji(levels, i, j, f)
    return gamma


def _hyd_alpha0(n, Z, edge_nm):
    """Kramers hydrogenic threshold cross-section with Gaunt factor [m^2]."""
    from .atomic_model import gaunt_bf
    return 7.907e-22 * n / Z ** 2 * float(gaunt_bf(edge_nm, n, Z))


def H_6_atom() -> AtomicModel:
    """6-level hydrogen (5 bound + H II), the standard chromospheric model.

    Energies in cm^-1 (NIST), Lyman alpha/beta treated in PRD.
    """
    # (E [cm^-1], g, label, stage, n)
    lv = [
        (0.000, 2.0, 'H I 1S 2SE', 0),
        (82259.158, 8.0, 'H I 2P 2PO', 0),
        (97492.304, 18.0, 'H I 3D 2DE', 0),
        (102823.904, 32.0, 'H I 4F 2FO', 0),
        (105291.657, 50.0, 'H I 5G 2GE', 0),
        (109677.617, 1.0, 'H II', 1),
    ]
    # (i, j, f, LineType, qCore, qWing, Nlambda)
    ln = [
        (0, 1, 4.162e-01, LineType.PRD, 15.0, 600.0, 101),
        (0, 2, 7.910e-02, LineType.PRD, 10.0, 250.0, 51),
        (0, 3, 2.899e-02, LineType.CRD, 5.0, 100.0, 21),
        (0, 4, 1.394e-02, LineType.CRD, 5.0, 100.0, 21),
        (1, 2, 6.407e-01, LineType.CRD, 10.0, 250.0, 71),
        (1, 3, 1.193e-01, LineType.CRD, 10.0, 250.0, 51),
        (1, 4, 4.467e-02, LineType.CRD, 5.0, 100.0, 21),
        (2, 3, 8.421e-01, LineType.CRD, 5.0, 100.0, 21),
        (2, 4, 1.506e-01, LineType.CRD, 5.0, 100.0, 21),
        (3, 4, 1.038e+00, LineType.CRD, 5.0, 100.0, 21),
    ]
    grad = _gamma_rad(lv, ln)
    levels = [AtomicLevel(E=E, g=g, label=lab, stage=st)
              for (E, g, lab, st) in lv]
    lines = []
    for (i, j, f, t, qc, qw, nl) in ln:
        lines.append(VoigtLine(
            j=j, i=i, f=f, type=t,
            quadrature=LinearCoreExpWings(qCore=qc, qWing=qw, Nlambda=nl),
            broadening=LineBroadening(
                natural=[RadiativeBroadening(gamma=grad[j])],
                elastic=[VdwUnsold(vals=[1.0, 0.0]),
                         HydrogenLinearStarkBroadening()])))
    continua = []
    for i in range(5):
        n = i + 1
        edge = _lambda0_nm(lv, i, 5)
        continua.append(HydrogenicContinuum(
            j=5, i=i, NlambdaGen=20,
            alpha0=_hyd_alpha0(n, 1, edge),
            minWavelength=edge / 4.0))
    collisions = []
    for (i, j, f, *_r) in ln:
        collisions.append(VanRegemorter(j=j, i=i, f=f))
    for i in range(5):
        n = i + 1
        edge = _lambda0_nm(lv, i, 5)
        collisions.append(SeatonCI(j=5, i=i, alpha0=_hyd_alpha0(n, 1, edge)))
    return AtomicModel(element=PeriodicTable.element('H'), levels=levels,
                       lines=lines, continua=continua, collisions=collisions)


def CaII_atom() -> AtomicModel:
    """5-level + continuum Ca II: H & K resonance lines and the IR triplet.
    """
    lv = [
        (0.000, 2.0, 'CA II 3P6 4S 2SE', 1, F(1, 2), 0, F(1, 2)),
        (13650.19, 4.0, 'CA II 3P6 3D 2DE 3/2', 1, F(3, 2), 2, F(1, 2)),
        (13710.88, 6.0, 'CA II 3P6 3D 2DE 5/2', 1, F(5, 2), 2, F(1, 2)),
        (25191.51, 2.0, 'CA II 3P6 4P 2PO 1/2', 1, F(1, 2), 1, F(1, 2)),
        (25414.40, 4.0, 'CA II 3P6 4P 2PO 3/2', 1, F(3, 2), 1, F(1, 2)),
        (95751.87, 1.0, 'CA III 3P6 1SE', 2, F(0, 1), 0, F(0, 1)),
    ]
    lv_eg = [(E, g) for (E, g, *_r) in lv]
    # (i, j, f, type, qCore, qWing, Nlambda)
    ln = [
        (0, 3, 3.30e-01, LineType.CRD, 15.0, 600.0, 101),   # H 396.8 nm
        (0, 4, 6.82e-01, LineType.CRD, 15.0, 600.0, 101),   # K 393.4 nm
        (1, 3, 5.96e-02, LineType.CRD, 10.0, 300.0, 81),    # 866.2 nm
        (1, 4, 1.20e-02, LineType.CRD, 10.0, 300.0, 81),    # 849.8 nm
        (2, 4, 7.22e-02, LineType.CRD, 10.0, 300.0, 81),    # 854.2 nm
    ]
    grad = _gamma_rad(lv_eg, ln)
    levels = [AtomicLevel(E=E, g=g, label=lab, stage=st, J=J, L=L, S=S)
              for (E, g, lab, st, J, L, S) in lv]
    lines = []
    for (i, j, f, t, qc, qw, nl) in ln:
        lines.append(VoigtLine(
            j=j, i=i, f=f, type=t,
            quadrature=LinearCoreExpWings(qCore=qc, qWing=qw, Nlambda=nl),
            broadening=LineBroadening(
                natural=[RadiativeBroadening(gamma=grad[j])],
                elastic=[VdwUnsold(vals=[1.0, 1.0]),
                         QuadraticStarkBroadening(coeff=1.0)])))
    edge = _lambda0_nm(lv_eg, 0, 5)
    # effective n of Ca II ground wrt Ca III continuum
    continua = []
    for i in range(5):
        dE = (lv[5][0] - lv[i][0]) * Const.HC / Const.CM_TO_M
        Z = 2
        nEff = Z * np.sqrt(Const.ERydberg / dE)
        edge_i = _lambda0_nm(lv_eg, i, 5)
        continua.append(HydrogenicContinuum(
            j=5, i=i, NlambdaGen=20,
            alpha0=_hyd_alpha0(nEff, Z, edge_i),
            minWavelength=edge_i / 3.0))
    # Effective collision strengths for forbidden transitions
    # (magnitudes after Melendez et al. 2007); permitted via van Regemorter.
    Tgrid = [3000.0, 5000.0, 10000.0, 20000.0, 50000.0, 100000.0]
    collisions = [
        Omega(j=1, i=0, temperature=Tgrid, rates=[2.4] * 6),
        Omega(j=2, i=0, temperature=Tgrid, rates=[3.7] * 6),
        Omega(j=2, i=1, temperature=Tgrid, rates=[6.0] * 6),
        Omega(j=3, i=2, temperature=Tgrid, rates=[4.0] * 6),
    ]
    for (i, j, f, *_r) in ln:
        collisions.append(VanRegemorter(j=j, i=i, f=f))
    for i in range(5):
        dE = (lv[5][0] - lv[i][0]) * Const.HC / Const.CM_TO_M
        nEff = 2 * np.sqrt(Const.ERydberg / dE)
        edge_i = _lambda0_nm(lv_eg, i, 5)
        collisions.append(SeatonCI(j=5, i=i,
                                   alpha0=_hyd_alpha0(nEff, 2, edge_i)))
    return AtomicModel(element=PeriodicTable.element('Ca'), levels=levels,
                       lines=lines, continua=continua, collisions=collisions)


def H_6_PRD_atom() -> AtomicModel:
    return H_6_atom()


def H_6_CRD_atom() -> AtomicModel:
    atom = H_6_atom()
    for l in atom.lines:
        l.type = LineType.CRD
    return atom
