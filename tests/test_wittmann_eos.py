"""WittmannEos vs golden arrays generated from the reference wittmann.py
(scripts/refgold/gen_wittmann_golden.py; reference wittmann.py:512-785
for the EOS surface, :786-1372 for the Kurucz opacity package).

The golden run evaluates the reference per depth point on FAL-C; the
repo implementation is depth-vectorised, so agreement here validates
both the physics and the vectorised fixpoint iterations.
"""
from pathlib import Path

import numpy as np

from lightweaver_tpu.wittmann_eos import WittmannEos

GOLD = np.load(Path(__file__).parent / 'golden' / 'wittmann_ref.npz')


def _rel(a, b):
    return np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-300))


def test_pressure_conversions_match_reference():
    eos = WittmannEos()
    T, pe = GOLD['T'], GOLD['pe']
    assert _rel(eos.pg_from_pe(T, pe), GOLD['pg']) < 1e-10
    assert _rel(eos.pe_from_pg(T, GOLD['pg']), GOLD['peRoundTrip']) < 1e-10
    assert _rel(eos.rho_from_pe(T, pe), GOLD['rho']) < 1e-10
    assert _rel(eos.pe_from_rho(T, GOLD['rho']), GOLD['peFromRho']) < 1e-10
    assert _rel(eos.pg_from_rho(T, GOLD['rho']), GOLD['pgFromRho']) < 1e-10


def test_partial_densities_match_reference():
    eos = WittmannEos()
    T, pe, pg = GOLD['T'], GOLD['pe'], GOLD['pg']
    assert _rel(eos.get_H6_pops(T, pg, pe), GOLD['h6']) < 1e-10
    assert _rel(eos.get_background_partials(T, pg, pe),
                GOLD['backgroundPartials']) < 1e-10


def test_cont_opacity_matches_reference():
    eos = WittmannEos()
    T, pe, pg = GOLD['T'], GOLD['pe'], GOLD['pg']
    cop = eos.cont_opacity(T, pg, pe, GOLD['wavs'])
    assert _rel(cop, GOLD['contOpacity']) < 1e-10


def test_h6_total_consistent_with_density():
    """Total H nuclei from the 6-level pops must match rho / massPerH."""
    eos = WittmannEos()
    T, pe, pg = GOLD['T'], GOLD['pe'], GOLD['pg']
    h6 = eos.get_H6_pops(T, pg, pe)
    # n(H I) + n(p) consistent with the neutral+proton part of gasc
    nHTot = h6.sum(axis=0)
    rho = eos.rho_from_pe(T, pe)
    nFromRho = rho / (eos.massPerH * eos.aMass[0] * 1.660538921e-24)
    # H2 molecules bind some nuclei in the cool photosphere; allow the
    # molecular fraction as slack while requiring agreement where hot
    hot = T > 6000.0
    assert _rel(nHTot[hot], nFromRho[hot]) < 1e-2
