"""Saha EOS and hydrostatic atmosphere construction."""
import numpy as np
import pytest

from lightweaver_tpu import constants as Const
from lightweaver_tpu.atmosphere import Atmosphere, ScaleType
from lightweaver_tpu.eos import SahaEos
from lightweaver_tpu.fal import Falc82


def test_eos_recovers_falc_deep_ne():
    """FAL-C deep photosphere is in LTE: the Saha EOS at the tabulated
    (T, pgas) must recover the tabulated electron density."""
    full = Falc82()
    eos = SahaEos()
    sl = slice(55, 82)
    T = full.temperature[sl]
    nTot = full.nHTot[sl] * eos.totalAbund + full.ne[sl]
    pgas = nTot * Const.KBoltzmann * T
    out = eos.solve(T, pgas)
    rel = np.abs(out['ne'] / full.ne[sl] - 1.0)
    assert np.median(rel) < 0.10
    assert rel.max() < 0.20
    assert np.abs(out['nHTot'] / full.nHTot[sl] - 1.0).max() < 1e-3


def test_eos_ionisation_physics():
    eos = SahaEos()
    pg = np.full(4, 1e4)
    # cool: metal-donated electrons only (tiny); hot: H fully ionised
    T = np.array([4000.0, 6000.0, 10000.0, 30000.0])
    out = eos.solve(T, pg)
    frac = out['ne'] / out['nHTot']
    assert frac[0] < 1e-2
    assert np.all(np.diff(frac) > 0)
    assert frac[-1] > 1.0          # H+ plus He contributions


@pytest.mark.slow
def test_make_1d_columnmass_hydrostatic():
    full = Falc82()
    # rebuild FAL-C from (cmass, T) only
    atmos = Atmosphere.make_1d(ScaleType.ColumnMass,
                               depthScale=full.cmass,
                               temperature=full.temperature,
                               vlos=full.vlos, vturb=full.vturb)
    assert np.all(atmos.ne > 0) and np.all(atmos.nHTot > 0)
    assert np.all(np.diff(atmos.height) < 0)      # monotone height
    # deep-photosphere structure close to FAL-C (LTE regime; the
    # chromospheric ne is NLTE and not reproducible by a Saha EOS)
    sl = slice(-15, None)
    assert np.abs(atmos.nHTot[sl] / full.nHTot[sl] - 1).max() < 0.2
    assert np.abs(atmos.ne[sl] / full.ne[sl] - 1).max() < 0.35


@pytest.mark.slow
def test_make_1d_tau500():
    full = Falc82()
    tau = np.logspace(-6, 1.5, 40)
    T = np.interp(np.log10(tau),
                  np.linspace(-6, 1.5, 82), full.temperature)
    atmos = Atmosphere.make_1d(ScaleType.Tau500, depthScale=tau,
                               temperature=T, vlos=np.zeros(40),
                               vturb=np.full(40, 1e3))
    assert np.all(atmos.ne > 0) and np.all(atmos.nHTot > 0)
    assert np.all(np.diff(atmos.height) < 0)
    # pressure increases monotonically with tau
    pg = ((atmos.nHTot * SahaEos().totalAbund + atmos.ne)
          * Const.KBoltzmann * atmos.temperature)
    assert np.all(np.diff(pg) > 0)
    # height anchored at the interpolated tau500 = 1 point (like the
    # reference's hTau1 = np.interp(1.0, tau_ref, height) anchor)
    assert abs(np.interp(1.0, atmos.tauRef, atmos.height)) < 1.0
    # tauRef is the input scale
    assert np.allclose(atmos.tauRef, tau)
