"""Native (C++) Saha EOS core vs the numpy implementation."""
import numpy as np
import pytest

from lightweaver_tpu import constants as Const
from lightweaver_tpu.eos import SahaEos
from lightweaver_tpu.fal import Falc82


def test_native_matches_numpy():
    eos = SahaEos()
    full = Falc82()
    T = full.temperature[::6]
    nTot = full.nHTot[::6] * eos.totalAbund + full.ne[::6]
    pgas = nTot * Const.KBoltzmann * T

    native = eos.solve_native(T, pgas)
    if native is None:
        pytest.skip('no C++ toolchain available')
    ref = eos.solve(T, pgas, native=False)
    assert np.allclose(native['ne'], ref['ne'], rtol=1e-6)
    assert np.allclose(native['nHTot'], ref['nHTot'], rtol=1e-10)
    assert np.allclose(native['rho'], ref['rho'], rtol=1e-10)


def test_native_is_default_and_faster():
    import time
    eos = SahaEos()
    T = np.linspace(3500.0, 12000.0, 300)
    pgas = np.logspace(1, 4, 300)
    if eos.solve_native(T[:1], pgas[:1]) is None:
        pytest.skip('no C++ toolchain available')
    t0 = time.perf_counter()
    eos.solve(T, pgas)                        # native path
    tN = time.perf_counter() - t0
    t0 = time.perf_counter()
    eos.solve(T, pgas, native=False)
    tP = time.perf_counter() - t0
    # per-point native loop should beat vectorised numpy over 20 elements
    assert tN < tP, (tN, tP)
