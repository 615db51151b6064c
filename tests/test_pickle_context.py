"""Whole-Context pickling: checkpoint/resume with plain pickle, exactly
the reference's workflow (every Cython class implements __getstate__;
ref: /root/reference/Source/LwMiddleLayer.pyx:2977-3037).

Oracle: converge halfway, pickle, load, continue -> identical result to
an uninterrupted run (same iteration count, same populations and J).
"""
import pickle

import numpy as np

from lightweaver_tpu.atmosphere import Atmosphere
from lightweaver_tpu.atomic_set import RadiativeSet
from lightweaver_tpu.context import Context
from lightweaver_tpu.fal import Falc82
from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom


def _setup():
    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 20).astype(int))
    atmos = Atmosphere(height=full.height[idx],
                       temperature=full.temperature[idx],
                       vlos=full.vlos[idx], vturb=full.vturb[idx],
                       ne=full.ne[idx], nHTot=full.nHTot[idx])
    atmos.quadrature(3)
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    return Context(atmos, spect, eqPops)


def _iterate(ctx, n, start=0):
    for it in range(start, start + n):
        ctx.formal_sol_gamma_matrices()
        if it >= 3:
            ctx.stat_equil()


def test_pickle_roundtrip_resume_matches_uninterrupted():
    ref = _setup()
    _iterate(ref, 30)

    half = _setup()
    _iterate(half, 12)
    blob = pickle.dumps(half)
    resumed = pickle.loads(blob)
    assert isinstance(resumed, Context)
    np.testing.assert_allclose(np.asarray(resumed.J), np.asarray(half.J),
                               rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(resumed.popsState[0]['n']),
                                  np.asarray(half.popsState[0]['n']))
    np.testing.assert_array_equal(np.asarray(resumed.I),
                                  np.asarray(half.I))
    _iterate(resumed, 18, start=12)
    np.testing.assert_allclose(np.asarray(resumed.popsState[0]['n']),
                               np.asarray(ref.popsState[0]['n']), rtol=5e-12)
    np.testing.assert_allclose(np.asarray(resumed.J), np.asarray(ref.J),
                               rtol=5e-12)
