"""1.5D column batch: vmapped MALI over independent columns on a mesh.

Oracle: each column of the batch evolves exactly like a standalone
Context on the same atmosphere (same traced program, vmapped).
"""
import numpy as np
import pytest


@pytest.mark.slow
def test_column_batch_matches_standalone():
    import jax

    from lightweaver_tpu.atmosphere import Atmosphere
    from lightweaver_tpu.atomic_set import RadiativeSet
    from lightweaver_tpu.context import Context
    from lightweaver_tpu.fal import Falc82
    from lightweaver_tpu.parallel import ColumnBatch, make_mesh
    from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom

    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 20).astype(int))

    def make_ctx(scale):
        atmos = Atmosphere(height=full.height[idx],
                           temperature=full.temperature[idx] * scale,
                           vlos=full.vlos[idx], vturb=full.vturb[idx],
                           ne=full.ne[idx], nHTot=full.nHTot[idx])
        atmos.quadrature(3)
        rs = RadiativeSet([H_6_atom(), CaII_atom()])
        rs.set_active('Ca')
        spect = rs.compute_wavelength_grid()
        eqPops = rs.compute_eq_pops(atmos)
        return Context(atmos, spect, eqPops)

    scales = [1.0, 1.05]
    contexts = [make_ctx(s) for s in scales]
    mesh = make_mesh(nColumns=2, nWavelength=1,
                     devices=jax.devices()[:2])
    batch = ColumnBatch([make_ctx(s) for s in scales], mesh=mesh)

    nIterCmp = 8
    for it in range(nIterCmp):
        batch.formal_sol_gamma_matrices()
        if it >= 2:
            batch.stat_equil()
        for c in contexts:
            c.formal_sol_gamma_matrices()
            if it >= 2:
                c.stat_equil()

    Jb = np.asarray(batch.params['J'])
    for ci, c in enumerate(contexts):
        assert np.allclose(Jb[ci], np.asarray(c.J), rtol=1e-10), ci
        nb = np.asarray(batch.params['pops'][0][ci])
        ns = np.asarray(c.popsState[0]['n'])
        assert np.allclose(nb, ns, rtol=1e-10), ci
    # the two columns genuinely differ (different temperatures)
    assert not np.allclose(Jb[0], Jb[1], rtol=1e-3)
