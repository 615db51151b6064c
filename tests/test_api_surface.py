"""Top-level package exports match the reference's public API
(ref: /root/reference/lightweaver/__init__.py), so user scripts written
against `import lightweaver as lw` port by changing the import line."""
import numpy as np
import pytest

import lightweaver_tpu as lw

REFERENCE_EXPORTS = [
    # atmosphere
    'Atmosphere', 'BoundaryCondition', 'Layout', 'NoBc',
    'PeriodicRadiation', 'ScaleType', 'Stratifications',
    'ThermalisedRadiation', 'ZeroRadiation',
    # atomic model / set / table
    'reconfigure_atom', 'RadiativeSet', 'SpectrumConfiguration',
    'hminus_pops', 'lte_pops', 'AtomicAbundance', 'DefaultAtomicAbundance',
    'Element', 'Isotope', 'KuruczPfTable', 'PeriodicTable',
    # drivers and reporting
    'benchmark', 'ConfigDict', 'ConvergenceCriteria',
    'DefaultConvergenceCriteria', 'iterate_ctx_se', 'IterationUpdate',
    'Context', 'nr_post_update',
    # molecules and I/O
    'MolecularTable', 'read_multi_atmos',
    # utils
    'ConvergenceError', 'CrswIterator', 'ExplodingMatrixError',
    'InitialSolution', 'NgOptions', 'UnityCrswIterator', 'air_to_vac',
    'compute_contribution_fn', 'compute_height_edges',
    'compute_radiative_losses', 'compute_wavelength_edges',
    'convert_specific_intensity', 'gaunt_bf', 'get_data_path',
    'get_default_molecule_path', 'integrate_line_losses', 'planck',
    'vac_to_air', 'voigt_H',
]


def test_reference_exports_present():
    missing = [n for n in REFERENCE_EXPORTS if not hasattr(lw, n)]
    assert not missing, missing


def test_layout_views():
    atmos = lw.Falc82()
    lay = atmos.structure
    assert lay.Ndim == 1
    np.testing.assert_array_equal(lay.z, atmos.height)
    np.testing.assert_array_equal(lay.vz, atmos.vlos)
    assert isinstance(lay.zUpperBc, lw.ZeroRadiation)
    assert isinstance(lay.xLowerBc, lw.NoBc)

    full = lw.Falc82()
    idx = np.arange(0, 82, 10)
    Nz, Nx = len(idx), 4
    bc = lambda a: np.broadcast_to(a[idx, None], (Nz, Nx)).copy()
    atmos2 = lw.Atmosphere.make_2d(
        height=full.height[idx], x=np.linspace(0, 1e6, Nx),
        temperature=bc(full.temperature), vx=np.zeros((Nz, Nx)),
        vz=bc(full.vlos), vturb=bc(full.vturb), ne=bc(full.ne),
        nHTot=bc(full.nHTot))
    lay2 = atmos2.structure
    assert lay2.Ndim == 2
    assert lay2.x.shape == (Nx,) and lay2.z.shape == (Nz,)
    assert isinstance(lay2.xLowerBc, lw.PeriodicRadiation)


def test_planck_matches_ops():
    from lightweaver_tpu.ops.planck import planck_nu
    T = np.array([4000.0, 8000.0])
    wav = np.array([500.0, 854.2])
    np.testing.assert_allclose(np.asarray(lw.planck(T, wav)),
                               np.asarray(planck_nu(T, wav)))


def test_height_edges():
    atmos = lw.Falc82()
    atmos.quadrature(3)
    rs = lw.RadiativeSet([])

    class FakeCtx:
        pass
    ctx = FakeCtx()
    ctx.atmos = atmos
    edges = lw.compute_height_edges(ctx)
    h = atmos.height
    assert edges.shape == (h.shape[0] + 1,)
    assert edges[0] > h[0] and edges[-1] < h[-1]   # height decreasing
    np.testing.assert_allclose(edges[1:-1], 0.5 * (h[1:] + h[:-1]))


def test_reconfigure_atom_idempotent():
    from lightweaver_tpu.rh_atoms import CaII_atom
    atom = CaII_atom()
    lam0 = atom.lines[0].lambda0
    lw.reconfigure_atom(atom)
    assert atom.lines[0].lambda0 == lam0


def test_context_solver_swap():
    """Runtime formal-solver re-selection (the reference's plugin
    registry path) re-traces the iteration and changes the result."""
    from lightweaver_tpu.atmosphere import Atmosphere
    from lightweaver_tpu.fal import Falc82
    from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom

    full = Falc82()
    idx = np.arange(0, 82, 6)
    atmos = Atmosphere(height=full.height[idx],
                       temperature=full.temperature[idx],
                       vlos=full.vlos[idx], vturb=full.vturb[idx],
                       ne=full.ne[idx], nHTot=full.nHTot[idx])
    atmos.quadrature(2)
    rs = lw.RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    ctx = lw.Context(atmos, spect, eqPops)
    ctx.formal_sol_gamma_matrices()
    Ibez = np.asarray(ctx.I).copy()

    ctx.set_formal_solver('piecewise_linear_1d')
    assert ctx.cfg.formalSolver == 'piecewise_linear_1d'
    ctx.formal_sol_gamma_matrices()
    Ilin = np.asarray(ctx.I)
    # different integrator, same physics: on this deliberately coarse
    # 14-point grid the integrators differ by tens of percent pointwise,
    # so only order-of-magnitude agreement is asserted
    assert not np.array_equal(Ibez, Ilin)
    assert np.all(np.isfinite(Ilin)) and np.all(Ilin > 0)
    assert 0.5 < Ilin.max() / Ibez.max() < 2.0

    with pytest.raises(ValueError):
        ctx.set_formal_solver('nope')
    with pytest.raises(ValueError):
        ctx.set_fs_iter_scheme('somebody_elses_scheme')
    ctx.set_fs_iter_scheme('mali_full_precond_AVX512')   # accepted alias
    props = ctx.get_fs_iter_scheme_properties()
    assert props['name'] == 'mali_full_precond'
    assert ctx.Nthreads == 1
    ctx.Nthreads = 8            # no-op, must not raise
    assert ctx.hprd is False
