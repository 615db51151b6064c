"""Multi-host helpers: exercised in single-process mode (the degenerate
but API-complete case) plus the 8-virtual-device global mesh."""
import numpy as np

import jax

from lightweaver_tpu.parallel import multihost as mh


def test_initialize_single_process_noop():
    mh.initialize_multihost(num_processes=1)     # must not raise
    assert jax.process_count() == 1


def test_global_mesh_shapes():
    mesh = mh.global_mesh(nWavelength=2)
    n = len(jax.devices())
    assert mesh.devices.shape == (n // 2, 2)
    assert mesh.axis_names == ('columns', 'wavelength')
    mesh1 = mh.global_mesh()
    assert mesh1.devices.shape == (n, 1)


def test_local_column_slice_covers_all():
    sl = mh.local_column_slice(103)
    assert sl == slice(0, 103)                   # single process: all


def test_make_global_array_roundtrip():
    mesh = mh.global_mesh()
    from jax.sharding import PartitionSpec as P
    data = np.arange(16.0).reshape(16, 1) * np.ones((16, 5))
    arr = mh.make_global_array(data, mesh, P('columns', None))
    np.testing.assert_array_equal(np.asarray(arr), data)


def test_column_batch_on_global_mesh():
    """ColumnBatch accepts the multihost global mesh."""
    from lightweaver_tpu.fal import Falc82
    from lightweaver_tpu.parallel.columns import ColumnBatch
    from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom

    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 14).astype(int))
    C = 8
    scale = 1.0 + 0.05 * np.linspace(-1, 1, C)
    stack = lambda a: np.stack([a] * C)
    mesh = mh.global_mesh()
    batch = ColumnBatch.from_stacked(
        height=stack(full.height[idx]),
        temperature=scale[:, None] * stack(full.temperature[idx]),
        vlos=stack(full.vlos[idx]), vturb=stack(full.vturb[idx]),
        ne=stack(full.ne[idx]), nHTot=stack(full.nHTot[idx]),
        models=lambda: [H_6_atom(), CaII_atom()],
        activeSpecies=('Ca',), mesh=mesh)
    batch.iterate(NmaxIter=60)
    pops = batch.pops[0]
    assert np.all(np.isfinite(pops))
    # hotter columns ionise more Ca II away from the ground level
    assert not np.allclose(pops[0], pops[-1])
