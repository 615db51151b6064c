"""Multi-host helpers: single-process API checks, the 8-virtual-device
global mesh, AND a true 2-process jax.distributed run (subprocess-spawned
workers, localhost coordinator, 4 virtual CPU devices each)."""
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

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


@pytest.mark.slow
def test_two_process_multihost():
    """TRUE multi-process validation: two jax.distributed CPU processes
    (localhost coordinator, 4 virtual devices each) build the 8-device
    global mesh, each feeds ITS block of columns, and the sharded MALI
    iterations must match an unsharded run (see multihost_worker.py)."""
    worker = Path(__file__).parent / 'multihost_worker.py'
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        port = s.getsockname()[1]

    env = os.environ.copy()
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('JAX_NUM_PROCESSES', None)
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), '2', str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out.decode(errors='replace'))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {i} failed:\n{out[-4000:]}'
        assert f'MULTIHOST OK p{i}/2' in out, out[-4000:]
