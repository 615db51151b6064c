"""Measure 1.5D column-batch scaling (BASELINE config 5).

Two modes:

  python scripts/scaling_bench.py mesh      # strong scaling, virtual CPU mesh
  python scripts/scaling_bench.py tpu       # single-chip column throughput
  python scripts/scaling_bench.py tpu10k    # 10k-column convergence on TPU

'mesh' must run with XLA_FLAGS=--xla_force_host_platform_device_count=8;
it pins the CPU backend itself (the axon plugin ignores JAX_PLATFORMS in
the environment).  Results are printed as JSON lines for STATUS.md.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def build_batch(nCols, nDepth=40, Nrays=3, mesh=None, dtype='float64',
                active=('Ca',), seed=0):
    import jax.numpy as jnp
    from lightweaver_tpu.fal import Falc82
    from lightweaver_tpu.parallel import ColumnBatch
    from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom

    dtype = {'float32': jnp.float32, 'float64': jnp.float64}[str(dtype)]
    full = Falc82()
    idx = np.unique(np.linspace(0, 81, nDepth).astype(int))
    Nk = len(idx)
    rng = np.random.default_rng(seed)
    scale = 1.0 + 0.05 * rng.standard_normal((nCols, 1))
    T = full.temperature[idx][None, :] * scale
    rep = lambda a: np.broadcast_to(a[idx], (nCols, Nk)).copy()
    return ColumnBatch.from_stacked(
        full.height[idx], T, rep(full.vlos), rep(full.vturb),
        rep(full.ne), rep(full.nHTot),
        lambda: [H_6_atom(), CaII_atom()], active, Nrays=Nrays,
        mesh=mesh, dtype=dtype)


def time_iters(batch, nIter=6, nWarm=2):
    for _ in range(nWarm):
        batch.formal_sol_gamma_matrices()
        batch.stat_equil()
    t0 = time.perf_counter()
    for _ in range(nIter):
        batch.formal_sol_gamma_matrices()
        batch.stat_equil()
    np.asarray(batch.ne)  # sync
    return (time.perf_counter() - t0) / nIter


def run_mesh():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    from lightweaver_tpu.parallel import make_mesh
    ndev = len(jax.devices())
    assert ndev >= 8, f'need 8 virtual devices, got {ndev}'
    nCols = 64
    results = {}
    for n in (1, 2, 4, 8):
        mesh = (make_mesh(nColumns=n, nWavelength=1,
                          devices=jax.devices()[:n]) if n > 1 else None)
        batch = build_batch(nCols, mesh=mesh)
        results[n] = time_iters(batch)
        print(json.dumps({'mode': 'mesh-strong', 'ndev': n,
                          'cols': nCols, 's_per_iter': results[n],
                          'speedup': results[1] / results[n],
                          'efficiency': results[1] / results[n] / n}),
              flush=True)


def run_mesh_weak(colsPerDev=32):
    """Weak scaling: fixed per-device work (colsPerDev columns each).

    Ideal weak scaling keeps s_per_iter constant as devices (and total
    columns) grow; efficiency = t(1 dev) / t(N dev).  The columns axis
    is embarrassingly parallel (scripts/comm_analysis.py shows the
    partitioner inserts ZERO collectives on it), so efficiency here
    measures only partitioning overhead on the virtual CPU mesh."""
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    from lightweaver_tpu.parallel import make_mesh
    ndev = len(jax.devices())
    assert ndev >= 8, f'need 8 virtual devices, got {ndev}'
    results = {}
    for n in (1, 2, 4, 8):
        mesh = (make_mesh(nColumns=n, nWavelength=1,
                          devices=jax.devices()[:n]) if n > 1 else None)
        batch = build_batch(colsPerDev * n, mesh=mesh)
        results[n] = time_iters(batch)
        print(json.dumps({'mode': 'mesh-weak', 'ndev': n,
                          'cols': colsPerDev * n,
                          's_per_iter': results[n],
                          'efficiency': results[1] / results[n]}),
              flush=True)


def run_tpu(nCols=2048):
    import jax
    dev = jax.devices()[0]
    batch = build_batch(nCols, dtype='float32')
    s = time_iters(batch, nIter=10)
    print(json.dumps({'mode': 'tpu-columns', 'device': str(dev),
                      'cols': nCols, 's_per_iter': s,
                      'col_iters_per_sec': nCols / s}), flush=True)


def run_tpu10k(nCols=10240):
    import jax
    dev = jax.devices()[0]
    t0 = time.perf_counter()
    batch = build_batch(nCols, dtype='float32')
    tBuild = time.perf_counter() - t0
    print(f'built {nCols}-column batch in {tBuild:.1f}s', flush=True)
    t0 = time.perf_counter()
    nIter = batch.iterate(NmaxIter=500, popsTol=1e-3, quiet=False)
    tConv = time.perf_counter() - t0
    pops = batch.pops
    ok = bool(all(np.isfinite(p).all() and p.min() > 0 for p in pops))
    print(json.dumps({'mode': 'tpu-10k-convergence', 'device': str(dev),
                      'cols': nCols, 'build_s': tBuild,
                      'converge_s': tConv, 'iterations': int(nIter),
                      'all_converged': bool(batch.converged.all()),
                      'pops_finite_positive': ok}), flush=True)


if __name__ == '__main__':
    mode = sys.argv[1] if len(sys.argv) > 1 else 'mesh'
    {'mesh': run_mesh, 'mesh-weak': run_mesh_weak, 'tpu': run_tpu,
     'tpu10k': run_tpu10k}[mode]()
