"""Benchmark: formal-solver grid-point throughput of the full MALI step.

Mirrors the reference's autotune harness configuration
(ref: /root/reference/lightweaver/benchmark.py:19-113): FAL-C
interpolated to 500 depth points, H 6-level + Ca II active, 5-ray
quadrature, 50 `formal_sol_gamma_matrices` iterations.

Metric: formal-solver grid-point updates per second per chip, where one
sweep touches Nlambda x Nmu x 2 directions x Nspace points
(BASELINE.md's north-star denominator).  `vs_baseline` is the ratio of
the accelerator throughput to the same jitted program run on this host's
CPU (the reference publishes no absolute numbers to compare against).

Prints ONE json line.
"""
import json
import time

import numpy as np


def build_ctx(Nspace=500, Nrays=5, dtype=None):
    import jax.numpy as jnp

    from lightweaver_tpu.atmosphere import Atmosphere
    from lightweaver_tpu.atomic_set import RadiativeSet
    from lightweaver_tpu.context import Context
    from lightweaver_tpu.fal import Falc82
    from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom

    full = Falc82()
    # interpolate in log column mass like the reference benchmark
    cm = np.log10(full.cmass)
    cmNew = np.linspace(cm[0], cm[-1], Nspace)
    def interp(y, logY=False):
        if logY:
            return 10 ** np.interp(cmNew, cm, np.log10(y))
        return np.interp(cmNew, cm, y)
    atmos = Atmosphere(height=interp(full.height),
                       temperature=interp(full.temperature, logY=True),
                       vlos=np.zeros(Nspace),
                       vturb=interp(full.vturb),
                       ne=interp(full.ne, logY=True),
                       nHTot=interp(full.nHTot, logY=True))
    atmos.quadrature(Nrays)
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('H', 'Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    ctx = Context(atmos, spect, eqPops, dtype=dtype)
    return ctx


def time_iterations(ctx, nIter=50, warmup=2):
    import jax
    for _ in range(warmup):
        u = ctx.formal_sol_gamma_matrices()
    jax.block_until_ready(ctx.J)
    t0 = time.perf_counter()
    for _ in range(nIter):
        u = ctx.formal_sol_gamma_matrices()
    jax.block_until_ready(ctx.J)
    wall = time.perf_counter() - t0
    assert np.isfinite(u.dJMax)
    return wall


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    onTpu = dev.platform not in ('cpu',)
    # Bench the mixed-precision configuration (f32 state + f64
    # Gamma/rate accumulation + compensated Ieff), which converges to
    # the standard tolerances (tests/test_mixed_precision.py) and is the
    # fast path the autotuner selects.  Set BENCH_F64=1 for the f64
    # reference-precision run.
    import os
    dtype = None if os.environ.get('BENCH_F64') else jnp.float32

    nIter = 50
    ctx = build_ctx(dtype=dtype)
    gridPointsPerSweep = (ctx.cfg.Nlam * ctx.cfg.Nmu * 2 * ctx.cfg.Nk)
    wall = time_iterations(ctx, nIter=nIter)
    throughput = gridPointsPerSweep * nIter / wall

    # CPU anchor with the same program (fewer iterations; scaled)
    cpu = jax.devices('cpu')[0]
    with jax.default_device(cpu):
        ctxCpu = build_ctx(dtype=dtype)
        wallCpu = time_iterations(ctxCpu, nIter=5, warmup=1)
    cpuThroughput = gridPointsPerSweep * 5 / wallCpu

    print(json.dumps({
        'metric': 'mali_fs_gridpoint_updates_per_sec',
        'value': throughput,
        'unit': 'gridpoints/s',
        'vs_baseline': throughput / cpuThroughput,
        'device': str(dev),
        'config': 'FALC-500, H6+CaII, 5 rays, Nlam=%d, 50 iters, '
                  'state=%s accum=%s'
                  % (ctx.cfg.Nlam, np.dtype(ctx.dtype).name,
                     np.dtype(ctx.accumDtype).name),
        'wall_s_per_iter': wall / nIter,
    }))


if __name__ == '__main__':
    main()
