"""Validate + time the fused Pallas depth-sweep FS on the real TPU.

Records, as JSON lines:
  A. XLA-vs-Pallas-sweep iteration identity (J/I/Gamma) at f32 state
     (mixed precision) on a small FAL-C H+Ca problem, compiled Mosaic;
  B. bench.py-problem timing race (FALC-500, H6+CaII, 5 rays, mixed):
     recurrenceMode 'parallel' (XLA associative scan) vs 'pallas'
     (fused Mosaic sweep), and 'pallas' sweep + 'mali_full_precond_pallas'
     Gamma scheme combined.

Run detached (Mosaic remote compile through the tunnel is slow):
  nohup python scripts/sweep_tpu_validate.py > /tmp/sweep_validate.log 2>&1 &
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax

jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp


def log(**kw):
    print(json.dumps(kw), flush=True)


def build_small_ctx(dtype, Nk=24, recurrenceMode='scan'):
    from lightweaver_tpu.atmosphere import Atmosphere
    from lightweaver_tpu.atomic_set import RadiativeSet
    from lightweaver_tpu.context import Context
    from lightweaver_tpu.fal import Falc82
    from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom

    full = Falc82()
    idx = np.unique(np.linspace(0, 81, Nk).astype(int))
    atmos = Atmosphere(height=full.height[idx],
                       temperature=full.temperature[idx],
                       vlos=full.vlos[idx], vturb=full.vturb[idx],
                       ne=full.ne[idx], nHTot=full.nHTot[idx])
    atmos.quadrature(3)
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('H', 'Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    return Context(atmos, spect, eqPops, dtype=dtype,
                   recurrenceMode=recurrenceMode)


def max_scaled_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    scale = max(np.max(np.abs(b)), 1e-300)
    return float(np.max(np.abs(a - b)) / scale)


def identity_check(dtype):
    import dataclasses

    from lightweaver_tpu.context import build_iteration_fn
    t0 = time.perf_counter()
    ctx = build_small_ctx(dtype)
    for _ in range(3):
        ctx.formal_sol_gamma_matrices()
        ctx.stat_equil()
    ctx.formal_sol_gamma_matrices()
    log(stage='identity:warmed', s=round(time.perf_counter() - t0, 1))
    params = dict(ctx._params)
    outs = {}
    for mode in ('parallel', 'pallas'):
        cfg = dataclasses.replace(ctx.cfg, recurrenceMode=mode)
        t0 = time.perf_counter()
        it = jax.jit(build_iteration_fn(cfg))
        res = it(params)
        jax.block_until_ready(res['J'])
        outs[mode] = res
        log(stage=f'identity:{mode}:done',
            compile_and_run_s=round(time.perf_counter() - t0, 1))
    x, p = outs['parallel'], outs['pallas']
    errs = {
        'J': max_scaled_err(p['J'], x['J']),
        'I': max_scaled_err(p['I'], x['I']),
        'Gamma': max(max_scaled_err(p['Gamma'][ai], x['Gamma'][ai])
                     for ai in range(len(x['Gamma']))),
    }
    log(stage='identity:errs', errs=errs, backend=jax.default_backend())
    return errs


def bench_race(nIter=50):
    from bench import build_ctx, time_iterations
    results = {}
    cases = [
        ('parallel', None),
        ('pallas', None),
        ('pallas', 'mali_full_precond_pallas'),
    ]
    for mode, scheme in cases:
        tag = mode + ('' if scheme is None else '+pallasGamma')
        try:
            ctx = build_ctx(dtype=jnp.float32)
            if mode != 'parallel':
                ctx._swap_cfg(recurrenceMode=mode)
            if scheme is not None:
                ctx.set_fs_iter_scheme(scheme)
            log(stage='bench:start', case=tag)
            t0 = time.perf_counter()
            wall = time_iterations(ctx, nIter=nIter)
            results[tag] = wall / nIter * 1e3
            log(stage='bench', case=tag,
                ms_per_iter=round(wall / nIter * 1e3, 3),
                total_incl_compile_s=round(time.perf_counter() - t0, 1))
        except Exception as e:
            log(stage='bench', case=tag, error=repr(e)[:800])
    return results


def main():
    log(device=str(jax.devices()[0]), backend=jax.default_backend())
    try:
        errs = identity_check(jnp.float32)
        ok = all(v < 5e-5 for v in errs.values())
        log(stage='identity:verdict', ok=ok)
    except Exception as e:
        log(stage='identity:verdict', ok=False, error=repr(e)[:800])

    res = bench_race()
    if 'parallel' in res and 'pallas' in res:
        log(stage='bench:verdict',
            speedup=round(res['parallel'] / res['pallas'], 3))


if __name__ == '__main__':
    main()
