"""Validate + time the fused Pallas Gamma scheme on the real TPU.

Round-3 verdict ask #1: the kernel (ops/pallas_gamma.py) was only ever
run in interpreter mode off-TPU.  This script runs COMPILED Mosaic on
the real chip and records, as JSON lines:

  A. XLA-vs-Pallas identity (Gamma/rates/J/I) at f32 state on a small
     FAL-C H+Ca problem;
  B. the same at f64 state (expected to fail to lower: Mosaic has no
     f64 vector support — recorded either way);
  C. scheme timing race on the bench.py problem (FALC-500, H6+CaII,
     5 rays): XLA vs Pallas ms/iter at f32 state.

Run detached (Mosaic remote compile through the tunnel is slow):
  nohup python scripts/pallas_tpu_validate.py > /tmp/pallas_validate.log 2>&1 &
"""
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax

# x64 so f64-state configs are real f64 (emulated on TPU) and f32-state
# configs get the documented f64 accumDtype (mixed precision)
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp


def log(**kw):
    print(json.dumps(kw), flush=True)


def build_small_ctx(dtype, Nk=24, active=('H', 'Ca')):
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
    rs.set_active(*active)
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    return Context(atmos, spect, eqPops, dtype=dtype)


def max_scaled_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    scale = max(np.max(np.abs(b)), 1e-300)
    return float(np.max(np.abs(a - b)) / scale)


def identity_check(tag, dtype):
    from lightweaver_tpu.context import build_iteration_fn
    t0 = time.perf_counter()
    ctx = build_small_ctx(dtype)
    log(stage=f'identity:{tag}:ctx_built', s=round(time.perf_counter()-t0, 1))
    for _ in range(3):
        ctx.formal_sol_gamma_matrices()
        ctx.stat_equil()
    ctx.formal_sol_gamma_matrices()
    log(stage=f'identity:{tag}:warmed', s=round(time.perf_counter()-t0, 1))
    params = dict(ctx._params)
    outs = {}
    for scheme in ('mali_full_precond', 'mali_full_precond_pallas'):
        cfg = dataclasses.replace(ctx.cfg, fsIterScheme=scheme)
        t0 = time.perf_counter()
        it = jax.jit(build_iteration_fn(cfg))
        res = it(params)
        jax.block_until_ready(res['J'])
        outs[scheme] = (res, time.perf_counter() - t0)
        log(stage=f'identity:{tag}:{scheme}:done',
            compile_and_run_s=round(time.perf_counter() - t0, 1))
    x, p = outs['mali_full_precond'][0], outs['mali_full_precond_pallas'][0]
    errs = {
        'J': max_scaled_err(p['J'], x['J']),
        'I': max_scaled_err(p['I'], x['I']),
        'Gamma': max(max_scaled_err(p['Gamma'][ai], x['Gamma'][ai])
                     for ai in range(len(x['Gamma']))),
        'Rij': max(max_scaled_err(p['Rij'][ai][ti], x['Rij'][ai][ti])
                   for ai in range(len(x['Rij']))
                   for ti in range(len(x['Rij'][ai]))),
        'Rji': max(max_scaled_err(p['Rji'][ai][ti], x['Rji'][ai][ti])
                   for ai in range(len(x['Rji']))
                   for ti in range(len(x['Rji'][ai]))),
    }
    log(stage=f'identity:{tag}', errs=errs,
        compile_s_xla=round(outs['mali_full_precond'][1], 1),
        compile_s_pallas=round(outs['mali_full_precond_pallas'][1], 1),
        backend=jax.default_backend())
    return errs


def bench_race(dtype, nIter=50):
    from bench import build_ctx, time_iterations
    results = {}
    for scheme in ('mali_full_precond', 'mali_full_precond_pallas'):
        ctx = build_ctx(dtype=dtype)
        if scheme != 'mali_full_precond':
            ctx.set_fs_iter_scheme(scheme)
        log(stage='bench:start', scheme=scheme)
        t0 = time.perf_counter()
        wall = time_iterations(ctx, nIter=nIter)
        results[scheme] = wall / nIter * 1e3
        log(stage='bench', scheme=scheme,
            ms_per_iter=round(wall / nIter * 1e3, 3),
            total_incl_compile_s=round(time.perf_counter() - t0, 1))
    return results


def main():
    log(device=str(jax.devices()[0]), backend=jax.default_backend())

    # A: f32-state identity, compiled Mosaic on the TPU
    try:
        errs = identity_check('f32_state', jnp.float32)
        ok = all(v < 5e-5 for v in errs.values())
        log(stage='identity:f32_state:verdict', ok=ok)
    except Exception as e:
        log(stage='identity:f32_state:verdict', ok=False,
            error=repr(e)[:800])

    # B: timing race on the bench problem (the headline number)
    try:
        res = bench_race(jnp.float32)
        log(stage='bench:verdict',
            speedup=round(res['mali_full_precond']
                          / res['mali_full_precond_pallas'], 3))
    except Exception as e:
        log(stage='bench:verdict', error=repr(e)[:800])

    # C: f64-state attempt (Mosaic f64 support is not expected)
    try:
        errs = identity_check('f64_state', jnp.float64)
        ok = all(v < 1e-12 for v in errs.values())
        log(stage='identity:f64_state:verdict', ok=ok)
    except Exception as e:
        log(stage='identity:f64_state:verdict', ok=False,
            error=repr(e)[:800])


if __name__ == '__main__':
    main()
