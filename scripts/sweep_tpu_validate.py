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
    """Compare the f32 XLA and f32 Pallas-sweep iterations EACH against
    the f64 XLA iteration on the same state: two f32 implementations
    with different operation orderings legitimately differ from each
    other at the f32 noise floor of this computation (dJ floor ~4e-3,
    CLAUDE.md); the meaningful assertion is that the Pallas sweep is no
    further from f64 truth than the XLA f32 path."""
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
    for tag, mode, dt in (('xla32', 'parallel', None),
                          ('pallas32', 'pallas', None),
                          ('xla64', 'parallel', jnp.float64)):
        cfg = dataclasses.replace(ctx.cfg, recurrenceMode=mode,
                                  **({} if dt is None else {'dtype': dt}))
        t0 = time.perf_counter()
        it = jax.jit(build_iteration_fn(cfg))
        res = it(params)
        jax.block_until_ready(res['J'])
        outs[tag] = res
        log(stage=f'identity:{tag}:done',
            compile_and_run_s=round(time.perf_counter() - t0, 1))
    ref = outs['xla64']

    def errs_vs_ref(r):
        return {
            'J': max_scaled_err(r['J'], ref['J']),
            'I': max_scaled_err(r['I'], ref['I']),
            'Gamma': max(max_scaled_err(r['Gamma'][ai], ref['Gamma'][ai])
                         for ai in range(len(ref['Gamma']))),
        }
    eX = errs_vs_ref(outs['xla32'])
    eP = errs_vs_ref(outs['pallas32'])
    log(stage='identity:errs', xla32_vs_f64=eX, pallas32_vs_f64=eP,
        backend=jax.default_backend())
    # ok: pallas no worse than ~3x the XLA-f32 error on every output
    return {k: eP[k] / max(eX[k], 1e-300) for k in eP}


def bench_race(nIter=50):
    from bench import build_ctx, time_iterations
    results = {}
    cases = [
        ('parallel', None, 'exact'),
        ('pallas', None, 'exact'),
        ('parallel', None, 'blocked'),
        ('pallas', None, 'blocked'),
        ('pallas', 'mali_full_precond_pallas', 'exact'),
    ]
    for mode, scheme, acc in cases:
        tag = (mode + ('' if scheme is None else '+pallasGamma')
               + ('' if acc == 'exact' else '+blockedAccum'))
        try:
            ctx = build_ctx(dtype=jnp.float32)
            if mode != 'parallel' or acc != 'exact':
                ctx._swap_cfg(recurrenceMode=mode, gammaAccum=acc)
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
        ratios = identity_check(jnp.float32)
        ok = all(v < 3.0 for v in ratios.values())
        log(stage='identity:verdict', ok=ok, pallas_over_xla32=ratios)
    except Exception as e:
        log(stage='identity:verdict', ok=False, error=repr(e)[:800])

    res = bench_race()
    if 'parallel' in res and 'pallas' in res:
        log(stage='bench:verdict',
            speedup=round(res['parallel'] / res['pallas'], 3))


if __name__ == '__main__':
    main()
