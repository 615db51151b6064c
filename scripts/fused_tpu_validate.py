"""Validate + time the fused Pallas lambda-iteration scheme on the
real TPU (compiled Mosaic, not interpreter).

A. Library-surface end-to-end: converge a reduced FAL-C H+Ca problem
   through the public API under the XLA scheme and under
   'mali_full_precond_fused', compare converged populations/J, and
   check physics invariants (J = angular mean of I; emergent Ca II K
   profile has an absorption core; thermalised deep intensity ~ Planck).
B. bench.py-problem timing: fused scheme at mixed precision with
   gammaAccum='blocked' vs the current best (pallas sweep + blocked).

Run detached:
  nohup python scripts/fused_tpu_validate.py > /tmp/fused_validate.log 2>&1 &
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


def build_small(dtype, scheme=None):
    """Full 82-pt FAL-C, 5-ray quadrature: the canonical problem that
    mixed precision fully converges (BASELINE configs 1-2)."""
    from lightweaver_tpu.atomic_set import RadiativeSet
    from lightweaver_tpu.context import Context
    from lightweaver_tpu.fal import Falc82
    from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom

    atmos = Falc82()
    atmos.quadrature(5)
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('H', 'Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    kw = {} if scheme is None else {'fsIterScheme': scheme}
    ctx = Context(atmos, spect, eqPops, dtype=dtype, **kw)
    return ctx, rs, spect


def converge(ctx, maxIter=300, tol=1e-3):
    from lightweaver_tpu.iterate_ctx import iterate_ctx_se
    n = iterate_ctx_se(ctx, popsTol=tol, quiet=True, NmaxIter=maxIter)
    return int(n)


def surface_check(dtype, tag):
    t0 = time.perf_counter()
    ctxX, _, spect = build_small(dtype)
    nX = converge(ctxX)
    ctxF, _, _ = build_small(dtype, scheme='mali_full_precond_fused')
    nF = converge(ctxF)
    log(stage=f'{tag}:converged', xla_iters=nX, fused_iters=nF,
        s=round(time.perf_counter() - t0, 1))
    popsErr = max(
        float(np.max(np.abs(np.asarray(sf['n']) - np.asarray(sx['n']))
                     / np.abs(np.asarray(sx['n']))))
        for sf, sx in zip(ctxF.popsState, ctxX.popsState))
    Jx, Jf = np.asarray(ctxX.J), np.asarray(ctxF.J)
    jErr = float(np.max(np.abs(Jf - Jx) / np.maximum(np.abs(Jx), 1e-30)))
    log(stage=f'{tag}:agreement', pops_rel=popsErr, J_rel=jErr)

    # physics invariants on the fused context
    u = ctxF.formal_sol_gamma_matrices()
    lam = np.asarray(spect.wavelength)
    I = np.asarray(ctxF.I)              # [Nlam, Nmu] emergent
    # Ca II K core (393.48 nm) must be darker than its near wings
    w = np.argmin(np.abs(lam - 393.4777))
    wing = np.argmin(np.abs(lam - 393.3))
    coreDark = bool(I[w, -1] < I[wing, -1])
    # deep thermalisation: the reddest continuum intensity within ~20%
    # of Planck at the deepest temperature
    from lightweaver_tpu.ops.planck import planck_nu
    T = np.asarray(ctxF.atmos.temperature)
    Bdeep = float(planck_nu(T[-1], jnp.asarray(lam[-1])))
    thermal = float(I[-1, -1]) / Bdeep
    log(stage=f'{tag}:invariants', caII_core_dark=coreDark,
        deep_I_over_planck=round(thermal, 3),
        dJ=float(u.dJMax))
    ok = coreDark and 0.5 < thermal < 1.5 and popsErr < 5e-3
    log(stage=f'{tag}:verdict', ok=bool(ok))
    return ok


def bench_race(nIter=50):
    from bench import build_ctx, time_iterations
    res = {}
    for tag, kw in (
            ('pallas_blocked', dict(recurrenceMode='pallas',
                                    gammaAccum='blocked')),
            ('fused_blocked', dict(fsIterScheme='mali_full_precond_fused',
                                   gammaAccum='blocked')),
            ('fused_exact', dict(fsIterScheme='mali_full_precond_fused'))):
        try:
            ctx = build_ctx(dtype=jnp.float32)
            ctx._swap_cfg(**kw)
            t0 = time.perf_counter()
            wall = time_iterations(ctx, nIter=nIter)
            res[tag] = wall / nIter * 1e3
            log(stage='bench', case=tag,
                ms_per_iter=round(wall / nIter * 1e3, 3),
                total_incl_compile_s=round(time.perf_counter() - t0, 1))
        except Exception as e:
            log(stage='bench', case=tag, error=repr(e)[:800])
    return res


def main():
    log(device=str(jax.devices()[0]), backend=jax.default_backend())
    try:
        surface_check(jnp.float32, 'mixed')
    except Exception as e:
        log(stage='mixed:verdict', ok=False, error=repr(e)[:800])
    # f64 is NOT validated on TPU: Mosaic has no 64-bit vectors, so the
    # fused scheme is mixed-precision-only on the real chip (the CPU
    # interpreter tests cover its f64 numerics).
    bench_race()


if __name__ == '__main__':
    main()
