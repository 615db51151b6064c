"""The honest benchmark set (round-4 verdict ask #3), committed as
BENCH_HONEST_r05.json:

  A. bench.py-problem ms/iter (FALC-500, H6+CaII, 5 rays, 50 iters) for
     full f64, mixed (f32 state + f64 accum, the headline config), mixed
     with gammaAccum='blocked', and the shipped fast path (fused Pallas
     depth sweep + blocked Gamma);
  B. wall time to CONVERGED FAL-C populations on the canonical problem
     (FAL-C 82-pt, H6+CaII, 5 rays, iterate_ctx_se defaults: Nscatter=3,
     JTol=5e-3, popsTol=1e-3 — BASELINE.md) for f64 and mixed, with
     iteration counts, plus the mixed/blocked convergence caveat stated
     machine-readably.

Run on the real TPU:  nohup python scripts/honest_bench.py > log &
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


def bench_ms_interleaved(specs, nIter=50, rounds=3):
    """Time all stage-A configurations INTERLEAVED: the axon chip is
    shared and drifts up to ~2x on minute timescales, so sequential
    per-config timing tells a false relative story; alternating
    50-iteration blocks exposes every config to the same drift.
    Returns {tag: best ms/iter}."""
    import time

    import jax

    from bench import build_ctx
    ctxs = {}
    for tag, dtype, acc, fast in specs:
        ctx = build_ctx(dtype=dtype, fast=fast)
        if acc != 'exact' and not fast:
            ctx._swap_cfg(gammaAccum=acc)
        for _ in range(2):                      # warm compile + pipeline
            ctx.formal_sol_gamma_matrices()
        jax.block_until_ready(ctx.J)
        ctxs[tag] = ctx
    best = {tag: float('inf') for tag in ctxs}
    for _ in range(rounds):
        for tag, ctx in ctxs.items():
            t0 = time.perf_counter()
            for _ in range(nIter):
                ctx.formal_sol_gamma_matrices()
            jax.block_until_ready(ctx.J)
            best[tag] = min(best[tag],
                            (time.perf_counter() - t0) / nIter * 1e3)
    return best


def converge_falc(dtype, fast=False):
    import lightweaver_tpu as lw
    from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom
    atmos = lw.Falc82()
    atmos.quadrature(5)
    rs = lw.RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('H', 'Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    kw = (dict(recurrenceMode='pallas', gammaAccum='blocked') if fast
          else {})
    ctx = lw.Context(atmos, spect, eqPops, dtype=dtype, **kw)
    # warm the compile so the wall time measures iteration, not XLA
    ctx.formal_sol_gamma_matrices()
    ctx2 = lw.Context(atmos, spect, rs.compute_eq_pops(atmos),
                      dtype=dtype, **kw)
    t0 = time.perf_counter()
    nIter = lw.iterate_ctx_se(ctx2, quiet=True)
    wall = time.perf_counter() - t0
    return wall, int(nIter)


def converge_falc_on_device(dtype, fast=False):
    import lightweaver_tpu as lw
    from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom
    atmos = lw.Falc82()
    atmos.quadrature(5)
    rs = lw.RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('H', 'Ca')
    spect = rs.compute_wavelength_grid()
    kw = (dict(recurrenceMode='pallas', gammaAccum='blocked') if fast
          else {})
    ctx = lw.Context(atmos, spect, rs.compute_eq_pops(atmos),
                     dtype=dtype, **kw)
    # warm the compiled loop on THIS context (a fresh Context owns a
    # fresh jit, so even a cache-hit "compile" costs remote-tunnel
    # minutes), snapshot -> warm -> restore -> time
    import jax
    J0 = jnp.array(ctx.J)
    n0 = [jnp.array(st['n']) for st in ctx.popsState]
    ctx.iterate_on_device(NmaxIter=500)
    ctx.J = J0
    for st, n in zip(ctx.popsState, n0):
        st['n'] = n
        st.pop('nLastSE', None)
    jax.block_until_ready(ctx.J)
    t0 = time.perf_counter()
    nIter, dJ, dPops = ctx.iterate_on_device(NmaxIter=500)
    wall = time.perf_counter() - t0
    return wall, int(nIter)


def main():
    stages = set(sys.argv[1:]) or {'A', 'B', 'OD'}
    dev = jax.devices()[0]
    prev = Path(__file__).parent.parent / 'BENCH_HONEST_r05.json'
    merged = json.loads(prev.read_text()) if prev.exists() else {}
    out = {'device': str(dev),
           'problemA': 'FALC-500 H6+CaII 5 rays Nlam=1046, 50 iters',
           'problemB': 'FAL-C 82-pt H6+CaII 5 rays, iterate_ctx_se '
                       'defaults (JTol=5e-3, popsTol=1e-3, Nscatter=3)',
           'convergence_caveats': {
               'mixed': 'f32 state + f64 Gamma/rate accumulation + '
                        'compensated Ieff: converges BASELINE configs '
                        '1-2 to popsTol 1e-3 (dJ floor ~4e-3); stiff '
                        'deep-UV H-active problems at few-ray '
                        'quadratures can stall near dJ ~1e-2 '
                        '(test_mixed_precision.py); f64 is the default '
                        'and converges everything the reference does',
               'mixed_blockedGamma': 'gammaAccum=blocked raises the dJ '
                                     'floor to ~8e-3 (dPops < 1e-3 '
                                     'intact, test_gamma_accum.py); '
                                     'opt-in performance mode',
           }}
    # merge previously captured sections when re-running a subset
    for k in ('ms_per_iter', 'falc_converged', 'timing_note'):
        if k in merged:
            out[k] = merged[k]
    specs = (('f64', None, 'exact', False),
             ('mixed', jnp.float32, 'exact', False),
             ('mixed_blockedGamma', jnp.float32, 'blocked', False),
             ('fast_pallas_blocked', jnp.float32, 'blocked', True))
    if 'A' in stages:
        try:
            best = bench_ms_interleaved(specs)
            out['ms_per_iter'] = {t: round(v, 3) for t, v in best.items()}
            out['timing_note'] = ('interleaved 50-iteration blocks, best '
                                  'of 3 rounds per config (shared chip '
                                  'drifts up to ~2x on minute timescales)')
            for t, v in best.items():
                log(stage='A', tag=t, ms_per_iter=round(v, 3))
        except Exception as e:
            log(stage='A', error=repr(e)[:300])
    if 'B' in stages:
        for tag, dtype, fast in (('f64', None, False),
                                 ('mixed', jnp.float32, False),
                                 ('fast_pallas_blocked', jnp.float32,
                                  True)):
            try:
                wall, iters = converge_falc(dtype, fast=fast)
                out.setdefault('falc_converged', {})[tag] = {
                    'wall_s': round(wall, 2), 'iterations': iters}
                log(stage='B', tag=tag, wall_s=round(wall, 2),
                    iters=iters)
            except Exception as e:
                log(stage='B', tag=tag, error=repr(e)[:300])
    if 'OD' in stages:
        # the TPU-native loop: the whole convergence iteration as ONE
        # lax.while_loop dispatch (zero device->host fetches; the host
        # loop above pays ~30 ms of axon-tunnel latency per fetch)
        for tag, dtype, fast in (('f64_on_device', None, False),
                                 ('fast_on_device', jnp.float32, True)):
            try:
                wall, iters = converge_falc_on_device(dtype, fast=fast)
                out.setdefault('falc_converged', {})[tag] = {
                    'wall_s': round(wall, 2), 'iterations': iters}
                log(stage='B', tag=tag, wall_s=round(wall, 2),
                    iters=iters)
            except Exception as e:
                log(stage='B', tag=tag, error=repr(e)[:300])
    p = Path(__file__).parent.parent / 'BENCH_HONEST_r05.json'
    p.write_text(json.dumps(out, indent=1))
    log(wrote=str(p))


if __name__ == '__main__':
    main()
