"""Stage-level timing of the MALI iteration on the current default device.

Times, on the bench.py problem (FAL-C 500 depths, H6+CaII, 5 rays,
Nlam=1046): the gather stage, gather+formal-solve, the lambda-iteration
(no Gamma/rates), and the full iteration -- for several precision
configurations. Prints one JSON line per measurement so the hot stage
and the cost of f64-emulated accumulation are measurable rather than
guessed.

Run detached (TPU remote compile is slow):
  nohup python scripts/tpu_breakdown.py > /tmp/breakdown.log 2>&1 &
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

# match the driver bench environment (BENCH_r03: state=f32 accum=f64)
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp

from bench import build_ctx


def timeit(fn, *args, warmup=2, reps=50):
    """Steady-state throughput per call: reps must be LARGE (>=50).
    The axon tunnel adds ~40-50 ms round-trip latency per dispatch that
    async pipelining hides; blocking per call (or small rep counts)
    measures the tunnel, not the device (probe: bench-path 4.2 ms/iter
    vs 44 ms/iter when blocking every call, round 3)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def report(name, ms):
    print(json.dumps({'stage': name, 'ms': round(ms, 3)}), flush=True)


def prepared_ctx(**ctxKwargs):
    ctx = build_ctx(**ctxKwargs)
    ctx.formal_sol_gamma_matrices()      # populates _params / _iter_fn
    return ctx


def breakdown(tag, ctx, accumDtype=None):
    from lightweaver_tpu.context import build_iteration_fn
    cfg = ctx.cfg
    if accumDtype is not None:
        import copy
        cfg = copy.copy(cfg)
        cfg.accumDtype = accumDtype
    it = build_iteration_fn(cfg)
    params = dict(ctx._params)

    from lightweaver_tpu.context import _cast_params_to_working

    gather = jax.jit(
        lambda p: it.gather(_cast_params_to_working(p, cfg.dtype)))

    def _gfs(p):
        p = _cast_params_to_working(p, cfg.dtype)
        scaJ = p['bgSca'] * p['J'].astype(cfg.dtype)
        # scaJ folded into the gather per segment (round 5): the second
        # return IS srcNum in either layout
        chiTot, srcNum = it.gather(p, scaJ)
        if chiTot.ndim == 4 and chiTot.shape[0] == 2:
            # direction-major sweep layout [2, LPad, Nmu, NkL]: the
            # Mosaic sweep divides S = srcNum/chi in VMEM
            return it.formal_solve(p, chiTot, srcNum)
        S = srcNum / chiTot
        return it.formal_solve(p, chiTot, S)
    gfs = jax.jit(_gfs)

    lam_it = jax.jit(lambda p: it(p, lambdaIterate=True))
    full = jax.jit(lambda p: it(p))

    def cost(jfn, name, t):
        try:
            ca = jfn.lower(params).compile().cost_analysis()
            ba = ca.get('bytes accessed', None) if ca else None
            fl = ca.get('flops', None) if ca else None
            print(json.dumps({'stage': f'{tag}:{name}:cost',
                              'bytes_accessed': ba, 'flops': fl,
                              'achieved_GBps': (None if not ba or not t else
                                                round(ba / t / 1e9, 1))}),
                  flush=True)
        except Exception as e:
            print(json.dumps({'stage': f'{tag}:{name}:cost',
                              'error': str(e)}), flush=True)

    # order: most-important rows first — the standalone gather/gfs
    # closures compile into very large XLA programs under the sliced
    # gather (every segment a private subgraph) and the remote compile
    # can take tens of minutes or hang the tunnel; a stall there must
    # not cost the full/lambda_iterate rows.  Filter stages with e.g.
    # BREAKDOWN_STAGES=full,lambda_iterate.
    import os
    stages = os.environ.get('BREAKDOWN_STAGES',
                            'full,lambda_iterate,gather+fs,gather')
    stageFns = {'full': full, 'lambda_iterate': lam_it,
                'gather+fs': gfs, 'gather': gather}
    for name in stages.split(','):
        fn = stageFns[name.strip()]
        t = timeit(fn, params)
        report(f'{tag}:{name}', 1e3 * t)
        cost(fn, name, t)


def breakdown_scheme(tag, ctx, scheme):
    """Full-iteration timing under a named fsIterScheme."""
    import dataclasses

    from lightweaver_tpu.context import build_iteration_fn
    cfg = dataclasses.replace(ctx.cfg, fsIterScheme=scheme)
    it = build_iteration_fn(cfg)
    params = dict(ctx._params)
    full = jax.jit(lambda p: it(p))
    t = timeit(full, params)
    report(f'{tag}:full', 1e3 * t)


def run_tag(tag):
    """One breakdown tag (so a driver can subprocess each with a
    timeout: large fresh remote compiles through the axon tunnel
    occasionally hang forever)."""
    if tag == 'mixed':
        # the XLA general path ('parallel' recurrence, exact accum)
        breakdown('mixed', prepared_ctx(dtype=jnp.float32, fast=False))
    elif tag == 'pallas_blocked':
        # the shipped fast path (bench.py default on TPU): fused Pallas
        # depth sweep + blocked Gamma/rate lambda accumulation
        breakdown('pallas_blocked', prepared_ctx(dtype=jnp.float32,
                                                 fast=True))
    elif tag == 'f32accum':
        # f32 accumulation (numerics would stall in production; this
        # isolates the cost of the f64-emulated contractions)
        breakdown('f32accum', prepared_ctx(dtype=jnp.float32, fast=False),
                  accumDtype=jnp.float32)
    elif tag == 'mixed_fused':
        # the fused lambda-step scheme (assembly+FS+J in one kernel)
        breakdown_scheme('mixed_fused',
                         prepared_ctx(dtype=jnp.float32, fast=True),
                         'mali_full_precond_fused')
    elif tag == 'mixed_pallas':
        # the fused Pallas Gamma scheme at the benched mixed precision
        breakdown_scheme('mixed_pallas',
                         prepared_ctx(dtype=jnp.float32, fast=False),
                         'mali_full_precond_pallas')
    elif tag == 'f64':
        breakdown('f64', prepared_ctx(dtype=jnp.float64))
    else:
        raise ValueError(tag)


ALL_TAGS = ['pallas_blocked', 'mixed', 'f32accum', 'mixed_fused',
            'mixed_pallas', 'f64']

if __name__ == '__main__':
    print(json.dumps({'device': str(jax.devices()[0])}), flush=True)
    for tag in (sys.argv[1:] or ALL_TAGS):
        run_tag(tag)
