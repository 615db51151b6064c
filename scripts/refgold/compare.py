"""Quick comparison of lightweaver_tpu outputs vs the golden-reference driver.

Run after export_inputs.py + refgold_driver. Prints max relative errors per
artifact; used interactively before the formal pytest was added.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import numpy as np  # noqa: E402

from export_inputs import build_ctx  # noqa: E402
from lightweaver_tpu.iterate_ctx import iterate_ctx_se  # noqa: E402


def relerr(a, b, floor=0.0):
    a = np.asarray(a)
    b = np.asarray(b)
    denom = np.maximum(np.abs(b), np.abs(b).max() * 1e-30 + floor)
    return np.abs(a - b) / denom


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else 'scripts/refgold/outputs'
    load = lambda n: np.load(os.path.join(outdir, n + '.npy'))

    ctx = build_ctx('falc_h6ca')

    # --- profiles ---
    for ia, a in enumerate(ctx.activeAtoms):
        for it, t in enumerate(a.trans):
            if not t.isLine:
                continue
            tag = f'a{ia}t{it}'
            phiRef = load(f'out_phi_{tag}')
            wphiRef = load(f'out_wphi_{tag}')
            phi = np.asarray(ctx.phi[ia][it])
            wphi = np.asarray(ctx.wphi[ia][it])
            print(f'phi {tag}: rel {relerr(phi, phiRef).max():.3e}  '
                  f'wphi rel {relerr(wphi, wphiRef).max():.3e}')

    # --- background (basic_background C++ part vs our components) ---
    # Reference bb excludes Rayleigh and passive-atom bf (Cython-side);
    # compare against our decomposed parts if exposed, else skip detail.
    bbChi = load('out_bb_chi')
    bbEta = load('out_bb_eta')
    bbSca = load('out_bb_sca')
    print(f'bb_chi range {bbChi.min():.3e}..{bbChi.max():.3e} (loaded; '
          'component-level comparison in pytest)')

    # --- 1-iteration comparison ---
    JRef1 = load('out_J_iter1')
    IRef1 = load('out_I_iter1')
    upd = ctx.formal_sol_gamma_matrices()
    J1 = np.asarray(ctx.J)
    I1 = np.asarray(ctx.I)
    print(f'J iter1: rel {relerr(J1, JRef1).max():.3e}')
    print(f'I iter1: rel {relerr(I1, IRef1).max():.3e}')
    for ia in range(len(ctx.activeAtoms)):
        GRef = load(f'out_Gamma_iter1_a{ia}')
        G = np.asarray(ctx._Gamma[ia])
        scale = np.abs(GRef).max(axis=(0, 1), keepdims=True)
        err = np.abs(G - GRef) / np.maximum(np.abs(GRef), 1e-10 * scale)
        print(f'Gamma iter1 atom{ia}: rel {err.max():.3e} '
              f'(@{np.unravel_index(err.argmax(), err.shape)})')

    # --- converged comparison ---
    ctx2 = build_ctx('falc_h6ca')
    nIter = iterate_ctx_se(ctx2, NmaxIter=500, quiet=True)
    print(f'ours converged in {nIter} iterations '
          f'(ref: {int(load("out_niter")[0])})')
    for ia in range(len(ctx2.activeAtoms)):
        popsRef = load(f'out_pops_a{ia}')
        pops = np.asarray(ctx2.popsState[ia]['n'])
        print(f'pops atom{ia}: rel {relerr(pops, popsRef).max():.3e}')
    JRef = load('out_J')
    IRef = load('out_I')
    print(f'J converged: rel {relerr(np.asarray(ctx2.J), JRef).max():.3e}')
    print(f'I converged: rel {relerr(np.asarray(ctx2.I), IRef).max():.3e}')


if __name__ == '__main__':
    main()
