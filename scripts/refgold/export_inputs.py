"""Export the FAL-C H_6 + Ca II problem from lightweaver_tpu in the array
format consumed by the golden-reference driver (driver.cpp).

Both sides then consume byte-identical derived inputs (atmosphere, collision
matrices, damping parameters, background, initial populations), so any output
difference isolates the radiative-transfer core: profiles, uv, formal solve,
Gamma accumulation, and statistical equilibrium.

Run: JAX_PLATFORMS=cpu python scripts/refgold/export_inputs.py <outdir> [config]
Configs: falc_h6ca (default; H_6 + Ca II both active, 5 rays, bezier3);
falc_h6mg_prd (H_6 + Mg II active with Ly-alpha/beta and h&k in PRD --
BASELINE config 3); bench500 (the bench.py timing problem).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import numpy as np  # noqa: E402

from lightweaver_tpu.atomic_set import RadiativeSet  # noqa: E402
from lightweaver_tpu.context import Context  # noqa: E402
from lightweaver_tpu.fal import Falc82  # noqa: E402
from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom  # noqa: E402


def build_ctx(config: str):
    if config == 'bench500':
        # the bench.py configuration: FAL-C interpolated to 500 depth
        # points in log column mass (for the reference-CPU ms/iter
        # anchor recorded in bench_baseline.json)
        import bench
        return bench.build_ctx()
    atmos = Falc82()
    atmos.quadrature(5)
    if config == 'falc_h6ca':
        rs = RadiativeSet([H_6_atom(), CaII_atom()])
        rs.set_active('H', 'Ca')
    elif config == 'falc_ca':
        rs = RadiativeSet([H_6_atom(), CaII_atom()])
        rs.set_active('Ca')
    elif config == 'falc_h6mg_prd':
        from lightweaver_tpu.rh_atoms import MgII_atom
        rs = RadiativeSet([H_6_atom(), MgII_atom()])
        rs.set_active('H', 'Mg')
    elif config == 'falc_h6ca_stokes':
        # BASELINE config 4: Zeeman-polarised Ca II in a magnetised FAL-C
        # (uniform 0.1 T field inclined 60 deg, azimuth 30 deg)
        Nk = atmos.Nspace
        atmos.B = np.full(Nk, 0.1)
        atmos.gammaB = np.full(Nk, np.pi / 3)
        atmos.chiB = np.full(Nk, np.pi / 6)
        rs = RadiativeSet([H_6_atom(), CaII_atom()])
        rs.set_active('H', 'Ca')
    else:
        raise ValueError(f'unknown config {config}')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    ctx = Context(atmos, spect, eqPops, formalSolver='piecewise_bezier3_1d')
    return ctx


def export(ctx, outdir, prd=False, stokes=False):
    """prd=True marks PRD lines in the manifest (and exports their elastic
    rates) so the driver runs redistribute_prd_lines; older CRD configs
    (falc_h6ca) keep PRD-typed lines in CRD on both sides.  stokes=True
    exports the magnetic field + per-line Zeeman component tables and
    makes the driver run formal_sol_full_stokes on the converged state."""
    os.makedirs(outdir, exist_ok=True)

    def save(name, arr):
        np.save(os.path.join(outdir, name + '.npy'),
                np.ascontiguousarray(np.asarray(arr, dtype=np.float64)))

    atmos = ctx.atmos
    spect = ctx.spect
    save('z', atmos.height)
    save('temperature', atmos.temperature)
    save('ne', atmos.ne)
    save('vz', atmos.vlos if atmos.vlos is not None else np.zeros(atmos.Nspace))
    save('vturb', atmos.vturb)
    save('nHTot', atmos.nHTot)
    save('muz', atmos.muz)
    save('mux', atmos.mux)
    save('muy', atmos.muy)
    save('wmu', atmos.wmu)
    save('wavelength', spect.wavelength)
    save('bg_chi', ctx.bgChi)
    save('bg_eta', ctx.bgEta)
    save('bg_sca', ctx.bgSca)
    if stokes:
        save('B', atmos.B)
        save('gammaB', atmos.gammaB)
        save('chiB', atmos.chiB)

    # basic_background inputs (reference C++ part: H-, H ff, H2, OH/CH,
    # Thomson; /root/reference/Source/Background.cpp:1264).
    eqPops = ctx.eqPops
    save('bgin_hpops', eqPops['H'])
    save('bgin_hminus', eqPops['H-'])
    for sp, name in (('H2', 'bgin_h2'), ('OH', 'bgin_oh'), ('CH', 'bgin_ch')):
        try:
            save(name, eqPops[sp])
        except LookupError:
            pass

    lines = []
    lines.append(f'Nspace {atmos.Nspace}')
    lines.append(f'Nrays {atmos.Nrays}')
    lines.append(f'Nspect {spect.Nspect}')
    lines.append('Ndim 1')
    lines.append('zLowerBc THERMALISED')
    lines.append('zUpperBc ZERO')
    lines.append('formalSolver piecewise_bezier3_1d')
    lines.append('Nscatter 3')
    lines.append('maxIter 500')
    lines.append('JTol 5e-3')
    lines.append('popsTol 1e-3')
    lines.append('prdSubIter 3')
    lines.append('prdTol 1e-2')
    if stokes:
        lines.append('stokes 1')
    lines.append(f'Natoms {len(ctx.activeAtoms)}')

    for ia, a in enumerate(ctx.activeAtoms):
        pre = f'atom{ia}_'
        st = ctx.popsState[ia]
        modelPops = eqPops.atomicPops[a.model.element]
        save(pre + 'n0', st['n'])
        save(pre + 'nstar', st['nStar'])
        save(pre + 'ntotal', modelPops.nTotal)
        save(pre + 'vbroad', a.model.vBroad(atmos))
        save(pre + 'stages', [l.stage for l in a.model.levels])
        save(pre + 'C', ctx.C[ia])
        lines.append(f'atom {a.Nlevel} {len(a.trans)}')
        for it, t in enumerate(a.trans):
            tpre = pre + f'trans{it}_'
            save(tpre + 'wavelength', t.wavelength)
            ident = (a.model.element, t.i, t.j)
            active = spect.activeWavelengths[ident].astype(np.int8)
            np.save(os.path.join(outdir, tpre + 'active.npy'),
                    np.ascontiguousarray(active))
            if t.isLine:
                save(tpre + 'adamp', ctx.aDamp[ia][it])
                typ = 'LINE'
                flags = ''
                if prd and t.isPrd:
                    # PRD needs the elastic collision rate for Pj + Qj
                    # (ref: Prd.cpp:9-30) -- exported so both sides share it
                    save(tpre + 'qelast', ctx.Qelast[ia][it])
                    flags = ' prd'
                if stokes:
                    line = a.model.lines[
                        [li for li, l in enumerate(a.model.lines)
                         if l.i == t.i and l.j == t.j][0]]
                    z = line.zeeman_components()
                    if z is not None:
                        save(tpre + 'zeeman_alpha', z.alpha)
                        save(tpre + 'zeeman_shift', z.shift)
                        save(tpre + 'zeeman_strength', z.strength)
                lines.append(f'trans {typ} {t.i} {t.j} {t.Aji!r} {t.Bji!r} '
                             f'{t.Bij!r} {t.lambda0!r} {t.Nblue} {t.Nred}'
                             f'{flags}')
            else:
                save(tpre + 'alpha', t.alpha)
                typ = 'CONTINUUM'
                lines.append(f'trans {typ} {t.i} {t.j} 0.0 0.0 0.0 '
                             f'{t.lambda0!r} {t.Nblue} {t.Nred}')

    with open(os.path.join(outdir, 'manifest.txt'), 'w') as f:
        f.write('\n'.join(lines) + '\n')
    print(f'exported to {outdir}: Nspect={spect.Nspect} '
          f'atoms={[a.model.element.name for a in ctx.activeAtoms]}')


if __name__ == '__main__':
    outdir = sys.argv[1] if len(sys.argv) > 1 else 'scripts/refgold/inputs'
    config = sys.argv[2] if len(sys.argv) > 2 else 'falc_h6ca'
    ctx = build_ctx(config)
    export(ctx, outdir, prd=config.endswith('_prd'),
           stokes=config.endswith('_stokes'))
