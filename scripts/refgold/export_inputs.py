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


from lightweaver_tpu.atmosphere import BoundaryCondition  # noqa: E402


class HalfPlanckXBc(BoundaryCondition):
    """Callable x boundary condition for the 2D golden config: incident
    intensity = 0.5 * B_nu(T) of the adjacent boundary column, for every
    ray/direction.  Deterministic and wavelength-scaled so the exported
    bcData exercises the reference's CALLABLE path with physical values.
    (Duplicated in tests/test_vs_reference_golden.py; the packed-input
    staleness check keeps the two in sync.)"""

    def __init__(self, colIdx: int):
        self.colIdx = colIdx

    def compute_bc(self, atmos, spect):
        from lightweaver_tpu.ops.planck import planck_nu
        lam = np.asarray(spect.wavelength)
        T = np.asarray(atmos.temperature).reshape(atmos.Nz, atmos.Nx)
        Tcol = T[:, self.colIdx]
        B = 0.5 * np.asarray(planck_nu(Tcol[None, :], lam[:, None]))
        return np.broadcast_to(B[:, None, None, :],
                               (len(lam), atmos.Nrays, 2, atmos.Nz)).copy()


class RefBugCompatXLower(HalfPlanckXBc):
    """HalfPlanckXBc with the down-direction rows 1..Nx-1 zeroed, which
    reproduces a genuine INDEX-SWAP BUG in the reference's 2D formal
    solvers: the starting-plane boundary loop writes `I(j, k) = 0.0`
    instead of `I(k, j)` (FormalScalar2d.cpp:570 and the BESSER variant),
    so on every DOWN pass the first Nx-1 z-rows of the CALLABLE fixed
    x-lower column are zeroed after the column pre-fill (the up pass only
    corrupts interior cells that the sweep overwrites; periodic and 1D
    configs never hit the callable pre-fill, which is why their goldens
    are clean).  lightweaver_tpu's solver is the *correct* solve --
    verified against a literal numpy transcription of the reference
    algorithm at ~1e-13 per ray -- so the golden test injects this BC to
    reproduce the reference's output exactly while the production default
    (HalfPlanckXBc) keeps the right physics."""

    def compute_bc(self, atmos, spect):
        data = super().compute_bc(atmos, spect)
        data[:, :, 0, 1:atmos.Nx] = 0.0
        return data


def build_2d_atmos():
    """The 2D golden problem's atmosphere: FAL-C subsampled to 30 depths,
    8 columns 40 km apart with a +-5% sinusoidal temperature perturbation
    and a weak shear flow, callable (HalfPlanck) x BCs.  Column spacing is
    chosen so upwind intersections hit BOTH z-planes and x side faces."""
    from lightweaver_tpu.atmosphere import Atmosphere
    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 30).astype(int))
    Nz = len(idx)
    Nx = 8
    x = np.arange(Nx) * 40e3
    pert = 1.0 + 0.05 * np.sin(2 * np.pi * np.arange(Nx) / Nx)
    col = lambda a: np.broadcast_to(a[idx][:, None], (Nz, Nx)).copy()
    T = full.temperature[idx][:, None] * pert[None, :]
    vx = 1e3 * np.sin(2 * np.pi * np.arange(Nx) / Nx)[None, :] \
        * np.ones((Nz, 1))
    atmos = Atmosphere.make_2d(
        height=full.height[idx], x=x, temperature=T,
        vx=vx, vz=col(full.vlos), vturb=col(full.vturb),
        ne=col(full.ne), nHTot=col(full.nHTot),
        xLowerBc=HalfPlanckXBc(0), xUpperBc=HalfPlanckXBc(Nx - 1))
    atmos.quadrature(3)
    return atmos


def build_ctx(config: str):
    if config == 'bench500':
        # the bench.py configuration: FAL-C interpolated to 500 depth
        # points in log column mass (for the reference-CPU ms/iter
        # anchor recorded in bench_baseline.json)
        import bench
        return bench.build_ctx()
    if config in ('falc2d_ca', 'falc2d_ca_besser'):
        # BASELINE config 5 (2D): Ca II active over a horizontally
        # perturbed FAL-C slab with callable x BCs; linear or BESSER 2D
        # solver + interp_linear_2d (the reference defaults) on both sides
        atmos = build_2d_atmos()
        rs = RadiativeSet([H_6_atom(), CaII_atom()])
        rs.set_active('Ca')
        spect = rs.compute_wavelength_grid()
        eqPops = rs.compute_eq_pops(atmos)
        solver = ('piecewise_besser_2d' if config.endswith('besser')
                  else 'piecewise_linear_2d')
        return Context(atmos, spect, eqPops, formalSolver=solver)
    atmos = Falc82()
    atmos.quadrature(5)
    if config in ('falc_h6ca', 'falc_h6ca_nr'):
        rs = RadiativeSet([H_6_atom(), CaII_atom()])
        rs.set_active('H', 'Ca')
    elif config in ('falc_ca', 'falc_ca_timedep'):
        rs = RadiativeSet([H_6_atom(), CaII_atom()])
        rs.set_active('Ca')
    elif config in ('falc_h6mg_prd', 'falc_h6mg_hprd'):
        from lightweaver_tpu.rh_atoms import MgII_atom
        if config.endswith('_hprd'):
            # hybrid PRD needs a macroscopic velocity field: a smooth
            # 0..5 km/s outflow ramp over the FAL-C height grid
            atmos.vlos = 5e3 * (atmos.height - atmos.height.min()) \
                / (atmos.height.max() - atmos.height.min())
        rs = RadiativeSet([H_6_atom(), MgII_atom()])
        rs.set_active('H', 'Mg')
    elif config == 'falc_multi_ng':
        # BASELINE config 2: multi-atom active set (H, Ca II, Na I) with
        # Ng acceleration; Mg II kept passive so its continua enrich the
        # background opacity both sides consume
        from lightweaver_tpu.rh_atoms import MgII_atom, NaI_atom
        rs = RadiativeSet([H_6_atom(), CaII_atom(), NaI_atom(), MgII_atom()])
        rs.set_active('H', 'Ca', 'Na')
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
    ctx = Context(atmos, spect, eqPops, formalSolver='piecewise_bezier3_1d',
                  hprd=config.endswith('_hprd'))
    return ctx


def export(ctx, outdir, prd=False, stokes=False, ngOptions=None,
           hprd=False, timedep=None, conserve=False):
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
    twoD = atmos.Ndim == 2
    if twoD:
        save('z', atmos.zGrid)
        save('x', atmos.x)
        save('vx', atmos.vx)
        save('vz', atmos.vz)
        # callable x BC data, rows ordered muIdx = 2*mu + toObs to match
        # the driver's trivial indexVector
        for bc, name in ((atmos.xLowerBc, 'xlowerbc_data'),
                         (atmos.xUpperBc, 'xupperbc_data')):
            data = bc.compute_bc(atmos, spect)   # [Nlam, Nmu, 2, Nz]
            if data is not None:
                d = np.asarray(data, np.float64)
                save(name, d.reshape(d.shape[0], -1, d.shape[-1]))
    else:
        save('z', atmos.height)
        save('vz', atmos.vlos if atmos.vlos is not None
             else np.zeros(atmos.Nspace))
    save('temperature', atmos.temperature)
    save('ne', atmos.ne)
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
    lines.append(f'Ndim {atmos.Ndim}')
    lines.append('zLowerBc THERMALISED')
    lines.append('zUpperBc ZERO')
    if twoD:
        lines.append(f'Nx {atmos.Nx}')
        lines.append('xLowerBc CALLABLE')
        lines.append('xUpperBc CALLABLE')
        lines.append(f'formalSolver {ctx.cfg.formalSolver}')
        lines.append('interpFn interp_linear_2d')
    else:
        lines.append('formalSolver piecewise_bezier3_1d')
    lines.append('Nscatter 3')
    lines.append('maxIter 500')
    lines.append('JTol 5e-3')
    lines.append('popsTol 1e-3')
    lines.append('prdSubIter 3')
    lines.append('prdTol 1e-2')
    if stokes:
        lines.append('stokes 1')
    if hprd:
        lines.append('hprd 1')
    if conserve:
        # NR charge-conservation golden: export the fd dC/dne and the
        # background-species electron contribution the Python layer
        # computes (nr_post_update's inputs on both sides)
        lines.append('conserve 1')
        from lightweaver_tpu.atomic_table import PeriodicTable
        atoms = ctx.cfg.activeAtoms
        dCs = ctx._fd_dC(atoms, list(range(len(atoms))), 1.0)
        for ia, dCa in enumerate(dCs):
            save(f'atom{ia}_dC', dCa)
        bgModels = (ctx.spect.radSet.detailedAtoms
                    + ctx.spect.radSet.passiveAtoms)
        backgroundNe = np.zeros_like(np.asarray(ctx.atmos.ne))
        for m in bgModels:
            stages = np.array([l.stage for l in m.levels], np.float64)
            nPop = ctx.eqPops.atomicPops[m.element].n
            backgroundNe += np.sum(stages[:, None] * nPop, axis=0)
        save('background_ne', backgroundNe)
    if timedep is not None:
        lines.append('timedep {} {} {}'.format(*timedep))
    if ngOptions is not None:
        lines.append(f'ng {ngOptions.Norder} {ngOptions.Nperiod} '
                     f'{ngOptions.Ndelay}')
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
    ngOptions = None
    if config == 'falc_multi_ng':
        # Ndelay=50: engaging Ng earlier on this problem extrapolates the
        # pre-asymptotic iterates to negative populations and the
        # stat-eq solve goes singular -- in BOTH implementations
        # (verified: the compiled reference throws Singular Matrix and
        # lightweaver_tpu raises ExplodingMatrixError on the same config
        # with Ndelay=10)
        from lightweaver_tpu.ops.ng import NgOptions
        ngOptions = NgOptions(Norder=2, Nperiod=5, Ndelay=50)
    # time-dependent golden: backward-Euler steps from the LTE start
    # (dt [s], steps, sub-iterations) -- see driver.cpp timedep mode
    timedep = (0.2, 6, 2) if config.endswith('_timedep') else None
    export(ctx, outdir,
           prd=config.endswith('_prd') or config.endswith('_hprd'),
           stokes=config.endswith('_stokes'), ngOptions=ngOptions,
           hprd=config.endswith('_hprd'), timedep=timedep,
           conserve=config.endswith('_nr'))
