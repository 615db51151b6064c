"""Time-dependent hydrogen ionisation with charge conservation after an
impulsive chromospheric temperature enhancement -- the reference's
dynamic validation example reproducing the time-dependent population
figure of Judge (2017), ApJ 851, 5.
(ref: /root/reference/examples/plot_JudgeDynamicValidation.py)

Workflow: LTE-ne fixpoint start, converge statistical equilibrium with
conserveCharge, perturb the temperature structure like the paper, then
advance backward-Euler time steps; each step sub-iterates
(formal solution + time_dep_update + nr_post_update) to convergence so
populations AND electron density evolve consistently.
"""
import time

import numpy as np

import lightweaver_tpu as lw
from lightweaver_tpu.rh_atoms import (Al_atom, C_atom, CaII_atom, Fe_atom,
                                      H_4_atom, He_atom, MgII_atom, N_atom,
                                      NaI_atom, O_atom, S_atom, Si_atom)

if __name__ == '__main__':
    atmos = lw.Falc82()
    atmos.quadrature(5)
    aSet = lw.RadiativeSet([H_4_atom(), C_atom(), O_atom(), Si_atom(),
                            Al_atom(), CaII_atom(), Fe_atom(), He_atom(),
                            MgII_atom(), N_atom(), NaI_atom(), S_atom()])
    aSet.set_active('H')
    spect = aSet.compute_wavelength_grid()

    eqPops = aSet.iterate_lte_ne_eq_pops(atmos)
    ctx = lw.Context(atmos, spect, eqPops, conserveCharge=True)

    lw.iterate_ctx_se(ctx, quiet=True)
    print('Achieved initial Stat Eq\n')

    start = time.time()
    dt = 0.1
    NtStep = 30
    NsubStep = 100

    # perturb the atmospheric temperature structure like in the paper
    T = np.asarray(atmos.temperature).copy()
    for i in range(11, 31):
        di = (i - 20.0) / 3.0
        T[i] *= 1.0 + 2.0 * np.exp(-di ** 2)
    atmos.temperature = T

    hPops = [np.asarray(ctx.popsState[0]['n']).copy()]
    subIters = []
    for it in range(NtStep):
        # recompute line profiles etc. for the changed temperature and
        # evolving electron density
        ctx.update_deps()

        prevState = None
        for sub in range(NsubStep):
            JUpdate = ctx.formal_sol_gamma_matrices()
            popsUpdate, prevState = ctx.time_dep_update(dt, prevState)
            dNe = ctx.nr_post_update(
                timeDependentData={'dt': dt, 'nPrev': prevState})
            if popsUpdate.dPopsMax < 1e-3 and float(JUpdate.dJMax) < 3e-3:
                subIters.append(sub)
                break
        else:
            raise ValueError('No convergence within required Nsubstep')

        hPops.append(np.asarray(ctx.popsState[0]['n']).copy())
        print('Step %d (t=%.1f s) done after %d sub-iterations'
              % (it, (it + 1) * dt, sub))

    end = time.time()
    hPops = np.stack(hPops)
    np.savez('time_dependent_h.npz', hPops=hPops, dt=dt,
             temperature=np.asarray(atmos.temperature),
             ne=np.asarray(atmos.ne), cmass=atmos.cmass)
    # Judge (2017) signature: chromospheric proton density keeps rising
    # over the heated region on a timescale much slower than the heating
    k = 20
    print('proton density at k=%d: %.3e -> %.3e m^-3'
          % (k, hPops[0][-1, k], hPops[-1][-1, k]))
    print('Time taken: %.2f s' % (end - start))
