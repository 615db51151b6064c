"""Time-dependent hydrogen ionisation after a chromospheric temperature
jump -- the analogue of the reference's dynamic validation example
(ref: /root/reference/examples/plot_JudgeDynamicValidation.py)."""
import numpy as np

import lightweaver_tpu as lw
from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom


if __name__ == '__main__':
    atmos = lw.Falc82()
    atmos.quadrature(5)
    rs = lw.RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('H')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    ctx = lw.Context(atmos, spect, eqPops)
    lw.iterate_ctx_se(ctx, quiet=True)
    nEq = np.asarray(ctx.popsState[0]['n']).copy()

    # impulsive heating of the mid-chromosphere
    T = np.asarray(ctx.atmos.temperature).copy()
    T[25:40] *= 1.4
    ctx.atmos.temperature = T
    ctx.update_deps()

    dt = 0.1
    history = [nEq]
    prevState = None
    for step in range(20):
        ctx.formal_sol_gamma_matrices()
        upd, prevState = ctx.time_dep_update(dt, prevState)
        history.append(np.asarray(ctx.popsState[0]['n']).copy())
        print(f't={dt*(step+1):.1f}s dPops={upd.dPopsMax:.2e}')

    np.savez('time_dependent_h.npz', nEq=nEq,
             history=np.stack(history), dt=dt)
    protons = np.stack(history)[:, -1, 30]
    print('proton density evolution at k=30:', protons / protons[0])
