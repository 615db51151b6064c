"""FAL-C Ca II synthesis three ways: fixed ne, NLTE charge conservation,
and EOS-reconstructed ne -- the analogue of the reference gallery script
(ref: /root/reference/examples/plot_SimpleLineTest.py)."""
import numpy as np

import lightweaver_tpu as lw
from lightweaver_tpu.rh_atoms import (Al_atom, C_atom, CaII_atom, Fe_atom,
                                      H_6_atom, He_atom, MgII_atom, N_atom,
                                      NaI_atom, O_atom, S_atom, Si_atom)


def synth_8542(atmos, conserve: bool, useNe: bool = True):
    """Synthesise Ca II 8542 with the electron density handled one of
    three ways (ref: plot_SimpleLineTest.py:23-83): the model's ne
    (useNe=True), an iterated LTE ne (useNe=False), or NR charge
    conservation starting from LTE ne (conserve=True)."""
    atmos.quadrature(5)
    rs = lw.RadiativeSet([H_6_atom(), CaII_atom(), C_atom(), O_atom(),
                          Si_atom(), Al_atom(), Fe_atom(), He_atom(),
                          MgII_atom(), N_atom(), NaI_atom(), S_atom()])
    rs.set_active('H', 'Ca')
    spect = rs.compute_wavelength_grid()
    if useNe:
        eqPops = rs.compute_eq_pops(atmos)
    else:
        eqPops = rs.iterate_lte_ne_eq_pops(atmos)
    ctx = lw.Context(atmos, spect, eqPops, conserveCharge=conserve)
    lw.iterate_ctx_se(ctx, quiet=True)
    lam = np.linspace(853.9444, 854.9444, 1001)
    I = ctx.compute_rays(wavelengths=lam, mus=[1.0])
    return lam, I[:, 0], ctx


if __name__ == '__main__':
    results = {}
    atmos = lw.Falc82()
    lam, I_fixed, _ = synth_8542(atmos, conserve=False, useNe=True)
    results['fixed_ne'] = I_fixed

    atmos = lw.Falc82()
    _, I_cons, _ = synth_8542(atmos, conserve=True, useNe=False)
    results['conserve'] = I_cons

    atmos = lw.Falc82()
    _, I_lte, _ = synth_8542(atmos, conserve=False, useNe=False)
    results['lte_ne'] = I_lte

    np.savez('simple_line_test.npz', wavelength=lam, **results)
    core = np.argmin(np.abs(lam - 854.4444))
    print('I(8542 core)/I(cont):',
          {k: float(v[core] / v[0]) for k, v in results.items()})
