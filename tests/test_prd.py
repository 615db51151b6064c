"""PRD: Gouttebroze gII approximation and scattering integral.

Oracles: analytic properties of GII (value at line centre, symmetry,
photon-number normalisation) and the fixed point of the scattering
integral under flat radiation fields; integration: Ly-alpha PRD on FAL-C.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from lightweaver_tpu.ops.prd import (NFINE, PrdDQ, gII, prd_scatter_rho)


def test_gII_line_centre():
    # G_zero(0) = 1/sqrt(1.273239545) = sqrt(pi)/2
    v = float(gII(jnp.asarray(1e-3), jnp.asarray(0.0), jnp.asarray(0.0)))
    assert np.isclose(v, np.sqrt(np.pi) / 2.0, rtol=1e-6)


def test_gII_symmetry():
    a = jnp.asarray(0.01)
    qE = jnp.linspace(-8.0, 8.0, 33)
    qA = jnp.linspace(-8.0, 8.0, 41)
    g1 = np.asarray(gII(a, qE[:, None], qA[None, :]))
    g2 = np.asarray(gII(a, -qE[:, None], -qA[None, :]))
    assert np.allclose(g1, g2, rtol=1e-12)


@pytest.mark.parametrize('qEmit', [0.0, 1.0, 3.0, 6.0, 20.0])
def test_gII_normalisation(qEmit):
    """Integral of gII over absorption frequency ~ 1 (photon conservation;
    the Gouttebroze approximation is accurate to a few percent)."""
    a = 1e-3
    qA = np.arange(-60.0, 60.0, 0.02)
    g = np.asarray(gII(jnp.asarray(a), jnp.asarray(qEmit), jnp.asarray(qA)))
    integral = np.trapz(g, qA)
    assert abs(integral - 1.0) < 0.08, integral


def test_scatter_rho_flat_J_fixed_point():
    """With J flat in frequency and Jbar equal to that value, the
    normalised scattering integral returns exactly J, so rho == 1."""
    W, Nk = 21, 5
    lamGrid = np.linspace(-1.0, 1.0, W)
    qWave = jnp.asarray(np.broadcast_to(lamGrid[:, None] * 30.0, (W, Nk)))
    aDamp = jnp.full((Nk,), 1e-2)
    Jval = 3.7e-9
    Jw = jnp.full((W, Nk), Jval)
    gammaPre = jnp.full((Nk,), 2.0e5)
    Jbar = jnp.full((Nk,), Jval)
    rho = np.asarray(prd_scatter_rho(qWave, aDamp, Jw, gammaPre, Jbar))
    assert np.allclose(rho, 1.0, atol=1e-10)


def test_scatter_rho_sign():
    """If J in the wings exceeds Jbar, rho > 1 at wing frequencies
    (more scattered photons than the CRD mean)."""
    W, Nk = 41, 3
    q = np.linspace(-50.0, 50.0, W)
    qWave = jnp.asarray(np.broadcast_to(q[:, None], (W, Nk)))
    aDamp = jnp.full((Nk,), 1e-2)
    Jbar = 1.0
    # J rises steeply away from line centre
    Jw = jnp.asarray(np.broadcast_to((1.0 + 0.5 * (q / 50.0) ** 2)[:, None],
                                     (W, Nk)))
    rho = np.asarray(prd_scatter_rho(qWave, aDamp, Jw,
                                     jnp.full((Nk,), 1.0),
                                     jnp.full((Nk,), Jbar)))
    assert rho[0, 0] > 1.0 and rho[-1, 0] > 1.0
    # at line centre the local J ~ Jbar, so rho ~ 1
    assert abs(rho[W // 2, 0] - 1.0) < 0.1


@pytest.mark.slow
def test_lyman_alpha_prd_on_falc():
    from lightweaver_tpu.atmosphere import Atmosphere
    from lightweaver_tpu.atomic_set import RadiativeSet
    from lightweaver_tpu.context import Context
    from lightweaver_tpu.fal import Falc82
    from lightweaver_tpu.iterate_ctx import iterate_ctx_se
    from lightweaver_tpu.rh_atoms import H_6_atom

    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 30).astype(int))
    atmos = Atmosphere(height=full.height[idx],
                       temperature=full.temperature[idx],
                       vlos=full.vlos[idx], vturb=full.vturb[idx],
                       ne=full.ne[idx], nHTot=full.nHTot[idx])
    atmos.quadrature(3)
    rs = RadiativeSet([H_6_atom()])
    rs.set_active('H')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    # accelerateScattering: without the local scattering operator the
    # Rayleigh-dominated deep-UV J rows pure-lambda-iterate (the subset
    # PRD refresh no longer burns extra full-grid iterations on them)
    ctx = Context(atmos, spect, eqPops, accelerateScattering=True)
    # tight rho sub-iterations: with the lagged default (tol 1e-2, 3 sub
    # iters) the rho<->pops coupling limit-cycles around dPops ~ 2e-3
    nIter = iterate_ctx_se(ctx, prd=True, NmaxIter=300, quiet=True,
                           maxPrdSubIter=10, prdIterTol=2e-4)
    assert nIter < 300, 'PRD run did not converge'

    # Ly-alpha rho: close to 1 in the photosphere (collision-dominated),
    # departing from 1 in the chromospheric wings
    prdLines = ctx._prd_lines()
    assert len(prdLines) >= 2      # Ly-alpha and Ly-beta are PRD in H_6
    ai, ti, a, t = prdLines[0]
    rho = np.asarray(ctx.rhoPrd[ai][ti])
    assert np.all(np.isfinite(rho)) and np.all(rho > 0)
    assert np.abs(rho[:, -1] - 1.0).max() < 0.05, 'deep rho should be ~1'
    assert np.abs(rho - 1.0).max() > 0.1, 'chromospheric PRD departure'


def test_prd_ng_acceleration_matches_unaccelerated():
    """Opt-in persistent Ng on rho (prdNgOptions) must fire and land on
    the same redistributed rho/populations as the reference-default
    tracking-only path (ref keeps Ng(0,0,0): PrdTemplates.hpp:205,263)."""
    from lightweaver_tpu.atmosphere import Atmosphere
    from lightweaver_tpu.atomic_set import RadiativeSet
    from lightweaver_tpu.context import Context
    from lightweaver_tpu.fal import Falc82
    from lightweaver_tpu.ops.ng import NgOptions
    from lightweaver_tpu.rh_atoms import H_6_atom

    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 20).astype(int))

    def make_ctx():
        atmos = Atmosphere(height=full.height[idx],
                           temperature=full.temperature[idx],
                           vlos=full.vlos[idx], vturb=full.vturb[idx],
                           ne=full.ne[idx], nHTot=full.nHTot[idx])
        atmos.quadrature(3)
        rs = RadiativeSet([H_6_atom()])
        rs.set_active('H')
        spect = rs.compute_wavelength_grid()
        eqPops = rs.compute_eq_pops(atmos)
        return Context(atmos, spect, eqPops, accelerateScattering=True)

    def run(ctx):
        from lightweaver_tpu.iterate_ctx import iterate_ctx_se
        nIter = iterate_ctx_se(ctx, prd=True, NmaxIter=400, quiet=True,
                               popsTol=1e-3, maxPrdSubIter=10,
                               prdIterTol=2e-4)
        ai, ti, a, t = ctx._prd_lines()[0]
        return nIter, np.asarray(ctx.rhoPrd[ai][ti]), \
            np.asarray(ctx.popsState[0]['n'])

    ctxRef = make_ctx()
    nRef, rhoRef, popsRef = run(ctxRef)
    assert nRef < 400

    ctxNg = make_ctx()
    ctxNg.prdNgOptions = NgOptions(Norder=2, Nperiod=2, Ndelay=4)
    nNg, rhoNg, popsNg = run(ctxNg)
    assert nNg < 400

    # the accelerator must actually have fired (history spans calls)
    assert ctxNg._prdNgs is not None
    assert ctxNg._prdNgs[0].count >= 4
    # and converge to the same physics (line-core rho where it matters;
    # the far wings have rho*phi ~ 0 and looser fixpoints)
    core = np.abs(rhoRef - 1.0) > 1e-3
    assert np.abs(rhoNg[core] / rhoRef[core] - 1).max() < 5e-2
    assert np.abs(popsNg / popsRef - 1).max() < 2e-2


def test_prd_subset_fs_matches_full_grid():
    """The PrdOnly subset formal solution (ref PrdTemplates.hpp:19-113)
    must reproduce the full-grid FS exactly on the subset rows: same
    J rows and identical PRD-line rates from the same state."""
    import jax.numpy as jnp

    from lightweaver_tpu.atmosphere import Atmosphere
    from lightweaver_tpu.atomic_set import RadiativeSet
    from lightweaver_tpu.context import Context
    from lightweaver_tpu.fal import Falc82
    from lightweaver_tpu.rh_atoms import H_6_atom

    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 20).astype(int))
    atmos = Atmosphere(height=full.height[idx],
                       temperature=full.temperature[idx],
                       vlos=full.vlos[idx], vturb=full.vturb[idx],
                       ne=full.ne[idx], nHTot=full.nHTot[idx])
    atmos.quadrature(3)
    rs = RadiativeSet([H_6_atom()])
    rs.set_active('H')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    ctx = Context(atmos, spect, eqPops)
    for it in range(5):
        ctx.formal_sol_gamma_matrices()
        if it >= 3:
            ctx.stat_equil()

    J0 = jnp.array(ctx.J)
    sub = ctx._prd_subset_idxs()
    assert len(sub) < ctx.cfg.Nlam          # genuinely a subset
    ctx._prd_subset_fs()
    Jsub = np.asarray(ctx.J)[sub]
    RijSub = [np.asarray(ctx._Rij[ai][ti])
              for ai, ti, a, t in ctx._prd_lines()]

    ctx.J = J0                              # same J^dagger for the full FS
    ctx.formal_sol_gamma_matrices()
    Jfull = np.asarray(ctx.J)[sub]
    assert np.abs(Jsub / Jfull - 1).max() < 1e-9
    for li, (ai, ti, a, t) in enumerate(ctx._prd_lines()):
        RijFull = np.asarray(ctx._Rij[ai][ti])
        assert np.abs(RijSub[li] / RijFull - 1).max() < 1e-6
