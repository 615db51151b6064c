"""Golden validation against the ACTUAL reference implementation.

The artifacts in tests/golden/ were produced by compiling the unmodified
reference C++ core (/root/reference/Source, built scalar-only with no
Cython dependency) and driving it with scripts/refgold/driver.cpp on inputs
exported from THIS package (scripts/refgold/export_inputs.py), so both sides
consume byte-identical atmospheres, collision matrices, damping parameters,
backgrounds, and initial populations. Any difference isolates the RT core:
profile evaluation (Faddeeva), uv, the formal solver, Gamma accumulation
(SimdFullIterationTemplates.hpp:240-508), and stat_eq
(UpdatePopulations.cpp:7-47).

Regenerate with:
    python scripts/refgold/export_inputs.py scripts/refgold/inputs
    make -C scripts/refgold && scripts/refgold/build/refgold_driver \
        scripts/refgold/inputs scripts/refgold/outputs
    (then re-pack tests/golden/*.npz; see scripts/refgold/README.md)

The input-reproducibility test below asserts the frozen inputs still match
what the current code derives, so golden staleness fails loudly.

With the Weideman Voigt (ops/faddeeva.py, <1e-9 in H over the physical
damping range) both sides agree to ~1e-10 in phi, Gamma, converged
populations, J and emergent I; tolerances below leave margin for
platform-dependent rounding.
"""
import os

import numpy as np
import pytest

from lightweaver_tpu.atomic_set import RadiativeSet
from lightweaver_tpu.context import Context
from lightweaver_tpu.fal import Falc82
from lightweaver_tpu.iterate_ctx import iterate_ctx_se
from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom

GOLDEN = os.path.join(os.path.dirname(__file__), 'golden')


@pytest.fixture(scope='module')
def golden():
    ref = np.load(os.path.join(GOLDEN, 'falc_h6ca_ref.npz'))
    inputs = np.load(os.path.join(GOLDEN, 'falc_h6ca_inputs.npz'))
    return inputs, ref


@pytest.fixture(scope='module')
def ctx():
    atmos = Falc82()
    atmos.quadrature(5)
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('H', 'Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    return Context(atmos, spect, eqPops, formalSolver='piecewise_bezier3_1d')


def relerr(ours, ref, floorRel=0.0):
    ours = np.asarray(ours)
    ref = np.asarray(ref)
    floor = np.abs(ref).max() * max(floorRel, 1e-300)
    return (np.abs(ours - ref) / np.maximum(np.abs(ref), floor)).max()


# ---------------------------------------------------------------------------
def test_inputs_reproducible(ctx, golden):
    """The frozen exported inputs still match what the code derives today.

    If this fails, the model layer changed; re-run the golden pipeline."""
    inputs, _ = golden
    np.testing.assert_allclose(np.asarray(ctx.spect.wavelength),
                               inputs['wavelength'], rtol=1e-12)
    np.testing.assert_allclose(ctx.atmos.temperature, inputs['temperature'],
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ctx.bgChi), inputs['bg_chi'],
                               rtol=1e-10)
    for ia in range(2):
        np.testing.assert_allclose(np.asarray(ctx.C[ia]),
                                   inputs[f'atom{ia}_C'], rtol=1e-10)
        np.testing.assert_allclose(np.asarray(ctx.popsState[ia]['n']),
                                   inputs[f'atom{ia}_n0'], rtol=1e-10)
        for it, t in enumerate(ctx.activeAtoms[ia].trans):
            if t.isLine:
                np.testing.assert_allclose(
                    np.asarray(ctx.aDamp[ia][it]),
                    inputs[f'atom{ia}_trans{it}_adamp'], rtol=1e-10)


def test_phi_wphi_vs_reference(ctx, golden):
    _, ref = golden
    for ia, a in enumerate(ctx.activeAtoms):
        for it, t in enumerate(a.trans):
            if not t.isLine:
                continue
            tag = f'a{ia}t{it}'
            assert relerr(ctx.phi[ia][it], ref[f'out_phi_{tag}']) < 1e-8, tag
            assert relerr(ctx.wphi[ia][it], ref[f'out_wphi_{tag}']) < 1e-11, tag


def test_basic_background_vs_reference(ctx, golden):
    """Reference C++ basic_background (H- bf/ff, H ff, Thomson;
    Background.cpp:1264) vs our equivalent components."""
    from lightweaver_tpu import constants as Const
    from lightweaver_tpu.background import (h2plus_ff, hminus_bf, hminus_ff,
                                            hydrogen_ff, thomson_scattering)
    inputs, ref = golden
    lam = inputs['wavelength']
    T = inputs['temperature']
    ne = inputs['ne']
    hPops = inputs['bgin_hpops']
    nHMinus = inputs['bgin_hminus']
    nH0 = hPops[0]
    nProton = hPops[-1]

    Bnu = (2.0 * Const.HC / (Const.NM_TO_M * lam[:, None]) ** 3
           / np.expm1(np.minimum(Const.HC_K / lam[:, None] / T[None, :],
                                 500.0)))
    chi, eta = hminus_bf(lam[:, None], T[None, :], nHMinus[None, :])
    c = hminus_ff(lam, T, ne, nH0)
    chi = chi + c
    eta = eta + c * Bnu
    c = hydrogen_ff(lam[:, None], T[None, :], ne[None, :], nProton[None, :])
    chi = chi + c
    eta = eta + c * Bnu
    c = h2plus_ff(lam, T, nH0, nProton)
    chi = chi + c
    eta = eta + c * Bnu
    sca = np.broadcast_to(thomson_scattering(ne)[None, :], chi.shape)

    assert relerr(chi, ref['out_bb_chi'], floorRel=1e-10) < 1e-6
    assert relerr(eta, ref['out_bb_eta'], floorRel=1e-10) < 1e-6
    assert relerr(sca, ref['out_bb_sca']) < 1e-10


def test_one_iteration_vs_reference(ctx, golden):
    """J, I and preconditioned Gamma after the first formal solution."""
    _, ref = golden
    ctx.formal_sol_gamma_matrices()
    assert relerr(ctx.J, ref['out_J_iter1']) < 1e-8
    assert relerr(ctx.I, ref['out_I_iter1']) < 1e-8
    for ia in range(2):
        G = np.asarray(ctx._Gamma[ia])
        GRef = ref[f'out_Gamma_iter1_a{ia}']
        assert relerr(G, GRef, floorRel=1e-10) < 1e-8, f'atom{ia}'


def test_converged_vs_reference(golden):
    """Full MALI convergence: populations, J, I, and iteration count must
    match the compiled reference run (no Ng, JTol 5e-3, popsTol 1e-3)."""
    _, ref = golden
    atmos = Falc82()
    atmos.quadrature(5)
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('H', 'Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    c = Context(atmos, spect, eqPops, formalSolver='piecewise_bezier3_1d')
    nIter = iterate_ctx_se(c, NmaxIter=500, quiet=True)

    nIterRef = int(ref['out_niter'][0])
    assert abs(nIter - nIterRef) <= 2
    for ia in range(2):
        assert relerr(c.popsState[ia]['n'], ref[f'out_pops_a{ia}']) < 1e-7
    assert relerr(c.J, ref['out_J']) < 1e-7
    assert relerr(c.I, ref['out_I']) < 1e-7


# ---------------------------------------------------------------------------
def amperr(ours, ref):
    """Max abs error normalised by the reference's peak amplitude.

    Signed Stokes profiles cross zero; plain relative error explodes at the
    zero crossings where both sides carry ~1e-17 numerical residue."""
    ours = np.asarray(ours, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    return np.abs(ours - ref).max() / np.abs(ref).max()


@pytest.mark.slow
def test_stokes_converged_vs_reference():
    """BASELINE config 4 (Zeeman-polarised Ca II, magnetised FAL-C): converge
    CRD MALI, then compare the polarised profiles (phi/phiQ/phiV/psiQ built
    as FormalStokes.cpp:9-80 does) and the full-Stokes formal solution
    (formal_sol_full_stokes_impl, FormalStokes.cpp:505-605) against the
    compiled reference on byte-identical inputs.

    The reference driver runs with updateJ=true: with its default
    updateJ=false the reference's stokes_fs_core never binds JDag
    (FormalStokes.cpp:429-439) and silently drops the coherent-scattering
    sca*J term from Stokes-I (UV continua come out orders of magnitude too
    dark); lightweaver_tpu always includes it. Measured agreement
    (amplitude-normalised): I 1.3e-8, Q 5.5e-7, U 1.0e-6, V 1.8e-4 — every
    worst point is a wavelength where our Q/U/V is exactly 0 and the
    reference carries ~1e-13 leakage from its unpolarised path."""
    from lightweaver_tpu.iterate_ctx import iterate_ctx_se
    ref = np.load(os.path.join(GOLDEN, 'falc_h6ca_stokes_ref.npz'))
    inputs = np.load(os.path.join(GOLDEN, 'falc_h6ca_stokes_inputs.npz'))

    atmos = Falc82()
    atmos.quadrature(5)
    Nk = atmos.Nspace
    atmos.B = np.full(Nk, 0.1)
    atmos.gammaB = np.full(Nk, np.pi / 3)
    atmos.chiB = np.full(Nk, np.pi / 6)
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('H', 'Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    c = Context(atmos, spect, eqPops, formalSolver='piecewise_bezier3_1d')

    # input reproducibility (golden staleness fails loudly)
    np.testing.assert_allclose(np.asarray(c.spect.wavelength),
                               inputs['wavelength'], rtol=1e-12)
    for ia, a in enumerate(c.activeAtoms):
        for it, t in enumerate(a.trans):
            if not t.isLine:
                continue
            line = [l for l in a.model.lines
                    if l.i == t.i and l.j == t.j][0]
            z = line.zeeman_components()
            if z is None:
                continue
            tag = f'atom{ia}_trans{it}_zeeman'
            np.testing.assert_allclose(z.alpha, inputs[tag + '_alpha'])
            np.testing.assert_allclose(z.shift, inputs[tag + '_shift'],
                                       rtol=1e-12)
            np.testing.assert_allclose(z.strength, inputs[tag + '_strength'],
                                       rtol=1e-12)

    nIter = iterate_ctx_se(c, NmaxIter=500, quiet=True)
    assert abs(nIter - int(ref['out_niter'][0])) <= 2
    for ia in range(2):
        assert relerr(c.popsState[ia]['n'], ref[f'out_pops_a{ia}']) < 1e-7

    # polarised profiles (goldens stored f32: compare at 1e-5)
    c.compute_polarised_profiles()
    for ai, a in enumerate(c.activeAtoms):
        for ti, t in enumerate(a.trans):
            p7 = c.phi7[ai][ti]
            if p7 is None:
                continue
            tag = f'a{ai}t{ti}'
            assert amperr(p7['phi'], ref[f'out_phi_pol_{tag}']) < 1e-5, tag
            assert amperr(p7['phiQ'], ref[f'out_phiQ_{tag}']) < 1e-5, tag
            assert amperr(p7['phiV'], ref[f'out_phiV_{tag}']) < 1e-5, tag
            assert amperr(p7['psiQ'], ref[f'out_psiQ_{tag}']) < 1e-5, tag

    # full-Stokes formal solution
    c.single_stokes_fs(recompute=True, updateJ=True)
    IRef = ref['out_I_stokes']
    QuvRef = ref['out_Quv']
    assert amperr(c.I, IRef) < 1e-6
    for n in range(3):
        assert amperr(c.Quv[n], QuvRef[n]) < 1e-3, 'QUV'[n]


@pytest.mark.slow
def test_multi_atom_ng_converged_vs_reference():
    """BASELINE config 2 (multi-atom active set with Ng acceleration):
    H_6 + Ca II + Na I active (Mg II passive, enriching the background),
    Ng(Norder=2, Nperiod=5, Ndelay=50) on every active atom, wired into
    the compiled reference exactly as the Cython layer does
    (LwMiddleLayer.pyx:2421-2422, Ng.hpp:31-115).

    Ndelay matters: engaging Ng at Ndelay=10 on this problem extrapolates
    the pre-asymptotic iterates to negative populations and the stat-eq
    solve goes singular in BOTH implementations (the reference throws
    Singular Matrix, we raise ExplodingMatrixError) -- agreement even in
    failure. At Ndelay=50 both converge in exactly 221 iterations;
    pops agree to ~1e-7 and J/I to ~3e-7 (Ng extrapolation compounds
    rounding differences; plain CRD tracks at 1e-10)."""
    from lightweaver_tpu.iterate_ctx import iterate_ctx_se
    from lightweaver_tpu.ops.ng import NgOptions
    from lightweaver_tpu.rh_atoms import MgII_atom, NaI_atom
    ref = np.load(os.path.join(GOLDEN, 'falc_multi_ng_ref.npz'))
    inputs = np.load(os.path.join(GOLDEN, 'falc_multi_ng_inputs.npz'))

    atmos = Falc82()
    atmos.quadrature(5)
    rs = RadiativeSet([H_6_atom(), CaII_atom(), NaI_atom(), MgII_atom()])
    rs.set_active('H', 'Ca', 'Na')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    c = Context(atmos, spect, eqPops, formalSolver='piecewise_bezier3_1d',
                ngOptions=NgOptions(Norder=2, Nperiod=5, Ndelay=50))

    # input reproducibility (golden staleness fails loudly)
    np.testing.assert_allclose(np.asarray(c.spect.wavelength),
                               inputs['wavelength'], rtol=1e-12)
    for ia in range(3):
        np.testing.assert_allclose(np.asarray(c.C[ia]),
                                   inputs[f'atom{ia}_C'], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(c.bgChi), inputs['bg_chi'],
                               rtol=1e-10)

    nIter = iterate_ctx_se(c, NmaxIter=500, quiet=True)
    assert abs(nIter - int(ref['out_niter'][0])) <= 2
    for ia in range(3):
        assert relerr(c.popsState[ia]['n'], ref[f'out_pops_a{ia}']) < 1e-6
    assert relerr(c.J, ref['out_J']) < 3e-6
    assert relerr(c.I, ref['out_I']) < 3e-6


@pytest.mark.slow
def test_2d_converged_vs_reference():
    """BASELINE config 5's 2D leg: Ca II over a horizontally perturbed
    FAL-C slab (30x8, callable x BCs, linear 2D solver) against the
    compiled reference running piecewise_linear_2d + interp_linear_2d
    (FormalScalar2d.cpp) on byte-identical inputs.

    The comparison injects RefBugCompatXLower, which reproduces a genuine
    index-swap bug in the reference (`I(j, k) = 0.0` instead of
    `I(k, j)` in the starting-plane BC loop, FormalScalar2d.cpp:570):
    every down pass zeroes the first Nx-1 z-rows of the callable fixed
    x-lower column.  With the compat BC both sides track to ~1e-13 in J
    and Gamma at every iteration and converge in the same 154 iterations;
    with the correct (default) BC our solver matches a literal numpy
    transcription of the reference algorithm per-ray at ~1e-13, so the
    production physics is validated independently of the bug."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                    'scripts', 'refgold'))
    from export_inputs import RefBugCompatXLower, build_2d_atmos
    from lightweaver_tpu.iterate_ctx import iterate_ctx_se
    ref = np.load(os.path.join(GOLDEN, 'falc2d_ca_ref.npz'))
    inputs = np.load(os.path.join(GOLDEN, 'falc2d_ca_inputs.npz'))

    atmos = build_2d_atmos()
    atmos.xLowerBc = RefBugCompatXLower(0)
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    c = Context(atmos, spect, eqPops, formalSolver='piecewise_linear_2d')

    # input reproducibility (golden staleness fails loudly)
    np.testing.assert_allclose(np.asarray(c.spect.wavelength),
                               inputs['wavelength'], rtol=1e-12)
    np.testing.assert_allclose(c.atmos.temperature, inputs['temperature'],
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(c.bgChi), inputs['bg_chi'],
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(c.C[0]), inputs['atom0_C'],
                               rtol=1e-10)

    nIter = iterate_ctx_se(c, NmaxIter=500, quiet=True)
    assert nIter == int(ref['out_niter'][0])
    assert relerr(c.popsState[0]['n'], ref['out_pops_a0']) < 1e-8
    assert relerr(c.J, ref['out_J']) < 1e-8
    assert relerr(np.asarray(c.I).reshape(ref['out_I'].shape),
                  ref['out_I']) < 1e-8


@pytest.mark.slow
def test_2d_besser_converged_vs_reference():
    """Same 2D problem with the reference's DEFAULT 2D solver,
    piecewise_besser_2d (BESSER along-ray integration with monotonic
    Bezier control points from the downwind intersection,
    FormalScalar2d.cpp:950-1000) + interp_linear_2d.  The besser variant
    of the reference does NOT have the linear variant's start-plane
    index-swap bug (it writes `I(k, j) = 0.0` correctly at :880), so no
    compat BC is needed.  Both sides converge in exactly 218 iterations;
    pops/J/I agree to ~4e-12."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                    'scripts', 'refgold'))
    from export_inputs import build_2d_atmos
    from lightweaver_tpu.iterate_ctx import iterate_ctx_se
    ref = np.load(os.path.join(GOLDEN, 'falc2d_ca_besser_ref.npz'))

    atmos = build_2d_atmos()
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    c = Context(atmos, spect, eqPops, formalSolver='piecewise_besser_2d')

    nIter = iterate_ctx_se(c, NmaxIter=500, quiet=True)
    assert nIter == int(ref['out_niter'][0])
    assert relerr(c.popsState[0]['n'], ref['out_pops_a0']) < 1e-9
    assert relerr(c.J, ref['out_J']) < 1e-9
    assert relerr(np.asarray(c.I).reshape(ref['out_I'].shape),
                  ref['out_I']) < 1e-9


@pytest.mark.slow
def test_hprd_converged_vs_reference():
    """Hybrid PRD (BASELINE config 3 + a 0..5 km/s outflow ramp):
    Doppler-shift-coherent redistribution in the comoving frame, against
    the compiled reference running configure_hprd_coeffs
    (Prd.cpp:697-945) + redistribute_prd_lines on byte-identical inputs.

    Both sides converge in exactly 297 iterations; pops/rho agree to
    ~5e-10 and J/I to ~1e-10 amplitude-normalised at every wavelength.

    This agreement requires the hPRD wavelength SUBSET to match the
    reference's scan semantics exactly (Prd.cpp:766-793 is inclusive one
    grid point below prevLambda and one above nextLambda, which puts the
    first point outside each PRD window into the subset): those
    scattering-dominated near-empty edge wavelengths converge only as
    far as the number of scattering relaxations they receive, so a
    subset-membership difference shows up as an O(1) relative difference
    in their femto-scale emergent intensity even when every rate,
    population, and rho matches at 1e-10."""
    from lightweaver_tpu.iterate_ctx import iterate_ctx_se
    from lightweaver_tpu.rh_atoms import MgII_atom
    ref = np.load(os.path.join(GOLDEN, 'falc_h6mg_hprd_ref.npz'))
    inputs = np.load(os.path.join(GOLDEN, 'falc_h6mg_hprd_inputs.npz'))

    atmos = Falc82()
    atmos.quadrature(5)
    atmos.vlos = 5e3 * (atmos.height - atmos.height.min()) \
        / (atmos.height.max() - atmos.height.min())
    rs = RadiativeSet([H_6_atom(), MgII_atom()])
    rs.set_active('H', 'Mg')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    c = Context(atmos, spect, eqPops, formalSolver='piecewise_bezier3_1d',
                hprd=True)

    # input reproducibility (golden staleness fails loudly)
    np.testing.assert_allclose(np.asarray(c.spect.wavelength),
                               inputs['wavelength'], rtol=1e-12)
    np.testing.assert_allclose(atmos.vlos, inputs['vz'], rtol=1e-12)

    nIter = iterate_ctx_se(c, NmaxIter=500, prd=True, quiet=True)
    assert abs(nIter - int(ref['out_niter'][0])) <= 2

    assert relerr(c.popsState[0]['n'], ref['out_pops_a0']) < 1e-7
    assert relerr(c.popsState[1]['n'], ref['out_pops_a1']) < 1e-7
    for ai, a in enumerate(c.activeAtoms):
        for ti, t in enumerate(a.trans):
            if t.isLine and t.isPrd:
                assert relerr(c.rhoPrd[ai][ti],
                              ref[f'out_rho_a{ai}t{ti}']) < 1e-7, (ai, ti)
    # amplitude-normalised per wavelength (J/I span ~12 decades over
    # lambda; plain relative error at femto-scale depths is meaningless)
    for ours, name in ((c.J, 'out_J'), (c.I, 'out_I')):
        ours = np.asarray(ours)
        refA = ref[name]
        d = (np.abs(ours - refA).max(axis=1)
             / np.abs(refA).max(axis=1))
        assert d.max() < 1e-7, (name, d.max())


@pytest.mark.slow
def test_time_dependent_vs_reference():
    """Backward-Euler time-dependent population updates against the
    compiled reference's time_dependent_update
    (UpdatePopulations.cpp:120-152): from the LTE start, 3 Lambda
    iterations then 6 steps of dt=0.2 s with 2 (FS + update)
    sub-iterations each, on the Ca II FAL-C problem.  Per-step
    populations agree to ~2e-8 (the stiff (I - Gamma dt) solves compound
    ~1e-10 per-iteration formal-solution differences)."""
    ref = np.load(os.path.join(GOLDEN, 'falc_ca_timedep_ref.npz'))
    inputs = np.load(os.path.join(GOLDEN, 'falc_ca_timedep_inputs.npz'))

    atmos = Falc82()
    atmos.quadrature(5)
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    c = Context(atmos, spect, eqPops, formalSolver='piecewise_bezier3_1d')

    # input reproducibility (golden staleness fails loudly)
    np.testing.assert_allclose(np.asarray(c.spect.wavelength),
                               inputs['wavelength'], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(c.C[0]), inputs['atom0_C'],
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(c.popsState[0]['n']),
                               inputs['atom0_n0'], rtol=1e-10)

    dt, nsteps, nsub = 0.2, 6, 2
    for _ in range(3):
        c.formal_sol_gamma_matrices()
    for step in range(nsteps):
        prev = [c.popsState[0]['n']]
        for _ in range(nsub):
            c.formal_sol_gamma_matrices()
            c.time_dep_update(dt, prev)
        assert relerr(c.popsState[0]['n'],
                      ref[f'out_td_step{step}_a0']) < 1e-6, step
    assert relerr(c.J, ref['out_J']) < 1e-7


@pytest.mark.slow
def test_nr_charge_conservation_vs_reference():
    """Newton-Raphson charge conservation against the compiled
    reference's nr_post_update (UpdatePopulations.cpp:229-395): converge
    the FAL-C H+Ca II CRD problem, then apply ONE NR (populations, ne)
    update with the finite-difference dC/dne and background-electron
    contribution computed by our Python layer and fed to BOTH sides
    (mirroring the reference's Cython/C++ split).  stepLimit=False takes
    the reference's raw Newton step (our default limits the step to
    preserve positivity on hard starts -- from this converged but
    non-charge-conserving state the raw step moves ne by ~30%, so the
    limiter would bind).  pops agree to ~3e-10, ne to ~4e-12."""
    ref = np.load(os.path.join(GOLDEN, 'falc_h6ca_nr_ref.npz'))
    inputs = np.load(os.path.join(GOLDEN, 'falc_h6ca_nr_inputs.npz'))

    from lightweaver_tpu.iterate_ctx import iterate_ctx_se
    atmos = Falc82()
    atmos.quadrature(5)
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('H', 'Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    c = Context(atmos, spect, eqPops, formalSolver='piecewise_bezier3_1d')

    nIter = iterate_ctx_se(c, NmaxIter=500, quiet=True)
    assert abs(nIter - int(ref['out_niter'][0])) <= 2

    # the exported dC/backgroundNe must match what we derive today
    dCs = c._fd_dC(c.cfg.activeAtoms, [0, 1], 1.0)
    for ia in range(2):
        np.testing.assert_allclose(np.asarray(dCs[ia]),
                                   inputs[f'atom{ia}_dC'], rtol=1e-10)

    c.nr_post_update(fdCollisionRates=True, stepLimit=False)
    for ia in range(2):
        assert relerr(c.popsState[ia]['n'],
                      ref[f'out_nr_pops_a{ia}']) < 1e-7
    assert relerr(c.atmos.ne, ref['out_nr_ne']) < 1e-9


@pytest.mark.slow
def test_prd_converged_vs_reference():
    """BASELINE config 3 (H Ly-alpha/beta + Mg II h&k in PRD): converge the
    full MALI + PRD-redistribution loop and compare against the compiled
    reference running redistribute_prd_lines (PrdTemplates.hpp:176-330,
    Prd.cpp:9-645) on byte-identical inputs: identical iteration count and
    ~1e-10 agreement in populations, J, emergent I, and every PRD line's
    converged emission-profile ratio rho."""
    from lightweaver_tpu.rh_atoms import MgII_atom
    ref = np.load(os.path.join(GOLDEN, 'falc_h6mg_prd_ref.npz'))
    inputs = np.load(os.path.join(GOLDEN, 'falc_h6mg_prd_inputs.npz'))

    atmos = Falc82()
    atmos.quadrature(5)
    rs = RadiativeSet([H_6_atom(), MgII_atom()])
    rs.set_active('H', 'Mg')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    c = Context(atmos, spect, eqPops, formalSolver='piecewise_bezier3_1d')

    # input reproducibility (golden staleness fails loudly)
    np.testing.assert_allclose(np.asarray(c.spect.wavelength),
                               inputs['wavelength'], rtol=1e-12)
    for ia, a in enumerate(c.activeAtoms):
        for it, t in enumerate(a.trans):
            if t.isLine and t.isPrd:
                np.testing.assert_allclose(
                    np.asarray(c.Qelast[ia][it]),
                    inputs[f'atom{ia}_trans{it}_qelast'], rtol=1e-10)

    nIter = iterate_ctx_se(c, NmaxIter=500, prd=True, quiet=True)
    assert abs(nIter - int(ref['out_niter'][0])) <= 2

    for ia in range(2):
        assert relerr(c.popsState[ia]['n'], ref[f'out_pops_a{ia}']) < 1e-7
    assert relerr(c.J, ref['out_J']) < 1e-7
    assert relerr(c.I, ref['out_I']) < 1e-7
    for ai, a in enumerate(c.activeAtoms):
        for ti, t in enumerate(a.trans):
            if t.isLine and t.isPrd:
                assert relerr(c.rhoPrd[ai][ti],
                              ref[f'out_rho_a{ai}t{ti}']) < 1e-7, (ai, ti)
