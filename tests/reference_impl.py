"""Independent, literal numpy transcription of the reference MALI
intensity core (per-wavelength loops), used as a test oracle for the
batched jitted implementation.

Follows /root/reference/Source/SimdFullIterationTemplates.hpp:59-508 and
LwTransition::uv / Atom::setup_wavelength step by step, with the
piecewise-linear formal solver.
"""
import numpy as np

import lightweaver_tpu.constants as C
from tests.test_formal_solver import np_piecewise_linear


def planck(T, lam):
    hc_kla = C.HC_K / lam
    twohnu3_c2 = C.TwoHC / lam ** 3
    return twohnu3_c2 / np.expm1(hc_kla / T)


def uv_ref(ctx, ai, ti, t, la, mu, d, nStar, T):
    """Transcription of Transition::uv at global wavelength index la."""
    lt = la - t.Nblue
    lam = t.wavelength[lt]
    if t.isLine:
        phi = np.asarray(ctx.phi[ai][ti])  # [W, Nmu, 2, Nk]
        hnu_4pi = C.HC_FOURPI * (t.lambda0 / lam)
        Vij = hnu_4pi * t.Bij * phi[lt, mu, d]
        Vji = (t.Bji / t.Bij) * Vij
        Uji = t.Aji / t.Bji * Vji
    else:
        gij = nStar[t.i] / nStar[t.j] * np.exp(-C.HC_K / lam / T)
        Vij = np.full_like(gij, t.alpha[lt])
        Vji = gij * Vij
        Uji = C.TwoHC / lam ** 3 * Vji
    return Uji, Vij, Vji


def wla_ref(ctx, ai, ti, t, la):
    lt = la - t.Nblue
    if t.isLine:
        wphi = np.asarray(ctx.wphi[ai][ti])
        return t.wlambda[lt] * wphi * C.FOURPI_HC
    return np.full(ctx.atmos.Nspace,
                   t.wlambda[lt] / t.wavelength[lt] * C.FOURPI_H)


def gamma_matrices_ref(ctx, lambdaIterate=False):
    """Full reference-semantics iteration returning J, I, Gamma, dJ."""
    atmos = ctx.atmos
    spect = ctx.spect
    Nlam = spect.Nspect
    Nk = atmos.Nspace
    Nmu = atmos.Nrays
    T = atmos.temperature
    height = atmos.height
    bgChi = np.asarray(ctx.bgChi)
    bgEta = np.asarray(ctx.bgEta)
    bgSca = np.asarray(ctx.bgSca)
    Jdag = np.asarray(ctx.J)
    wmu = np.asarray(atmos.wmu)
    muz = np.asarray(atmos.muz)

    allAtoms = ctx.activeAtoms + ctx.detailedAtoms
    pops = ([np.asarray(st['n']) for st in ctx.popsState]
            + [np.asarray(st['n']) for st in ctx.detailedPops])
    nStars = ([np.asarray(st['nStar']) for st in ctx.popsState]
              + [np.asarray(st['nStar']) for st in ctx.detailedPops])

    Gamma = [np.array(np.asarray(crsw_c), dtype=float)
             for crsw_c in ctx.C]   # start from C (crsw = 1)
    J = np.zeros((Nlam, Nk))
    Iout = np.zeros((Nlam, Nmu))
    dJMax = 0.0

    for la in range(Nlam):
        lam = spect.wavelength[la]
        for mu in range(Nmu):
            for d in range(2):
                toObs = bool(d)
                chiTot = bgChi[la].copy()
                etaTot = bgEta[la].copy()
                # per-atom level accumulators
                chiLvl = [np.zeros((a.Nlevel, Nk)) for a in allAtoms]
                ULvl = [np.zeros((a.Nlevel, Nk)) for a in allAtoms]
                etaAtom = [np.zeros(Nk) for a in allAtoms]
                for ai, a in enumerate(allAtoms):
                    n = pops[ai]
                    for ti, t in enumerate(a.trans):
                        if not (t.Nblue <= la < t.Nred):
                            continue
                        Uji, Vij, Vji = uv_ref(ctx, ai, ti, t, la, mu, d,
                                               nStars[ai], T)
                        chi_t = n[t.i] * Vij - n[t.j] * Vji
                        eta_t = n[t.j] * Uji
                        chiLvl[ai][t.i] += chi_t
                        chiLvl[ai][t.j] -= chi_t
                        ULvl[ai][t.j] += Uji
                        etaAtom[ai] += eta_t
                        chiTot += chi_t
                        etaTot += eta_t
                S = (etaTot + bgSca[la] * Jdag[la]) / chiTot

                # boundary condition
                if toObs:
                    dtau = (0.5 * (chiTot[-1] + chiTot[-2])
                            * abs(height[-1] - height[-2]) / muz[mu])
                    Bnu1 = planck(T[-1], lam)
                    Bnu0 = planck(T[-2], lam)
                    Iupw = Bnu1 - (Bnu0 - Bnu1) / dtau
                else:
                    Iupw = 0.0
                I, Psi = np_piecewise_linear(chiTot, S, height, muz[mu],
                                             Iupw, toObs)
                if lambdaIterate:
                    Psi = np.zeros_like(Psi)
                J[la] += 0.5 * wmu[mu] * I
                if toObs:
                    Iout[la, mu] = I[0]

                # Gamma / rates accumulation for active atoms
                for ai, a in enumerate(ctx.activeAtoms):
                    n = pops[ai]
                    Ieff = I - Psi * etaAtom[ai]
                    for ti, t in enumerate(a.trans):
                        if not (t.Nblue <= la < t.Nred):
                            continue
                        Uji, Vij, Vji = uv_ref(ctx, ai, ti, t, la, mu, d,
                                               nStars[ai], T)
                        wlamu = wla_ref(ctx, ai, ti, t, la) * 0.5 * wmu[mu]
                        integ = ((Uji + Vji * Ieff)
                                 - Psi * chiLvl[ai][t.i] * ULvl[ai][t.j])
                        Gamma[ai][t.i, t.j] += integ * wlamu
                        integ = ((Vij * Ieff)
                                 - Psi * chiLvl[ai][t.j] * ULvl[ai][t.i])
                        Gamma[ai][t.j, t.i] += integ * wlamu

    for ai, a in enumerate(ctx.activeAtoms):
        for i in range(a.Nlevel):
            Gamma[ai][i, i] = 0.0
            Gamma[ai][i, i] = -np.sum(Gamma[ai][:, i], axis=0)

    with np.errstate(divide='ignore', invalid='ignore'):
        ratio = np.where(J != 0.0, Jdag / J, 1.0)
    dJMax = np.max(np.abs(1.0 - ratio))
    return J, Iout, Gamma, dJMax
