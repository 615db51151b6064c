"""The Context: device state + jitted MALI iteration functions.

TPU-native re-design of the reference's intensity core
(ref: /root/reference/Source/SimdFullIterationTemplates.hpp:59-781,
 /root/reference/Source/LwMiddleLayer.pyx:2806-4003):

- The reference iterates one wavelength at a time across threads, with
  per-thread Gamma replicas.  Here ALL wavelengths, angles and directions
  are batched into dense tensors; the formal solve runs as one affine
  depth-recurrence over a [Nlambda x Nmu x 2] ray batch, and the Gamma /
  rate accumulations are masked window contractions (einsums) over those
  axes.  No replicas, no reductions beyond the contractions themselves.
- Per-transition ragged wavelength windows (Nblue/Nred) are static Python
  ints at trace time, so every window operation lowers to a static slice
  of the dense [Nlambda, ...] arrays: active-window efficiency without
  ragged data structures.
- MALI preconditioning with overlapping transitions uses a static overlap
  analysis: per-level chi/U accumulators (ref Atom::chi/U) are evaluated
  per transition window as sign-weighted sums of the overlapping
  transitions' contributions.
"""
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as Const
from .atmosphere import Atmosphere, ThermalisedRadiation, ZeroRadiation
from .atomic_model import AtomicLine, AtomicModel
from .background import basic_background
from .iteration_update import IterationUpdate
from .ops.faddeeva import voigt_H
from .ops.formal_solver import formal_sol_1d
from .ops.planck import planck_nu


@dataclass
class TransStatic:
    """Static (trace-time) description of one transition's place in the
    global wavelength grid."""
    isLine: bool
    i: int
    j: int
    Nblue: int
    Nred: int
    lambda0: float
    Aji: float = 0.0
    Bji: float = 0.0
    Bij: float = 0.0
    wavelength: np.ndarray = None       # [W] window grid
    wlambda: np.ndarray = None          # [W] integration weights
    alpha: np.ndarray = None            # [W] continuum cross-section
    polarisable: bool = False

    @property
    def W(self):
        return self.Nred - self.Nblue


def _wlambda(grid: np.ndarray, dopplerWidth: float) -> np.ndarray:
    """Trapezoidal wavelength integration weights over a window
    (ref: /root/reference/Source/LwTransition.hpp:72-82)."""
    w = np.empty_like(grid)
    w[0] = 0.5 * (grid[1] - grid[0])
    w[-1] = 0.5 * (grid[-1] - grid[-2])
    w[1:-1] = 0.5 * (grid[2:] - grid[:-2])
    return w * dopplerWidth


@dataclass
class AtomStatic:
    model: AtomicModel
    Nlevel: int
    trans: List[TransStatic]
    detailed: bool = False
    # overlap analysis: for each level, [(trans_idx, sign)] for chi sums
    chiLists: List[List[Tuple[int, int]]] = field(default_factory=list)
    # for each level, [trans_idx] with j == level (U accumulators)
    ULists: List[List[int]] = field(default_factory=list)

    def build_overlaps(self):
        self.chiLists = [[] for _ in range(self.Nlevel)]
        self.ULists = [[] for _ in range(self.Nlevel)]
        for idx, t in enumerate(self.trans):
            self.chiLists[t.i].append((idx, +1))
            self.chiLists[t.j].append((idx, -1))
            self.ULists[t.j].append(idx)


def _overlap_slices(t: TransStatic, t2: TransStatic):
    lo = max(t.Nblue, t2.Nblue)
    hi = min(t.Nred, t2.Nred)
    if hi <= lo:
        return None
    return slice(lo - t.Nblue, hi - t.Nblue), slice(lo - t2.Nblue,
                                                    hi - t2.Nblue)


class Context:
    """NLTE radiative transfer context over a single atmosphere.

    Mirrors the user-facing API of the reference's LwContext: construct
    from (atmos, spect, eqPops), then iterate formal_sol_gamma_matrices /
    stat_equil to convergence, and read I / J / populations.
    """

    def __init__(self, atmos: Atmosphere, spect, eqPops,
                 ngOptions=None, initSol=None, conserveCharge: bool = False,
                 formalSolver: str = 'piecewise_bezier3_1d',
                 recurrenceMode: str = 'scan',
                 backgroundProvider=None,
                 detailedAtomPops: Optional[Dict] = None,
                 crswCallback=None,
                 dtype=jnp.float64):
        self.atmos = atmos
        self.spect = spect
        self.eqPops = eqPops
        self.conserveCharge = conserveCharge
        self.formalSolver = formalSolver
        self.recurrenceMode = recurrenceMode
        self.dtype = dtype
        self.crswCallback = crswCallback
        self.crswDone = crswCallback is None
        radSet = spect.radSet

        if atmos.muz is None:
            raise ValueError('Atmosphere angular quadrature not set')

        # --- static per-atom transition metadata
        self.activeAtoms: List[AtomStatic] = []
        self.detailedAtoms: List[AtomStatic] = []
        for model in sorted(radSet.activeAtoms, key=lambda a: a.element):
            self.activeAtoms.append(self._build_atom_static(model, False))
        for model in sorted(radSet.detailedAtoms, key=lambda a: a.element):
            self.detailedAtoms.append(self._build_atom_static(model, True))

        # --- background
        if backgroundProvider is None:
            backgroundProvider = basic_background
        self.backgroundProvider = backgroundProvider
        bg = backgroundProvider(spect, atmos, eqPops, radSet)
        self.background = bg

        Nlam = spect.Nspect
        Nspace = atmos.Nspace

        # --- device-side constants
        dt = dtype
        self.wavelength = jnp.asarray(spect.wavelength, dt)
        self.height = jnp.asarray(atmos.height, dt)
        self.muz = jnp.asarray(atmos.muz, dt)
        self.wmu = jnp.asarray(atmos.wmu, dt)
        self.temperature = jnp.asarray(atmos.temperature, dt)
        self.bgChi = jnp.asarray(bg.chi, dt)
        self.bgEta = jnp.asarray(bg.eta, dt)
        self.bgSca = jnp.asarray(bg.sca, dt)

        # --- dynamic state
        self.J = jnp.zeros((Nlam, Nspace), dt)
        self.I = jnp.zeros((Nlam, atmos.Nrays), dt)
        self.popsState = []       # list over active atoms
        for a in self.activeAtoms:
            st = eqPops.atomicPops[a.model.element]
            self.popsState.append({
                'n': jnp.asarray(st.n, dt),
                'nStar': jnp.asarray(st.nStar, dt),
            })
        self.detailedPops = []
        for a in self.detailedAtoms:
            st = eqPops.atomicPops[a.model.element]
            self.detailedPops.append({
                'n': jnp.asarray(st.n, dt),
                'nStar': jnp.asarray(st.nStar, dt),
            })

        # per-atom [Nl, Nl, Nspace] collisional matrices (numpy, host)
        self.C = [np.zeros((a.Nlevel, a.Nlevel, Nspace))
                  for a in self.activeAtoms]
        self.compute_collisions()
        self.compute_profiles()

        self._gamma_fn = None
        self._Gamma = None
        self._Rij = None
        self._Rji = None

    # ------------------------------------------------------------------
    def _build_atom_static(self, model: AtomicModel, detailed: bool) \
            -> AtomStatic:
        spect = self.spect
        trans = []
        for t in model.transitions:
            ident = t.transId
            if ident not in spect.blueIdx:
                continue
            Nblue = spect.blueIdx[ident]
            Nred = spect.redIdx[ident]
            grid = spect.wavelength[Nblue:Nred]
            if isinstance(t, AtomicLine):
                ts = TransStatic(
                    isLine=True, i=t.i, j=t.j, Nblue=Nblue, Nred=Nred,
                    lambda0=t.lambda0, Aji=t.Aji, Bji=t.Bji, Bij=t.Bij,
                    wavelength=np.asarray(grid),
                    wlambda=_wlambda(grid, Const.CLight / t.lambda0),
                    polarisable=t.polarisable)
            else:
                ts = TransStatic(
                    isLine=False, i=t.i, j=t.j, Nblue=Nblue, Nred=Nred,
                    lambda0=t.lambda0,
                    wavelength=np.asarray(grid),
                    wlambda=_wlambda(grid, 1.0),
                    alpha=t.alpha(np.asarray(grid)))
            trans.append(ts)
        a = AtomStatic(model=model, Nlevel=len(model.levels), trans=trans,
                       detailed=detailed)
        a.build_overlaps()
        return a

    # ------------------------------------------------------------------
    def compute_profiles(self):
        """Voigt profiles phi [W, Nmu, 2, Nspace] and normalisation wphi
        per line (ref: /root/reference/Source/FormalScalar.cpp:28-134)."""
        atmos = self.atmos
        dt = self.dtype
        vlosMu = jnp.asarray(atmos.vlos_mu(), dt)       # [Nmu, Nk]
        wmu = self.wmu
        self.transState = []    # parallel to activeAtoms+detailedAtoms trans
        for a in self.activeAtoms + self.detailedAtoms:
            vBroad = jnp.asarray(a.model.vBroad(atmos), dt)
            entries = []
            lineByIdx = {(l.i, l.j): l for l in a.model.lines}
            for t in a.trans:
                if not t.isLine:
                    entries.append(None)
                    continue
                line = lineByIdx[(t.i, t.j)]
                aDamp, Qelast = line.damping(atmos, self.eqPops)
                aDamp = jnp.asarray(aDamp, dt)
                lam = jnp.asarray(t.wavelength, dt)
                vBase = ((lam - t.lambda0) * Const.CLight
                         / t.lambda0)                      # [W]
                s = jnp.asarray([-1.0, 1.0], dt)           # toObs sign
                # vk [W, Nmu, 2, Nk]
                vk = ((vBase[:, None, None, None]
                       + s[None, None, :, None] * vlosMu[None, :, None, :])
                      / vBroad[None, None, None, :])
                phi = (voigt_H(aDamp[None, None, None, :], vk)
                       / (Const.SqrtPi * vBroad[None, None, None, :]))
                wla = jnp.asarray(t.wlambda, dt)
                wphi_inv = jnp.einsum('lmdk,l,m->k', phi, wla, 0.5 * wmu)
                entries.append({'phi': phi, 'wphi': 1.0 / wphi_inv,
                                'aDamp': aDamp, 'Qelast': jnp.asarray(Qelast, dt)})
            self.transState.append(entries)
        self._gamma_fn = None   # profiles changed; rebuild jit closure

    # ------------------------------------------------------------------
    def compute_collisions(self):
        for a, C in zip(self.activeAtoms, self.C):
            C.fill(0.0)
            for col in a.model.collisions:
                col.compute_rates(self.atmos, self.eqPops, C)
            np.clip(C, 0.0, None, out=C)

    # ------------------------------------------------------------------
    def _uv(self, aIdx: int, ti: int, t: TransStatic, nStar):
        """Uji, Vij, Vji for one transition over its window.
        Lines: [W, Nmu, 2, Nk]; continua: [W, 1, 1, Nk].
        ref: /root/reference/Source/LwTransition.hpp:93-144"""
        dt = self.dtype
        lam = jnp.asarray(t.wavelength, dt)
        if t.isLine:
            st = self.transState[aIdx][ti]
            hnu_4pi = Const.HC_FOURPI * (t.lambda0 / lam)
            Vij = hnu_4pi[:, None, None, None] * t.Bij * st['phi']
            Vji = (t.Bji / t.Bij) * Vij
            Uji = (t.Aji / t.Bji) * Vji
        else:
            hc_kl = Const.HC_K / lam                        # [W]
            gij = (nStar[t.i][None, :] / nStar[t.j][None, :]
                   * jnp.exp(-hc_kl[:, None] / self.temperature[None, :]))
            alpha = jnp.asarray(t.alpha, dt)                # [W]
            Vij = jnp.broadcast_to(alpha[:, None],
                                   gij.shape)[:, None, None, :]
            Vji = (gij * alpha[:, None])[:, None, None, :]
            twohc = Const.TwoHC / lam ** 3
            Uji = twohc[:, None, None, None] * Vji
        return Uji, Vij, Vji

    def _wlamu(self, aIdx: int, ti: int, t: TransStatic):
        """Integration weight wla [W, Nk] (without the 0.5 wmu factor).
        ref: /root/reference/Source/LwAtom.hpp:82-128"""
        dt = self.dtype
        wla = jnp.asarray(t.wlambda, dt)
        if t.isLine:
            st = self.transState[aIdx][ti]
            return wla[:, None] * st['wphi'][None, :] * Const.FOURPI_HC
        lam = jnp.asarray(t.wavelength, dt)
        w = (wla / lam) * Const.FOURPI_H
        return jnp.broadcast_to(w[:, None], (t.W, self.atmos.Nspace))

    # ------------------------------------------------------------------
    def _build_gamma_fn(self):
        """Build the jitted full-iteration function."""
        atmos = self.atmos
        Nlam = self.spect.Nspect
        Nmu = atmos.Nrays
        Nk = atmos.Nspace
        dt = self.dtype
        allAtoms = self.activeAtoms + self.detailedAtoms

        lowerThermalised = isinstance(atmos.lowerBc, ThermalisedRadiation)
        upperThermalised = isinstance(atmos.upperBc, ThermalisedRadiation)

        def gather(pops, nStarList):
            """chiTot/etaTot [Nlam, Nmu, 2, Nk] + per-(atom,trans)
            chi/eta/Uji window arrays."""
            chiTot = jnp.broadcast_to(self.bgChi[:, None, None, :],
                                      (Nlam, Nmu, 2, Nk))
            etaTot = jnp.broadcast_to(self.bgEta[:, None, None, :],
                                      (Nlam, Nmu, 2, Nk))
            chiT = []
            etaT = []
            UjiT = []
            for ai, a in enumerate(allAtoms):
                n = pops[ai]
                nStar = nStarList[ai]
                chiA, etaA, UjiA = [], [], []
                for ti, t in enumerate(a.trans):
                    Uji, Vij, Vji = self._uv(ai, ti, t, nStar)
                    chi_t = n[t.i] * Vij - n[t.j] * Vji
                    eta_t = n[t.j] * Uji
                    sl = slice(t.Nblue, t.Nred)
                    chiTot = chiTot.at[sl].add(
                        jnp.broadcast_to(chi_t, (t.W, Nmu, 2, Nk)))
                    etaTot = etaTot.at[sl].add(
                        jnp.broadcast_to(eta_t, (t.W, Nmu, 2, Nk)))
                    chiA.append(chi_t)
                    etaA.append(eta_t)
                    UjiA.append(Uji)
                chiT.append(chiA)
                etaT.append(etaA)
                UjiT.append(UjiA)
            return chiTot, etaTot, chiT, etaT, UjiT

        def formal_solve(chiTot, S):
            """Both sweep directions for all (lambda, mu).
            Returns I, Psi [Nlam, Nmu, 2, Nk]."""
            muzB = jnp.broadcast_to(self.muz[None, :], (Nlam, Nmu)).reshape(-1)
            lam = self.wavelength

            # down sweep (toObs=False, d=0): upper BC
            chiD = chiTot[:, :, 0].reshape(-1, Nk)
            SD = S[:, :, 0].reshape(-1, Nk)
            if upperThermalised:
                Bnu0 = planck_nu(self.temperature[0], lam)
                Bnu1 = planck_nu(self.temperature[1], lam)
                dtau = (0.5 * (chiTot[:, :, 0, 0] + chiTot[:, :, 0, 1])
                        * jnp.abs(self.height[0] - self.height[1])
                        / self.muz[None, :])
                Iupw_d = (Bnu0[:, None] - (Bnu1[:, None] - Bnu0[:, None])
                          / dtau).reshape(-1)
            else:
                Iupw_d = jnp.zeros(Nlam * Nmu, dt)
            I_d, Psi_d = formal_sol_1d(chiD, SD, self.height, muzB, Iupw_d,
                                       to_obs=False, method=self.formalSolver,
                                       mode=self.recurrenceMode)

            # up sweep (toObs=True, d=1): lower BC
            chiU = chiTot[:, :, 1].reshape(-1, Nk)
            SU = S[:, :, 1].reshape(-1, Nk)
            if lowerThermalised:
                BnuN = planck_nu(self.temperature[Nk - 1], lam)
                BnuN1 = planck_nu(self.temperature[Nk - 2], lam)
                dtau = (0.5 * (chiTot[:, :, 1, Nk - 1] + chiTot[:, :, 1, Nk - 2])
                        * jnp.abs(self.height[Nk - 1] - self.height[Nk - 2])
                        / self.muz[None, :])
                Iupw_u = (BnuN[:, None] - (BnuN1[:, None] - BnuN[:, None])
                          / dtau).reshape(-1)
            else:
                Iupw_u = jnp.zeros(Nlam * Nmu, dt)
            I_u, Psi_u = formal_sol_1d(chiU, SU, self.height, muzB, Iupw_u,
                                       to_obs=True, method=self.formalSolver,
                                       mode=self.recurrenceMode)

            I = jnp.stack([I_d.reshape(Nlam, Nmu, Nk),
                           I_u.reshape(Nlam, Nmu, Nk)], axis=2)
            Psi = jnp.stack([Psi_d.reshape(Nlam, Nmu, Nk),
                             Psi_u.reshape(Nlam, Nmu, Nk)], axis=2)
            return I, Psi

        def level_sum_on_window(arrs, a: AtomStatic, t: TransStatic,
                                items, signed):
            """Sum per-transition window arrays (chi or U accumulators) of
            all transitions touching a level, restricted to t's window."""
            out = jnp.zeros((t.W, Nmu, 2, Nk), dt)
            for item in items:
                if signed:
                    t2i, sign = item
                else:
                    t2i, sign = item, 1
                t2 = a.trans[t2i]
                sls = _overlap_slices(t, t2)
                if sls is None:
                    continue
                dstSl, srcSl = sls
                contrib = jnp.broadcast_to(
                    arrs[t2i][srcSl],
                    (srcSl.stop - srcSl.start, Nmu, 2, Nk))
                out = out.at[dstSl].add(sign * contrib)
            return out

        def iteration(popsIn, nStarIn, detPopsIn, detNStarIn, GammaIn, Jdag,
                      lambdaIterate):
            pops = list(popsIn) + list(detPopsIn)
            nStars = list(nStarIn) + list(detNStarIn)
            chiTot, etaTot, chiT, etaT, UjiT = gather(pops, nStars)
            S = ((etaTot
                  + self.bgSca[:, None, None, :] * Jdag[:, None, None, :])
                 / chiTot)
            I, Psi = formal_solve(chiTot, S)
            if lambdaIterate:
                Psi = jnp.zeros_like(Psi)

            Jnew = jnp.einsum('lmdk,m->lk', I, 0.5 * self.wmu)
            dJ = jnp.max(jnp.abs(1.0 - jnp.where(Jnew != 0.0, Jdag / Jnew,
                                                 1.0)))

            GammaOut = []
            RijOut = []
            RjiOut = []
            for ai, a in enumerate(self.activeAtoms):
                nStar = nStars[ai]
                Gamma = GammaIn[ai]
                # eta_atom over the full grid
                etaAtom = jnp.zeros((Nlam, Nmu, 2, Nk), dt)
                for ti, t in enumerate(a.trans):
                    etaAtom = etaAtom.at[t.Nblue:t.Nred].add(
                        jnp.broadcast_to(etaT[ai][ti], (t.W, Nmu, 2, Nk)))
                Ieff = I - Psi * etaAtom

                Rij = []
                Rji = []
                for ti, t in enumerate(a.trans):
                    sl = slice(t.Nblue, t.Nred)
                    Uji, Vij, Vji = self._uv(ai, ti, t, nStar)
                    wla = self._wlamu(ai, ti, t)           # [W, Nk]
                    Ieff_w = Ieff[sl]
                    Psi_w = Psi[sl]
                    I_w = I[sl]
                    chi_i = level_sum_on_window(chiT[ai], a, t,
                                                a.chiLists[t.i], True)
                    chi_j = level_sum_on_window(chiT[ai], a, t,
                                                a.chiLists[t.j], True)
                    U_i = level_sum_on_window(UjiT[ai], a, t,
                                              a.ULists[t.i], False)
                    U_j = level_sum_on_window(UjiT[ai], a, t,
                                              a.ULists[t.j], False)
                    wmu2 = 0.5 * self.wmu
                    integ_ij = (Uji + Vji * Ieff_w) - Psi_w * chi_i * U_j
                    integ_ji = (Vij * Ieff_w) - Psi_w * chi_j * U_i
                    Gij = jnp.einsum('lmdk,lk,m->k', integ_ij, wla, wmu2)
                    Gji = jnp.einsum('lmdk,lk,m->k', integ_ji, wla, wmu2)
                    Gamma = Gamma.at[t.i, t.j].add(Gij)
                    Gamma = Gamma.at[t.j, t.i].add(Gji)
                    Rij.append(jnp.einsum('lmdk,lk,m->k', I_w * Vij, wla,
                                          wmu2))
                    Rji.append(jnp.einsum('lmdk,lk,m->k', Uji + I_w * Vji,
                                          wla, wmu2))

                # finalise: diagonal = -column sums of off-diagonals
                eye = jnp.eye(a.Nlevel, dtype=dt)[:, :, None]
                Gamma = Gamma * (1.0 - eye)
                colSum = jnp.sum(Gamma, axis=0)
                Gamma = Gamma - eye * colSum[None, :, :]
                GammaOut.append(Gamma)
                RijOut.append(Rij)
                RjiOut.append(Rji)

            Iout = I[:, :, 1, 0]        # emergent (upgoing, top)
            return GammaOut, RijOut, RjiOut, Jnew, Iout, dJ

        return jax.jit(iteration, static_argnames=('lambdaIterate',))

    # ------------------------------------------------------------------
    def formal_sol_gamma_matrices(self, lambdaIterate: bool = False,
                                  printUpdate: bool = False) \
            -> IterationUpdate:
        """One full MALI step: formal solution over all wavelengths with
        Gamma-matrix and rate accumulation.
        ref: /root/reference/Source/LwMiddleLayer.pyx:3152"""
        if self._gamma_fn is None:
            self._gamma_fn = self._build_gamma_fn()

        crswVal = self.crswCallback() if self.crswCallback is not None else 1.0
        self.crswDone = crswVal == 1.0

        self.compute_collisions()
        GammaIn = [jnp.asarray(crswVal * C, self.dtype) for C in self.C]
        pops = [st['n'] for st in self.popsState]
        nStar = [st['nStar'] for st in self.popsState]
        detPops = [st['n'] for st in self.detailedPops]
        detNStar = [st['nStar'] for st in self.detailedPops]

        Gamma, Rij, Rji, Jnew, Iout, dJ = self._gamma_fn(
            pops, nStar, detPops, detNStar, GammaIn, self.J,
            lambdaIterate=lambdaIterate)
        self._Gamma = Gamma
        self._Rij = Rij
        self._Rji = Rji
        self.J = Jnew
        self.I = Iout

        update = IterationUpdate(self, updatedJ=True, dJMax=float(dJ),
                                 crsw=crswVal)
        return update

    # ------------------------------------------------------------------
    def stat_equil(self) -> IterationUpdate:
        """Statistical equilibrium solve for each active atom.
        ref: /root/reference/Source/UpdatePopulations.cpp:7-47"""
        if self._Gamma is None:
            raise ValueError('Call formal_sol_gamma_matrices first')
        dPops = []
        for ai, a in enumerate(self.activeAtoms):
            st = self.popsState[ai]
            n = st['n']
            nTotal = jnp.asarray(
                self.eqPops.atomicPops[a.model.element].nTotal, self.dtype)
            nNew = _stat_eq_solve(self._Gamma[ai], n, nTotal)
            dPops.append(float(jnp.max(jnp.abs(1.0 - n / nNew))))
            st['n'] = nNew
        update = IterationUpdate(self, updatedPops=True, dPops=dPops)
        return update

    # ------------------------------------------------------------------
    def formal_sol(self, upOnly: bool = True):
        """Plain formal solution (no operator/rates), updating I (and J)."""
        upd = self.formal_sol_gamma_matrices(lambdaIterate=True)
        return upd

    # convenience accessors ------------------------------------------------
    @property
    def activePops(self):
        return {a.model.element.name: np.asarray(st['n'])
                for a, st in zip(self.activeAtoms, self.popsState)}

    def sync_pops_to_eqPops(self):
        for a, st in zip(self.activeAtoms, self.popsState):
            state = self.eqPops.atomicPops[a.model.element]
            state.pops[:] = np.asarray(st['n'])


@partial(jax.jit)
def _stat_eq_solve(Gamma, n, nTotal):
    """Batched-over-depth statistical equilibrium: replace the row of the
    largest population with particle conservation and solve."""
    Nl = Gamma.shape[0]
    iElim = jnp.argmax(n, axis=0)                       # [Nk]
    rowMask = (jnp.arange(Nl)[:, None] == iElim[None, :])   # [Nl, Nk]
    G = jnp.where(rowMask[:, None, :], 1.0, Gamma)      # [Nl, Nl, Nk]
    rhs = jnp.where(rowMask, nTotal[None, :], 0.0)      # [Nl, Nk]
    Gb = jnp.moveaxis(G, -1, 0)                         # [Nk, Nl, Nl]
    rb = jnp.moveaxis(rhs, -1, 0)[..., None]            # [Nk, Nl, 1]
    sol = jnp.linalg.solve(Gb, rb)[..., 0]              # [Nk, Nl]
    return jnp.moveaxis(sol, 0, -1)
