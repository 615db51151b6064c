"""Fused Pallas kernel for the per-line MALI Gamma/rate accumulation.

The XLA formulation of the Gamma stage materialises, per line
transition, the Uji/Vij/Vji windows, the per-transition chi/eta
windows, and the level-summed chi_i/chi_j/U_i/U_j tensors — ~10 HBM
round trips of each [W, Nmu, 2, Nk] window per iteration.  All of those
are products of the line profile phi with per-wavelength scalars and
per-depth population rows, so one kernel pass over the window computes
everything with phi read from HBM exactly once:

    Vij = a1(la) phi;  Vji = g rho Vij;  Uji = u Vji
    chi_t = n_i Vij - n_j Vji;  eta_t = n_j Uji
    Ieff  = IeffBase + Psi (S chiTot - eta_atom)        [compensated]
    Gij  += wla wmu [(Uji + Vji Ieff) - Psi chi_i U_j]
    Gji  += wla wmu [Vij Ieff - Psi chi_j U_i]
    Rij  += wla wmu I Vij;   Rji += wla wmu (Uji + I Vji)

(ref MALI preconditioning:
/root/reference/Source/SimdFullIterationTemplates.hpp:206-234 and
LwTransition.hpp:93-144; this kernel is the TPU-form of the reference's
SIMD iteration-scheme plugins, SimdImpl_AVX512.cpp:140-646.)

Lines whose windows overlap (same atom) are processed as one GROUP on
the union window, so the level sums chi_i/chi_j/U_i/U_j and the atomic
eta are exact.  Continuum (mu-independent) members enter as dense
[Nlam, Nk] rows; the continuum transitions' own Gamma stays on the XLA
factored-moment path, fed by this kernel's moment outputs:

    PPB_m      = sum_mu wmu Psi phi_m                  [W, Nk]
    PairPPB_p  = sum_mu wmu Psi phi_m phi_m'           [W, Nk]

from which every continuum cross term involving group lines is exact
(the angle-averaged PRD rho is mu-independent, so phi factors out).

Scope (checked by `pallas_scheme_supported`): 1D, factored Gamma, no
hybrid PRD (the comoving rho shift is mu-dependent).  Angle-averaged
PRD is supported via the rho input.  The XLA scheme is the fallback.

Mosaic constraints that shaped this code (measured on the axon v5e
backend, round 3):
- int32 hygiene: under jax_enable_x64, bare Python int literals in
  index maps / scalar ops trace as int64, which the lowering cannot
  legalize (infinite _convert_helper recursion, or 'failed to legalize
  func.return (i32, i64)').  All index-map and in-kernel integer
  constants are np.int32.
- no middle-dim vector broadcasts on rank-4 data ('infer-vector-layout:
  unsupported shape cast'): the kernel carries everything as rank-3
  [rows, M2, Nk] blocks and unrolls the (mu, direction) axis into
  static [rows, Nk] 2-D slices, with the angular weights baked in as
  Python float constants (they are trace-time static).

Wavelength alignment: the caller pads the global wavelength axis to
NlamPad = ceil(Nlam/BW)*BW rows and each group's phi/rho/weights to a
BW-aligned union window; zero wla rows mask every padding contribution.
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_Z = np.int32(0)
_I8 = np.int32(8)


def _ensure_recursion_limit():
    """Tracing the Mosaic kernel inside the (already deep) jaxpr of the
    full MALI iteration exceeds CPython's default 1000-frame recursion
    limit.  Raised lazily on first kernel build, not at import time."""
    sys.setrecursionlimit(max(sys.getrecursionlimit(), 20000))

# lambda-block row count (sublane-divisible)
BW = 16


def aligned_window(Nblue: int, Nred: int):
    """(alignedNblue, Wpad, padLo, padHi) for a BW-aligned window."""
    lo = (Nblue // BW) * BW
    hi = -(-Nred // BW) * BW
    return lo, hi - lo, Nblue - lo, hi - Nred


def line_groups(atom):
    """Connected components of the same-atom line window-overlap graph:
    list of lists of transition indices (each group shares a union
    window in the fused kernel)."""
    from ..context import _overlap_slices
    lines = [(ti, t) for ti, t in enumerate(atom.trans) if t.isLine]
    parent = {ti: ti for ti, _ in lines}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in range(len(lines)):
        for b in range(a + 1, len(lines)):
            if _overlap_slices(lines[a][1], lines[b][1]) is not None:
                parent[find(lines[a][0])] = find(lines[b][0])
    groups = {}
    for ti, _ in lines:
        groups.setdefault(find(ti), []).append(ti)
    return [sorted(g) for _, g in sorted(groups.items())]


def _interpret_mode():
    """Run kernels in interpreter mode off-TPU (CPU tests)."""
    return jax.default_backend() != 'tpu'


def group_gamma_rates(phiS, rhoS, Psi, IeffBase, I, S, chiTot,
                      chiCL, UCL, etaC, n, coefS, wphiS,
                      *, wmuHalf, levels, signs, uIn,
                      alignedNblue: int):
    """Gamma/rate partial sums + phi*Psi moments for one overlap group
    of K line transitions on their BW-aligned union window.

    phiS [K, Wu, M2, Nk] (M2 = Nmu*2, index md = mu*2 + d);
    rhoS [K, Wu, Nk] (ones when not PRD); Psi/IeffBase/I/S/chiTot
    [NlamPad, M2, Nk] dense; chiCL/UCL [Nlevel, NlamPad, Nk] per-level
    continuum member sums (signed); etaC [NlamPad, Nk]; n [Nlevel, Nk];
    coefS [K, Wu, 4] = (a1, gRatio, uRatio, wlaLam) with zero wlaLam on
    rows outside each member's true window; wphiS [K, Nk].

    wmuHalf: static tuple of Nmu Python floats (0.5 * wmu — the same
    angular weight applies to both directions).  levels: [(i, j)] per
    member; signs[m][m2]: (sI, sJ) sign of member m2's chi in member
    m's level sums; uIn[m][m2]: (inI, inJ) membership of m2's Uji in
    m's U_i/U_j.

    Returns (G4 [K*4, nBlk8, Nk] partials, member-major in the order
    Gij,Gji,Rij,Rji; PPB [K, Wu, Nk]; PairPPB [P, Wu, Nk] for pairs
    (m, m2), m < m2 — dummy leading dim 1 when K == 1).
    """
    _ensure_recursion_limit()
    K, Wu, M2, Nk = phiS.shape
    Nmu = M2 // 2
    assert Wu % BW == 0 and alignedNblue % BW == 0
    nBlk = Wu // BW
    nBlk8 = -(-nBlk // 8) * 8
    off = alignedNblue // BW
    dt = phiS.dtype
    pairs = [(m, m2) for m in range(K) for m2 in range(m + 1, K)]
    P = max(len(pairs), 1)
    wmuHalf = [float(w) for w in wmuHalf]

    def kernel(phi_ref, rho_ref, psi_ref, ieffb_ref, i_ref, s_ref,
               chit_ref, chic_ref, uc_ref, etac_ref, n_ref, coef_ref,
               wphi_ref, g4_ref, ppb_ref, pair_ref):
        blk = pl.program_id(0)
        row = lax.rem(blk, _I8)

        @pl.when(row == _Z)
        def _init():
            g4_ref[:] = jnp.zeros(g4_ref.shape, g4_ref.dtype)

        # per-member mu-independent rows
        rho = [rho_ref[m] for m in range(K)]              # [BW, Nk]
        a1 = [coef_ref[m, :, 0][:, None] for m in range(K)]
        gR = [coef_ref[m, :, 1][:, None] for m in range(K)]
        uR = [coef_ref[m, :, 2][:, None] for m in range(K)]
        wl = [coef_ref[m, :, 3][:, None] * wphi_ref[m][None, :]
              for m in range(K)]                          # [BW, Nk]
        nI = [n_ref[levels[m][0]][None, :] for m in range(K)]
        nJ = [n_ref[levels[m][1]][None, :] for m in range(K)]
        etaCb = etac_ref[:]
        chiC = {}
        UC = {}
        for m in range(K):
            iL, jL = levels[m]
            for lvl in (iL, jL):
                if lvl not in chiC:
                    chiC[lvl] = chic_ref[lvl]
                    UC[lvl] = uc_ref[lvl]

        accG = [[jnp.zeros((Nk,), dt) for _ in range(4)]
                for _ in range(K)]
        accPPB = [jnp.zeros((BW, Nk), dt) for _ in range(K)]
        accPair = [jnp.zeros((BW, Nk), dt) for _ in range(len(pairs))]

        for md in range(M2):
            w = wmuHalf[md // 2]
            psi = psi_ref[:, md, :]
            phis = [phi_ref[m, :, md, :] for m in range(K)]
            vij, vji, uji, chiM = [], [], [], []
            etaA = etaCb
            for m in range(K):
                v1 = a1[m] * phis[m]
                v2 = gR[m] * v1 * rho[m]
                u2 = uR[m] * v2
                vij.append(v1)
                vji.append(v2)
                uji.append(u2)
                chiM.append(nI[m] * v1 - nJ[m] * v2)
                etaA = etaA + nJ[m] * u2
                accPPB[m] = accPPB[m] + w * phis[m] * psi
            for pi, (m, m2) in enumerate(pairs):
                accPair[pi] = accPair[pi] + w * phis[m] * phis[m2] * psi
            Ieff = (ieffb_ref[:, md, :]
                    + psi * (s_ref[:, md, :] * chit_ref[:, md, :]
                             - etaA))
            Iw = i_ref[:, md, :]
            for m in range(K):
                iL, jL = levels[m]
                chi_i = chiC[iL]
                chi_j = chiC[jL]
                U_i = UC[iL]
                U_j = UC[jL]
                for m2 in range(K):
                    sI, sJ = signs[m][m2]
                    if sI:
                        chi_i = chi_i + sI * chiM[m2]
                    if sJ:
                        chi_j = chi_j + sJ * chiM[m2]
                    inI, inJ = uIn[m][m2]
                    if inI:
                        U_i = U_i + uji[m2]
                    if inJ:
                        U_j = U_j + uji[m2]
                wlw = w * wl[m]
                accG[m][0] = accG[m][0] + jnp.sum(
                    ((uji[m] + vji[m] * Ieff) - psi * chi_i * U_j) * wlw,
                    axis=0)
                accG[m][1] = accG[m][1] + jnp.sum(
                    (vij[m] * Ieff - psi * chi_j * U_i) * wlw, axis=0)
                accG[m][2] = accG[m][2] + jnp.sum(
                    Iw * vij[m] * wlw, axis=0)
                accG[m][3] = accG[m][3] + jnp.sum(
                    (uji[m] + Iw * vji[m]) * wlw, axis=0)

        for m in range(K):
            ppb_ref[m] = accPPB[m]
            for c in range(4):
                g4_ref[np.int32(m * 4 + c), pl.ds(row, 1), :] += \
                    accG[m][c][None, :]
        for pi in range(len(pairs)):
            pair_ref[pi] = accPair[pi]
        if not pairs:
            pair_ref[0] = jnp.zeros((BW, Nk), dt)

    Nlev = n.shape[0]
    denseSpec = pl.BlockSpec((BW, M2, Nk), lambda i: (off + i, _Z, _Z),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nBlk,),
        in_specs=[
            pl.BlockSpec((K, BW, M2, Nk), lambda i: (_Z, i, _Z, _Z),
                         memory_space=pltpu.VMEM),               # phi
            pl.BlockSpec((K, BW, Nk), lambda i: (_Z, i, _Z),
                         memory_space=pltpu.VMEM),               # rho
            denseSpec, denseSpec, denseSpec, denseSpec, denseSpec,
            pl.BlockSpec((Nlev, BW, Nk), lambda i: (_Z, off + i, _Z),
                         memory_space=pltpu.VMEM),               # chiCL
            pl.BlockSpec((Nlev, BW, Nk), lambda i: (_Z, off + i, _Z),
                         memory_space=pltpu.VMEM),               # UCL
            pl.BlockSpec((BW, Nk), lambda i: (off + i, _Z),
                         memory_space=pltpu.VMEM),               # etaC
            pl.BlockSpec((Nlev, Nk), lambda i: (_Z, _Z),
                         memory_space=pltpu.VMEM),               # n
            pl.BlockSpec((K, BW, 4), lambda i: (_Z, i, _Z),
                         memory_space=pltpu.VMEM),               # coefs
            pl.BlockSpec((K, Nk), lambda i: (_Z, _Z),
                         memory_space=pltpu.VMEM),               # wphi
        ],
        out_specs=[
            pl.BlockSpec((K * 4, 8, Nk), lambda i: (_Z, i // _I8, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BW, Nk), lambda i: (_Z, i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, BW, Nk), lambda i: (_Z, i, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K * 4, nBlk8, Nk), dt),
            jax.ShapeDtypeStruct((K, Wu, Nk), dt),
            jax.ShapeDtypeStruct((P, Wu, Nk), dt),
        ],
        interpret=_interpret_mode(),
    )(phiS, rhoS, Psi, IeffBase, I, S, chiTot,
      chiCL, UCL, etaC, n, coefS, wphiS)
    G4, PPB, PairPPB = out
    return G4.reshape(K, 4, nBlk8, Nk), PPB, PairPPB


def pallas_scheme_supported(cfg) -> bool:
    """Whether the fused Pallas Gamma scheme covers this configuration
    (the XLA scheme is the general fallback)."""
    if cfg.Ndim != 1:
        return False
    if cfg.hprd:
        return False
    if getattr(cfg, 'gammaMode', 'factored') != 'factored':
        return False
    # Mosaic has no 64-bit vectors: f32 working dtype only on the chip
    if (not _interpret_mode()
            and jnp.dtype(cfg.dtype) == jnp.dtype(jnp.float64)):
        return False
    return True
