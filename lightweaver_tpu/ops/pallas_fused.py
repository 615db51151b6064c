"""Fused Pallas lambda-iteration kernel: opacity/emissivity assembly +
formal solve + J / angular-moment accumulation in ONE pass over
lambda-row blocks.

The XLA iteration streams the [Nlam, Nmu, 2, Nk] ray tensors through
HBM several times per MALI step: the gather writes chiTot/etaTot, the
formal solve re-reads them and writes I/Psi/IeffBase, and the J update
re-reads I with an f64-emulated cast (measured 0.67 + 1.75 + 0.46 ms of
the 3.75 ms bench iteration, BREAKDOWN_r04).  This kernel keeps one
lambda-row block of everything resident in VMEM:

    chi = bgChi + sum_c chiCoef[c] * phiPack[c]     (slot-packed lines)
    eta = bgEta + sum_c etaCoef[c] * phiPack[c]
    S   = (eta + sca*J) / chi
    I, Psi, IeffBase = Bezier-3 lane sweep           (pallas_sweep.py)
    J     += wmu/2 * I      (TwoSum-compensated f32 pair -> exact f64)
    PsiBar/IBar/IeffSrcBar angular moments for the factored Gamma path

phi is read from HBM exactly once; chiTot/etaTot/S are never
materialised; I/Psi/IeffBase are written exactly once for the
downstream Gamma stage.

Slot packing: line windows are interval-coloured (ops side:
`assign_line_slots`) so overlapping same-row lines occupy different
slots; C = max simultaneous overlap (2 for FAL-C H6+CaII).  The
per-slot coefficient rows chiCoef/etaCoef [C, Nlam, Nk] absorb the
populations, the per-row a1 = (hc/4pi)(lambda0/lambda) B_ij factors and
the (angle-averaged) PRD rho, so the kernel's line work is two fused
multiply-adds per slot per (mu, direction) slice.

J precision: the (mu, direction) reduction accumulates in an f32
TwoSum pair (Jhi, Jlo); Jhi + Jlo evaluated in f64 outside carries
~2^-48 relative quantisation, preserving the f64-J convergence floor
(CLAUDE.md: a plain f32 J reduction floors dJ at ~1e-2) without
f64-emulated elementwise work on the ray tensor.  All terms are
positive, so the only f32 error left is the deterministic per-product
rounding, which cancels between successive iterations in dJ.

Boundary conditions: zero / thermalised (Planck rows + the in-kernel
dtau from the assembled chi at the outermost lanes, matching
context.formal_solve) / caller data rows, per end, selected at trace
time.

numerics ref: /root/reference/Source/FormalScalar.cpp:209-325 (the
same Bezier-3 short characteristics via ops/formal_solver.py helpers);
the loop structure this kernel fuses is the reference's
SimdFullIterationTemplates.hpp:588-781 per-wavelength pipeline.

Mosaic constraints: see ops/pallas_sweep.py and ops/pallas_gamma.py
(int32 hygiene, rank-3 blocks with static middle indices, dtype-matched
scalars, explicit index maps).
"""
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sweep import RB, _interpret_mode, lane_sweep_affine

_Z = np.int32(0)


def assign_line_slots(allAtoms):
    """Greedy interval colouring of the line windows.

    Returns ({(ai, ti): slot}, C): overlapping windows get distinct
    slots; C (>= 1) is the number of slots = the max simultaneous
    overlap (greedy-by-start is optimal on interval graphs).
    """
    lines = []
    for ai, a in enumerate(allAtoms):
        for ti, t in enumerate(a.trans):
            if t.isLine:
                lines.append((t.Nblue, t.Nred, ai, ti))
    lines.sort()
    slotEnd = []                      # per slot: current rightmost Nred
    slots = {}
    for nb, nr, ai, ti in lines:
        for c in range(len(slotEnd)):
            if slotEnd[c] <= nb:
                slotEnd[c] = nr
                slots[(ai, ti)] = c
                break
        else:
            slots[(ai, ti)] = len(slotEnd)
            slotEnd.append(nr)
    return slots, max(1, len(slotEnd))


def fused_scheme_supported(cfg) -> bool:
    """Whether the fused lambda-iteration kernel covers this
    configuration (the XLA scheme is the general fallback)."""
    if cfg.Ndim != 1:
        return False
    if cfg.hprd:
        return False
    if getattr(cfg, 'gammaMode', 'factored') != 'factored':
        return False
    if cfg.formalSolver != 'piecewise_bezier3_1d':
        return False
    # Mosaic has no 64-bit vectors: on the real TPU the kernel runs at
    # f32 working dtype only (the CPU interpreter covers f64)
    if (not _interpret_mode()
            and jnp.dtype(cfg.dtype) == jnp.dtype(jnp.float64)):
        return False
    return True


def _two_sum(hi, lo, term):
    """Knuth TwoSum accumulate: (hi, lo) += term, exactly."""
    s = hi + term
    b = s - hi
    err = (hi - (s - b)) + (term - b)
    return s, lo + err


def _fused_kernel(N: int, dt, NkL: int, Nmu: int, C: int,
                  invmu, wmuHalf, upperKind: str, lowerKind: str,
                  phi_ref, chico_ref, etaco_ref, bgchi_ref, bgeta_ref,
                  scaj_ref, ds_ref, bcup_ref, bclo_ref, bnuup_ref,
                  bnulo_ref,
                  i_ref, psi_ref, ieffb_ref, jhi_ref, jlo_ref,
                  psibar_ref, ibar_ref, ieffsbar_ref):
    """One lambda-row block (RB rows); depth rides the lanes.

    invmu/wmuHalf: static tuples of Nmu Python floats.  md = mu*2 + d
    with d=0 the down sweep (from g=0), d=1 up (from g=N-1).
    """
    M2 = 2 * Nmu
    gl = jax.lax.broadcasted_iota(jnp.int32, (RB, NkL), 1)
    zero = jnp.zeros((), dt)
    half = jnp.asarray(0.5, dt)

    bg = bgchi_ref[:]
    be = bgeta_ref[:]
    sj = scaj_ref[:]
    ds = ds_ref[:]                                # [1, NkL]

    jhi = jnp.zeros((RB, NkL), dt)
    jlo = jnp.zeros((RB, NkL), dt)
    psibar = jnp.zeros((RB, NkL), dt)
    ibar = jnp.zeros((RB, NkL), dt)
    isbar = jnp.zeros((RB, NkL), dt)

    for md in range(M2):
        mu, d = md // 2, md % 2
        dirn = 1 if d == 0 else -1
        im = jnp.asarray(float(invmu[mu]), dt)
        w = jnp.asarray(float(wmuHalf[mu]), dt)

        chi = bg
        eta = be
        for c in range(C):
            p = phi_ref[c, :, md, :]
            chi = chi + chico_ref[c] * p
            eta = eta + etaco_ref[c] * p
        src = eta + sj
        S = src / chi
        dsInt = ds * im                           # [1, NkL] broadcast

        # upwind boundary intensity for this sweep direction
        if d == 0:
            kind, bc_ref, bnu_ref = upperKind, bcup_ref, bnuup_ref
            e0, e1 = 0, 1                          # outermost two lanes
        else:
            kind, bc_ref, bnu_ref = lowerKind, bclo_ref, bnulo_ref
            e0, e1 = N - 1, N - 2
        if kind == 'data':
            iupw = lax.slice(bc_ref[:], (0, mu), (RB, mu + 1))
        elif kind == 'therm':
            from .pallas_sweep import _roll
            # roll the boundary lane to 0 before slicing: Mosaic cannot
            # broadcast a [1, 1] vector sliced at an unaligned lane
            # offset ('Invalid input layout' at lane N-2)
            bnu0 = lax.slice(bnu_ref[:], (0, 0), (RB, 1))
            bnu1 = lax.slice(bnu_ref[:], (0, 1), (RB, 2))
            c0 = lax.slice(_roll(chi, -e0), (0, 0), (RB, 1))
            c1 = lax.slice(_roll(chi, -e1), (0, 0), (RB, 1))
            dsE = lax.slice(_roll(dsInt, -min(e0, e1)), (0, 0), (1, 1))
            dtauE = half * (c0 + c1) * dsE
            iupw = bnu0 - (bnu1 - bnu0) / dtauE
        else:
            iupw = jnp.zeros((RB, 1), dt)

        I, psiN, A, bNL = lane_sweep_affine(chi, S, dsInt, iupw, gl,
                                            N, NkL, dirn, dt)
        from .pallas_sweep import _roll
        iPrev = _roll(I, dirn)                    # garbage at start; A=0
        psi = psiN / chi
        ieffb = A * iPrev + bNL
        i_ref[:, md, :] = I
        psi_ref[:, md, :] = psi
        ieffb_ref[:, md, :] = ieffb

        jhi, jlo = _two_sum(jhi, jlo, w * I)
        psibar = psibar + w * psi
        ibar = ibar + w * I
        isbar = isbar + w * (ieffb + psiN * S)    # Psi*chi*S = psiN*S

    jhi_ref[:] = jhi
    jlo_ref[:] = jlo
    psibar_ref[:] = psibar
    ibar_ref[:] = ibar
    ieffsbar_ref[:] = isbar


def fused_lambda_step(phiP, chiCo, etaCo, bgChi, bgEta, scaJ, dsLane,
                      bcUp, bcLo, bnuUp, bnuLo, *, N: int, Nmu: int,
                      muz, wmu, upperKind: str, lowerKind: str):
    """Run the fused lambda-iteration kernel on padded, packed inputs.

    phiP [C, LPad, M2, NkL]; chiCo/etaCo [C, LPad, NkL];
    bgChi/bgEta/scaJ [LPad, NkL] (bgChi pad rows/lanes = 1.0, others 0);
    dsLane [1, NkL] (|h[g] - h[g+1]| at lane g, pad 1.0);
    bcUp/bcLo [LPad, Nmu] data rows (zeros when unused);
    bnuUp/bnuLo [LPad, 2] Planck rows at the outer two depths.

    Returns (I, Psi, IeffBase [LPad, M2, NkL],
             Jhi, Jlo, PsiBar, IBar, IeffSrcBar [LPad, NkL]).
    """
    from .pallas_gamma import _ensure_recursion_limit
    _ensure_recursion_limit()
    C, LPad, M2, NkL = phiP.shape
    dt = phiP.dtype
    assert LPad % RB == 0 and NkL % 128 == 0 and M2 == 2 * Nmu
    invmu = tuple(float(1.0 / abs(m)) for m in np.asarray(muz))
    wmuHalf = tuple(float(0.5 * w) for w in np.asarray(wmu))
    kernel = partial(_fused_kernel, N, dt, NkL, Nmu, C,
                     invmu, wmuHalf, upperKind, lowerKind)

    rowSpec = pl.BlockSpec((RB, NkL), lambda i: (i, _Z),
                           memory_space=pltpu.VMEM)
    outSpec3 = pl.BlockSpec((RB, M2, NkL), lambda i: (i, _Z, _Z),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(LPad // RB,),
        in_specs=[
            pl.BlockSpec((C, RB, M2, NkL), lambda i: (_Z, i, _Z, _Z),
                         memory_space=pltpu.VMEM),      # phiP
            pl.BlockSpec((C, RB, NkL), lambda i: (_Z, i, _Z),
                         memory_space=pltpu.VMEM),      # chiCo
            pl.BlockSpec((C, RB, NkL), lambda i: (_Z, i, _Z),
                         memory_space=pltpu.VMEM),      # etaCo
            rowSpec, rowSpec, rowSpec,                  # bgChi/bgEta/scaJ
            pl.BlockSpec((1, NkL), lambda i: (_Z, _Z),
                         memory_space=pltpu.VMEM),      # ds lanes
            pl.BlockSpec((RB, Nmu), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),      # bcUp
            pl.BlockSpec((RB, Nmu), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),      # bcLo
            pl.BlockSpec((RB, 2), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),      # bnuUp
            pl.BlockSpec((RB, 2), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),      # bnuLo
        ],
        out_specs=[outSpec3, outSpec3, outSpec3,
                   rowSpec, rowSpec, rowSpec, rowSpec, rowSpec],
        out_shape=([jax.ShapeDtypeStruct((LPad, M2, NkL), dt)] * 3
                   + [jax.ShapeDtypeStruct((LPad, NkL), dt)] * 5),
        interpret=_interpret_mode(),
    )(phiP, chiCo, etaCo, bgChi, bgEta, scaJ, dsLane,
      bcUp, bcLo, bnuUp, bnuLo)
