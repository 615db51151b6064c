"""Fused Pallas depth-sweep formal solver (1D short characteristics).

The XLA formal-solve stage (ops/formal_solver.py) materialises the
affine-recurrence coefficient tensors A/b/Psi/bNL and evaluates the
depth recurrence with an associative scan -- ~5-8 HBM passes over
[Nlam, Nmu, Nk]-sized tensors (measured 1.2 ms of the 3.7 ms bench
iteration, BREAKDOWN_r04).  This kernel computes the Bezier-3
coefficients AND the recurrence in one pass with everything resident
in VMEM: chi and S are read from HBM exactly once and I/Psi/IeffBase
written exactly once.

Design (v3).  Two earlier shapes both lost to XLA on the real chip:
a depth-sequential register pipeline (64 dependent row steps per block
on single-vreg tiles -- latency-bound) and a depth-major blocked scan
(vectorised, but fed through [Nk, Nmu, Nlam] transposes that cost more
than the solve).  v3 keeps the iteration's NATIVE layout
[rows=lambda, Nmu, lanes=depth]:

* depth lives on the LANE axis (Nk padded to a 128 multiple), so the
  Steffen/Bezier stencils are lane rolls (pltpu.roll) and boundary
  handling is lane-index masks;
* the recurrence I_g = A_g I_{g-dir} + b_g is a Kogge-Stone prefix
  composition along lanes: log2(NkL) vectorised levels, identity-
  masked where the shift crosses the array edge (A == 0 at the sweep
  start already truncates the chain at the physical boundary);
* the grid is (lambda-row blocks,) with NO cross-block dependency at
  all -- every block is independent, nothing is sequentialised, and
  the up/down sweeps differ only in roll direction (a trace-time
  constant), so neither direction pays a flip.

Numerics are IDENTICAL to ops/formal_solver.py `_sweep_coeffs_bezier3`
(same cent_deriv/bezier3_coeffs/w2 functions reused inside the kernel;
ref: /root/reference/Source/FormalScalar.cpp:209-325, Bezier.hpp); the
lane-prefix composition reorders the f32 b-accumulation exactly like
the XLA 'parallel'/'blocked' recurrence modes do.

Mosaic constraints: int32 index maps and iotas everywhere (x64 Python
ints trace to int64, whose Mosaic convert lowering recurses forever);
dtype-matched scalars in jnp.where/clip (f64 scalar trunc does not
legalize); explicit index_map on every spec (the synthesized default
returns i64 zeros under x64).
"""
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .formal_solver import bezier3_coeffs, cent_deriv, w2

_Z = np.int32(0)

# lambda rows per grid step.  8 keeps per-block VMEM minimal; larger
# blocks amortise per-block scheduling and give the VPU more rows per
# op (LW_SWEEP_RB env knob for on-chip racing).
import os

RB = int(os.environ.get('LW_SWEEP_RB', '8'))


def _interpret_mode():
    return jax.default_backend() != 'tpu'


def _roll(x, sh):
    """Circular lane shift: result[g] = x[g - sh] (jnp.roll semantics).
    Shift is a static Python int, canonicalised non-negative for
    Mosaic."""
    sh = int(sh) % x.shape[-1]
    if sh == 0:
        return x
    if _interpret_mode():
        return jnp.roll(x, sh, axis=-1)
    # int32 shift: tpu.dynamic_rotate rejects the i64 that a Python int
    # becomes under x64
    return pltpu.roll(x, np.int32(sh), axis=x.ndim - 1)


def lane_sweep_affine(chi, S, dsInt, iupw, gl, N: int, NkL: int,
                      dirn: int, dt):
    """Bezier-3 affine coefficients + Kogge-Stone recurrence with depth
    on the LANE (last) axis — the shared body of the fused Mosaic
    kernels (ops/pallas_sweep.py, ops/pallas_fused.py).

    chi, S, dsInt [..., NkL] (dsInt: path length of interval (g, g+1)
    at lane g, pad 1.0); iupw [..., 1] boundary intensity; gl int32
    lane-index iota of chi's shape.  dirn = +1 sweeps from g=0, -1 from
    g=N-1.  Returns (I, psiN, A, bNL): Psi = psiN / chi and
    IeffBase = A * I_upwind + bNL (the compensated non-local split,
    see ops/formal_solver.py _sweep_coeffs_bezier3).
    """
    zero = jnp.zeros((), dt)
    gStart = np.int32(0 if dirn == 1 else N - 1)
    gEnd = np.int32(N - 1 if dirn == 1 else 0)

    def up(x):
        return _roll(x, dirn)        # value at the upwind neighbour

    def dw(x):
        return _roll(x, -dirn)       # value at the downwind neighbour

    # upwind/downwind interval path lengths at row g
    if dirn == 1:
        dsUW = _roll(dsInt, 1)       # interval (g-1, g)
        dsDW = dsInt                 # interval (g, g+1)
    else:
        dsUW = dsInt                 # interval (g, g+1): g+1 is upwind
        dsDW = _roll(dsInt, 1)       # interval (g-1, g)

    chiUW = up(chi)
    chiDW = dw(chi)

    # Steffen derivative of chi along the sweep; one-sided at the ends
    dC = cent_deriv(dsUW, dsDW, chiUW, chi, chiDW)
    dFwd = (chiDW - chi) / dsDW
    dBwd = (chi - chiUW) / dsUW
    dchi = jnp.where(gl == gStart, dFwd,
                     jnp.where(gl == gEnd, dBwd, dC))

    # Bezier optical depth of the DOWNWIND interval (g, g+dir)
    third = 1.0 / 3.0
    Cuw = chi + (dsDW * third) * dchi
    C0 = chiDW - (dsDW * third) * dw(dchi)
    dtauInt = dsDW * (chi + chiDW + Cuw + C0) * 0.25
    dtUw = up(dtauInt)               # dtau(g-dir, g)

    # source derivative wrt tau; one-sided at the ends
    SUW = up(S)
    SDW = dw(S)
    sC = cent_deriv(dtUw, dtauInt, SUW, S, SDW)
    sFwd = (SDW - S) / dtauInt
    sBwd = (S - SUW) / dtUw
    dS = jnp.where(gl == gStart, sFwd,
                   jnp.where(gl == gEnd, sBwd, sC))

    # interior Bezier-3 step over the upwind interval
    dSM1 = up(dS)
    alpha, beta, gamma, delta, edt = bezier3_coeffs(dtUw)
    CuwS = SUW + (dtUw * third) * dSM1
    C0S = S - (dtUw * third) * dS
    A = edt
    b = alpha * SUW + beta * S + gamma * CuwS + delta * C0S
    psiN = beta + delta
    bNL = alpha * SUW + gamma * CuwS - delta * (dtUw * third) * dS

    # final point: linear w2 step with plain-average dtau
    dtauE = 0.5 * (chi + chiUW) * dsUW
    dSEnd = (S - SUW) / dtauE
    w0e, w1e = w2(dtauE)
    isEnd = gl == gEnd
    A = jnp.where(isEnd, 1.0 - w0e, A)
    b = jnp.where(isEnd, w0e * S - w1e * dSEnd, b)
    psiN = jnp.where(isEnd, w0e - w1e / dtauE, psiN)
    bNL = jnp.where(isEnd, (w1e / dtauE) * SUW, bNL)

    # sweep start: I = Iupw, Psi = 0, ieffb = Iupw
    isStart = gl == gStart
    A = jnp.where(isStart, zero, A)
    b = jnp.where(isStart, iupw, b)
    psiN = jnp.where(isStart, zero, psiN)
    bNL = jnp.where(isStart, iupw, bNL)

    # Kogge-Stone prefix of the affine maps along the sweep.  Identity-
    # mask lanes whose shift source crosses the ARRAY edge (the circular
    # wrap); the A == 0 start lane truncates the chain at the PHYSICAL
    # boundary by itself.
    Ap, bp = A, b
    d = 1
    one = jnp.ones((), dt)
    while d < NkL:
        sh = dirn * d
        if dirn == 1:
            edge = gl < d
        else:
            edge = gl >= NkL - d
        Ash = jnp.where(edge, one, _roll(Ap, sh))
        bsh = jnp.where(edge, zero, _roll(bp, sh))
        bp = Ap * bsh + bp
        Ap = Ap * Ash
        d *= 2

    return bp, psiN, A, bNL          # I_start folds in via A_start = 0


def _two_sum(hi, lo, term):
    """Knuth TwoSum accumulate: (hi, lo) += term, exactly."""
    s = hi + term
    b = s - hi
    err = (hi - (s - b)) + (term - b)
    return s, lo + err


def _sweep_kernel(N: int, dt, NkL: int, dirn: int, wmuHalf,
                  divideS: bool,
                  ds_ref, invmu_ref, iupw_ref, chi_ref, s_ref,
                  i_ref, psi_ref, ieffb_ref,
                  jhi_ref, jlo_ref, psibar_ref, ibar_ref, isbar_ref):
    """One lambda-row block; the full depth axis rides the lanes.

    dirn = +1: sweep from g=0 (down);  dirn = -1: sweep from g=N-1.
    ds_ref [1, NkL]: |h[g] - h[g+1]| at lane g (pad 1.0); invmu [M, 1]
    as [M, 128] lane-uniform; iupw [RB, M]; chi/s and ray outputs
    [RB, M, NkL].

    The kernel also emits this direction's angular-moment rows
    [RB, NkL]: the J contribution as a TwoSum-compensated f32 pair
    (Jhi, Jlo) — Jhi + Jlo evaluated in f64 outside carries ~2^-48
    relative error, preserving the f64-J convergence contract without
    an emulated-f64 pass over the ray tensor (same contract as
    ops/pallas_fused.py) — plus the working-dtype PsiBar/IBar and
    IeffSrcBar = sum_mu w*(IeffBase + Psi*srcNum) moments the factored
    Gamma path and the scattering acceleration consume (Psi*srcNum =
    psiN*S exactly, both being (psiN/chi)*(S*chi)).
    """
    M = invmu_ref.shape[0]
    gl = jax.lax.broadcasted_iota(jnp.int32, (RB, M, NkL), 2)

    chi = chi_ref[:]
    S = s_ref[:]
    if chi.ndim == 4:
        # direction axis selected by the BlockSpec index map (size-1
        # leading block): the kernel DMAs the d-slice straight out of
        # the direction-major [2, LPad, M, NkL] gather output, so no
        # host-side slice copy (Mosaic requires the LAST TWO block dims
        # to equal the array dims, hence direction-major)
        chi = jnp.reshape(chi, (RB, M, NkL))
        S = jnp.reshape(S, (RB, M, NkL))
    if divideS:
        # caller passed srcNum (eta + sca*J): neither etaTot nor S is
        # ever materialised in HBM; the division happens here in VMEM
        S = S / chi
    # explicit slice+reshape: mixed None/slice jnp indexing lowers to a
    # gather Mosaic rejects
    invmu = jnp.reshape(jax.lax.slice(invmu_ref[:], (0, 0), (M, 1)),
                        (1, M, 1))
    dsInt = jnp.reshape(ds_ref[:], (1, 1, NkL)) * invmu  # interval (g, g+1)
    iupw = jnp.reshape(iupw_ref[:], (RB, M, 1))

    I, psiN, A, bNL = lane_sweep_affine(chi, S, dsInt, iupw, gl,
                                        N, NkL, dirn, dt)
    iPrev = _roll(I, dirn)           # garbage at the start lane; A = 0
    ieffb = A * iPrev + bNL
    psi = psiN / chi
    i_ref[:] = I
    psi_ref[:] = psi
    ieffb_ref[:] = ieffb

    jhi = jnp.zeros((RB, NkL), dt)
    jlo = jnp.zeros((RB, NkL), dt)
    psibar = jnp.zeros((RB, NkL), dt)
    ibar = jnp.zeros((RB, NkL), dt)
    isbar = jnp.zeros((RB, NkL), dt)
    for m in range(M):
        w = jnp.asarray(float(wmuHalf[m]), dt)

        def row(x):
            return jnp.reshape(
                jax.lax.slice(x, (0, m, 0), (RB, m + 1, NkL)), (RB, NkL))
        Im = row(I)
        jhi, jlo = _two_sum(jhi, jlo, w * Im)
        ibar = ibar + w * Im
        psibar = psibar + w * row(psi)
        isbar = isbar + w * (row(ieffb) + row(psiN) * row(S))
    jhi_ref[:] = jhi
    jlo_ref[:] = jlo
    psibar_ref[:] = psibar
    ibar_ref[:] = ibar
    isbar_ref[:] = isbar


def _sweep_dir(chi, S, dsLane, invmu, Iupw, N: int, dirn: int, wmuHalf,
               d: int = None, divideS: bool = False):
    """One direction on native-layout [LPad, M, NkL] data, or (when
    ``d`` is given) directly on the direction-major [2, LPad, M, NkL]
    gather output with the direction picked by the BlockSpec index
    map."""
    if d is None:
        LPad, M, NkL = chi.shape
    else:
        _two, LPad, M, NkL = chi.shape
    dt = chi.dtype
    kernel = partial(_sweep_kernel, N, dt, NkL, dirn, wmuHalf, divideS)
    dz = np.int32(d) if d is not None else None
    if d is None:
        rayIn = pl.BlockSpec((RB, M, NkL), lambda i: (i, _Z, _Z),
                             memory_space=pltpu.VMEM)
    else:
        rayIn = pl.BlockSpec((1, RB, M, NkL), lambda i: (dz, i, _Z, _Z),
                             memory_space=pltpu.VMEM)
    ray = pl.BlockSpec((RB, M, NkL), lambda i: (i, _Z, _Z),
                       memory_space=pltpu.VMEM)
    row = pl.BlockSpec((RB, NkL), lambda i: (i, _Z),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(LPad // RB,),
        in_specs=[
            pl.BlockSpec((1, NkL), lambda i: (_Z, _Z),
                         memory_space=pltpu.VMEM),       # ds lanes
            pl.BlockSpec((M, 128), lambda i: (_Z, _Z),
                         memory_space=pltpu.VMEM),       # invmu
            pl.BlockSpec((RB, M), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),       # Iupw
            rayIn,                                       # chi
            rayIn,                                       # S
        ],
        out_specs=[ray, ray, ray, row, row, row, row, row],
        out_shape=([jax.ShapeDtypeStruct((LPad, M, NkL), dt)] * 3
                   + [jax.ShapeDtypeStruct((LPad, NkL), dt)] * 5),
        interpret=_interpret_mode(),
    )(dsLane, invmu, Iupw, chi, S)


def formal_solve_sweep(chi, S, height, muz, IupwD, IupwU, wmu=None,
                       NkTrue=None, divideS=False):
    """Drop-in for the 1D XLA formal solve at the iteration level.

    chi, S: [NL, Nmu, 2, Nk] (d=0 down/toObs=False, d=1 up).  When the
    caller already built them in the DIRECTION-MAJOR kernel layout
    [2, LPad, Nmu, NkL] (rows padded to an RB multiple with chi = 1,
    depth lanes padded to a 128 multiple with chi = 1 / S = 0 — see
    context.gather's sweep-layout branch, which avoids a full pad-copy
    pass over both ray tensors), pass the TRUE depth count as
    ``NkTrue``; outputs are trimmed to [LPad, Nmu, 2, NkTrue] rows-
    padded (the iteration slices rows as needed).
    height [NkTrue]; muz [Nmu]; IupwD/IupwU: [NL, Nmu] boundary
    intensities.
    Returns (I, Psi, IeffBase) in the trimmed layout, plus the
    in-kernel angular moments as a dict: 'Jhi'/'Jlo' (the TwoSum f32 J
    pair, already combined across directions losslessly as two pairs ->
    evaluate Jhi + Jlo in the accumulation dtype) and working-dtype
    'PsiBar'/'IBar'/'IeffSrcBar' [NL, NkTrue].  ``wmu`` is the angular
    quadrature weight vector (moments use wmu/2).
    """
    prePadded = NkTrue is not None
    if prePadded:
        # direction-major kernel layout from the sweep-path gather
        _two, NL, Nmu, NkIn = chi.shape
    else:
        NL, Nmu, _, NkIn = chi.shape
    Nk = NkIn if NkTrue is None else int(NkTrue)
    dt = chi.dtype
    M = Nmu
    NkL = -(-NkIn // 128) * 128
    LPad = -(-NL // RB) * RB
    if prePadded:
        assert NkIn == NkL and NL == LPad
    wmuHalf = tuple(float(0.5 * w) for w in np.asarray(wmu))

    h = jnp.asarray(height, dt)
    dh = jnp.abs(h[:-1] - h[1:])
    dsLane = jnp.pad(dh, (0, NkL - Nk + 1),
                     constant_values=jnp.asarray(1.0, dt))[None, :]
    invmu = jnp.broadcast_to(
        (1.0 / jnp.abs(jnp.asarray(muz, dt)))[:, None], (M, 128))

    def prep(x, d, padVal):
        return jnp.pad(x[:, :, d], ((0, LPad - NL), (0, 0), (0, NkL - Nk)),
                       constant_values=jnp.asarray(padVal, dt))

    NLOut = NL
    outs = []
    for d, dirn, Iupw in ((0, 1, IupwD), (1, -1, IupwU)):
        bc = Iupw.astype(dt)
        if bc.shape[0] != LPad:
            bc = jnp.pad(bc, ((0, LPad - bc.shape[0]), (0, 0)))
        if prePadded:
            # the kernel DMAs the d-slice out of the 4D tensors itself
            res = _sweep_dir(chi, S, dsLane, invmu, bc, Nk, dirn,
                             wmuHalf, d=d, divideS=divideS)
        else:
            res = _sweep_dir(prep(chi, d, 1.0), prep(S, d, 0.0),
                             dsLane, invmu, bc, Nk, dirn, wmuHalf)
        outs.append(tuple(r[:NLOut, :, :Nk] for r in res[:3])
                    + tuple(r[:NLOut, :Nk] for r in res[3:]))

    I = jnp.stack([outs[0][0], outs[1][0]], axis=2)
    Psi = jnp.stack([outs[0][1], outs[1][1]], axis=2)
    IeffB = jnp.stack([outs[0][2], outs[1][2]], axis=2)
    moments = {
        # per-direction TwoSum pairs; each pair is exact, so summing
        # the two pairs in accumDtype outside loses nothing
        'Jhi': (outs[0][3], outs[1][3]),
        'Jlo': (outs[0][4], outs[1][4]),
        'PsiBar': outs[0][5] + outs[1][5],
        'IBar': outs[0][6] + outs[1][6],
        'IeffSrcBar': outs[0][7] + outs[1][7],
    }
    return I, Psi, IeffB, moments
