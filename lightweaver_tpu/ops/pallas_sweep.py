"""Fused Pallas depth-sweep formal solver (1D short characteristics).

The XLA formal-solve stage (ops/formal_solver.py) materialises the
affine-recurrence coefficient tensors A/b/Psi/bNL and evaluates the
depth recurrence with an associative scan -- ~5-8 HBM passes over
[Nlam, Nmu, Nk]-sized tensors (measured 1.2 ms of the 3.7 ms bench
iteration, BREAKDOWN_r04).  This kernel computes the Bezier-3
coefficients AND the sequential recurrence in one pass with everything
resident in VMEM: chi and S are read from HBM exactly once and
I/Psi/IeffBase written exactly once.

Layout: the depth recurrence is sequential in k, so k must NOT be the
lane axis.  The kernel operates on transposed [Nk, Nmu, L] tensors
(lambda minor, padded to 128 lanes); the wrapper pays two XLA
transposes in, three out (the flip for the upgoing sweep rides the same
copy).  Grid = (lambda-blocks, depth-blocks) with depth minor: TPU
grids execute sequentially, so the recurrence carry and the 3-row
coefficient stencil pipeline live in VMEM scratch across depth blocks.

Numerics are IDENTICAL to ops/formal_solver.py `_sweep_coeffs_bezier3`
(same cent_deriv/bezier3_coeffs functions, reused inside the kernel;
ref: /root/reference/Source/FormalScalar.cpp:209-325, Bezier.hpp) --
the per-target stencil is evaluated in a register pipeline:
ingesting row w finalises target m = w - 2 (Steffen derivatives reach
one row ahead, Bezier dtau control points two).

Mosaic constraints (same as ops/pallas_gamma.py): int32 index-map
hygiene, rank-3 blocks with the (mu) axis padded to the 8-sublane f32
tile, scalar depth steps ds passed as SMEM dh[k] * VMEM invmu tile.
"""
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .formal_solver import bezier3_coeffs, cent_deriv, w2

_Z = np.int32(0)

LB = 128          # lambda-block lanes
KB = 64           # depth rows per grid step


def _interpret_mode():
    return jax.default_backend() != 'tpu'


def _sweep_kernel(N: int, dt, dh_ref, invmu_ref, iupw_ref,
                  chi_ref, s_ref, chiLA_ref, sLA_ref,
                  i_ref, psi_ref, ieffb_ref,
                  chiW, sW, state):
    """One (lambda-block, depth-block) grid step.

    Refs: dh [NkPad+2] SMEM; invmu [M, LB]; iupw [M, LB];
    chi/s blocks [KB, M, LB]; lookahead rows [2, M, LB];
    outputs [KB, M, LB]; scratch chiW/sW [KB+2, M, LB],
    state [NSTATE, M, LB] (register pipeline carried across blocks).
    """
    j = pl.program_id(1)
    M, L = invmu_ref.shape

    # Stage the block + 2 lookahead rows so ingest reads are uniform.
    chiW[0:KB] = chi_ref[:]
    chiW[KB:KB + 2] = chiLA_ref[0]
    sW[0:KB] = s_ref[:]
    sW[KB:KB + 2] = sLA_ref[0]

    invmu = invmu_ref[:]

    # register order in `state`:
    # 0 cM1   chi[m-1]    1 cM     chi[m]     2 cM1u  chi[m+1]
    # 3 sM1   S[m-1]      4 sM     S[m]       5 sM1u  S[m+1]
    # 6 dsiM  ds(m,m+1)   7 dchiM  dchi[m]    8 dtauM1 dtau(m-1,m)
    # 9 dSM1  dS[m-1]    10 iPrev  I[m-1]
    @pl.when(j == _Z)
    def _init():
        # prime the pipeline for m = 0: rows 0/1 are staged already;
        # the m-1 registers are garbage-but-finite (ones) -- every
        # quantity derived from them is discarded by the m==0 selects
        ones = jnp.ones((M, L), dt)
        c0 = chiW[0]
        c1 = chiW[1]
        dsi0 = dh_ref[1] * invmu
        state[np.int32(0)] = ones                      # cM1
        state[np.int32(1)] = c0                        # cM
        state[np.int32(2)] = c1                        # cM1u
        state[np.int32(3)] = ones                      # sM1
        state[np.int32(4)] = sW[0]                     # sM
        state[np.int32(5)] = sW[1]                     # sM1u
        state[np.int32(6)] = dsi0                      # dsiM
        state[np.int32(7)] = (c1 - c0) / dsi0          # dchiM (one-sided)
        state[np.int32(8)] = ones                      # dtauM1
        state[np.int32(9)] = ones                      # dSM1
        state[np.int32(10)] = ones                     # iPrev

    def row(r, regs):
        (cM1, cM, cM1u, sM1, sM, sM1u, dsiM, dchiM, dtauM1, dSM1,
         iPrev) = regs
        m = j * np.int32(KB) + r             # target depth index
        w = m + np.int32(2)                  # row being ingested

        # ---- ingest row w (garbage-safe beyond N-1: padded inputs) ----
        cM2 = chiW[pl.ds(r + np.int32(2), 1)][0]
        sM2 = sW[pl.ds(r + np.int32(2), 1)][0]
        # dh[w] = |h[w-1] - h[w]|; ds_int[w-1] = dh[w] * invmu
        dsiM1 = dh_ref[w] * invmu             # interval (m+1, m+2)

        # dchi[m+1]: Steffen central, one-sided at the last point
        dchiC = cent_deriv(dsiM, dsiM1, cM, cM1u, cM2)
        dchiE = (cM1u - cM) / dsiM
        dchiM1 = jnp.where(m + 1 == N - 1, dchiE, dchiC)

        # interval (m, m+1): Bezier chi control points -> dtau[m]
        cCuw = cM + (dsiM * (1.0 / 3.0)) * dchiM
        cC0 = cM1u - (dsiM * (1.0 / 3.0)) * dchiM1
        dtauM = dsiM * (cM + cM1u + cCuw + cC0) * 0.25

        # dS[m] wrt tau: one-sided at m == 0, central otherwise
        dSC = cent_deriv(dtauM1, dtauM, sM1, sM, sM1u)
        dSE0 = (sM1u - sM) / dtauM
        dSM = jnp.where(m == 0, dSE0, dSC)
        # one-sided at the last point (wrt the upwind bezier dtau)
        dSEn = (sM - sM1) / dtauM1
        dSM = jnp.where(m == N - 1, dSEn, dSM)

        # ---- finalise target m ----
        # interior Bezier-3 step over interval (m-1, m)
        alpha, beta, gamma, delta, edt = bezier3_coeffs(dtauM1)
        CuwS = sM1 + (dtauM1 * (1.0 / 3.0)) * dSM1
        C0S = sM - (dtauM1 * (1.0 / 3.0)) * dSM
        b = alpha * sM1 + beta * sM + gamma * CuwS + delta * C0S
        bNL = (alpha * sM1 + gamma * CuwS
               - delta * (dtauM1 * (1.0 / 3.0)) * dSM)
        A = edt
        psiN = beta + delta

        # final point: linear w2 step with plain-average dtau
        dtauE = 0.5 * (cM + cM1) * (dh_ref[m] * invmu)
        dSEnd = (sM - sM1) / dtauE
        w0e, w1e = w2(dtauE)
        isEnd = m == N - 1
        A = jnp.where(isEnd, 1.0 - w0e, A)
        b = jnp.where(isEnd, w0e * sM - w1e * dSEnd, b)
        psiN = jnp.where(isEnd, w0e - w1e / dtauE, psiN)
        bNL = jnp.where(isEnd, (w1e / dtauE) * sM1, bNL)

        # sweep start: I = Iupw, Psi = 0, ieffb = Iupw
        isStart = m == 0
        iupw = iupw_ref[:]
        A = jnp.where(isStart, 0.0, A)
        b = jnp.where(isStart, iupw, b)
        psiN = jnp.where(isStart, 0.0, psiN)
        bNL = jnp.where(isStart, iupw, bNL)

        iM = A * iPrev + b
        ieffb = A * iPrev + bNL
        psiM = psiN / cM

        i_ref[pl.ds(r, 1)] = iM[None]
        psi_ref[pl.ds(r, 1)] = psiM[None]
        ieffb_ref[pl.ds(r, 1)] = ieffb[None]

        # ---- shift the pipeline ----
        return (cM, cM1u, cM2, sM, sM1u, sM2, dsiM1, dchiM1,
                dtauM, dSM, iM)

    regs = tuple(state[np.int32(i)] for i in range(11))
    regs = lax.fori_loop(0, KB, row, regs)
    for i, reg in enumerate(regs):
        state[np.int32(i)] = reg


def sweep_bezier3(chi, S, dh, invmu, Iupw, N: int):
    """Formal solution in sweep order on transposed [NkPad, M, L] data.

    chi, S: [NkPad, M, L] (NkPad = ceil(N/KB)*KB, L = 128-multiple;
    padding rows chi=1, S=0).  dh: [NkPad + 2] per-interval |dheight|
    in sweep order (dh[w] = |h[w-1] - h[w]|, dh[0] unused).
    invmu: [M, L] broadcast 1/|mu|.  Iupw: [M, L].
    Returns I, Psi (divided by chi), IeffBase: [NkPad, M, L].
    """
    from .pallas_gamma import _ensure_recursion_limit
    _ensure_recursion_limit()
    NkPad, M, L = chi.shape
    nK = NkPad // KB
    nL = L // LB
    dt = chi.dtype

    # lookahead rows: first 2 rows of the NEXT depth block
    pad2 = jnp.concatenate([chi[KB:], jnp.ones((KB, M, L), dt)], axis=0)
    chiLA = pad2.reshape(nK, KB, M, L)[:, :2]
    sPad2 = jnp.concatenate([S[KB:], jnp.zeros((KB, M, L), dt)], axis=0)
    sLA = sPad2.reshape(nK, KB, M, L)[:, :2]

    kernel = partial(_sweep_kernel, N, dt)
    grid = (nL, nK)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # dh (full)
            pl.BlockSpec((M, LB), lambda i, j: (_Z, i),
                         memory_space=pltpu.VMEM),            # invmu
            pl.BlockSpec((M, LB), lambda i, j: (_Z, i),
                         memory_space=pltpu.VMEM),            # Iupw
            pl.BlockSpec((KB, M, LB), lambda i, j: (j, _Z, i),
                         memory_space=pltpu.VMEM),            # chi
            pl.BlockSpec((KB, M, LB), lambda i, j: (j, _Z, i),
                         memory_space=pltpu.VMEM),            # S
            pl.BlockSpec((1, 2, M, LB), lambda i, j: (j, _Z, _Z, i),
                         memory_space=pltpu.VMEM),            # chiLA
            pl.BlockSpec((1, 2, M, LB), lambda i, j: (j, _Z, _Z, i),
                         memory_space=pltpu.VMEM),            # sLA
        ],
        out_specs=[
            pl.BlockSpec((KB, M, LB), lambda i, j: (j, _Z, i),
                         memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_shape=[jax.ShapeDtypeStruct((NkPad, M, L), dt)
                   for _ in range(3)],
        scratch_shapes=[
            pltpu.VMEM((KB + 2, M, LB), dt),    # chiW
            pltpu.VMEM((KB + 2, M, LB), dt),    # sW
            pltpu.VMEM((11, M, LB), dt),        # register pipeline
        ],
        interpret=_interpret_mode(),
    )(dh, invmu, Iupw, chi, S, chiLA, sLA)
    return out


def formal_solve_sweep(chi, S, height, muz, IupwD, IupwU):
    """Drop-in for the 1D XLA formal solve at the iteration level.

    chi, S: [NL, Nmu, 2, Nk] (d=0 down/toObs=False, d=1 up).
    height [Nk]; muz [Nmu]; IupwD/IupwU: [NL, Nmu] boundary intensities.
    Returns I, Psi, IeffBase in the same [NL, Nmu, 2, Nk] layout.
    """
    NL, Nmu, _, Nk = chi.shape
    dt = chi.dtype
    L = -(-NL // LB) * LB
    NkPad = -(-Nk // KB) * KB
    M = Nmu

    h = jnp.asarray(height, dt)
    invmu = jnp.broadcast_to(
        (1.0 / jnp.abs(jnp.asarray(muz, dt)))[:, None], (M, L))

    def prep(x, d, flip, padVal):
        # [NL, Nmu, Nk] -> sweep-ordered transposed [NkPad, M, L]
        y = x[:, :, d]
        if flip:
            y = y[..., ::-1]
        y = jnp.transpose(y, (2, 1, 0))
        return jnp.pad(y, ((0, NkPad - Nk), (0, 0), (0, L - NL)),
                       constant_values=padVal)

    def unprep(y, flip):
        y = jnp.transpose(y[:Nk, :, :NL], (2, 1, 0))
        if flip:
            y = y[..., ::-1]
        return y

    def dh_sweep(hs):
        d = jnp.abs(hs[:-1] - hs[1:])
        return jnp.pad(d, (1, NkPad + 2 - Nk),
                       constant_values=jnp.asarray(1.0, dt))

    def bc(b):
        return jnp.pad(b.T, ((0, 0), (0, L - NL)))

    outs = []
    for d, flip, Iupw in ((0, False, IupwD), (1, True, IupwU)):
        hs = h[::-1] if flip else h
        res = sweep_bezier3(prep(chi, d, flip, 1.0),
                            prep(S, d, flip, 0.0),
                            dh_sweep(hs), invmu, bc(Iupw), Nk)
        outs.append(tuple(unprep(r, flip) for r in res))

    I = jnp.stack([outs[0][0], outs[1][0]], axis=2)
    Psi = jnp.stack([outs[0][1], outs[1][1]], axis=2)
    IeffB = jnp.stack([outs[0][2], outs[1][2]], axis=2)
    return I, Psi, IeffB
