"""2D short-characteristics formal solver (x periodic, z stratified).

TPU-native re-design of the reference's plane-by-plane sweep
(ref: /root/reference/Source/FormalScalar2d.cpp:434-706, intersection
geometry :1188-1327):

- The upwind-intersection geometry (which face, interpolation fraction,
  path length) depends only on (grid, mux, muz), so it is precomputed
  host-side as dense arrays instead of C++ stencil objects.
- Cells whose upwind point lies on the previous z-plane are data-parallel
  over x.  Cells whose upwind point lies on the x side face couple to the
  SAME plane's previous column: I(k,j) = A_j I(k,j-dj) + b_j -- an
  affine recurrence along x.  With periodic x this is a CYCLIC affine
  system, which we solve exactly with an associative ring scan; this
  replaces (and improves on) the reference's truncated long-characteristic
  substeps at the periodic seam.
- The outer z sweep is a lax.scan carrying the previous plane, batched
  over wavelength.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .formal_solver import besser_control_point, w2


def _besser_interp(yM, yO, yP, u):
    """Monotonic quadratic-Bezier interpolation between yM (u=0) and yO
    (u=1) with the third upwind point yP shaping the control point
    (uniform spacing).  ref: interp_besser_2d,
    /root/reference/Source/FormalScalar2d.cpp:297-434"""
    cM = besser_control_point(1.0, 1.0, yM, yO, yP)
    return (1.0 - u) ** 2 * yM + 2.0 * u * (1.0 - u) * cM + u ** 2 * yO


def build_geometry_2d(x, z, mux, muz, toObs):
    """Upwind-intersection geometry for one ray direction over the grid.

    x: [Nx] (increasing), z: [Nz] (decreasing with index, like height);
    mux, muz: ray direction for this (mu, toObs) (muz sign included).
    Returns dict of numpy arrays indexed in SWEEP order over planes
    (sweepZ[0] is the starting plane):
      axisZ [Nz-1, Nx] bool: upwind on x side face (couples in-plane),
      w      [Nz-1, Nx]: interpolation weight of the previous plane,
      ds     [Nz-1, Nx]: upwind path length,
      sweepZ [Nz]: z indices in sweep order,
      dj: x-sweep direction.
    ref: /root/reference/Source/FormalScalar2d.cpp:102-142
    """
    Nx, Nz = len(x), len(z)
    dj = 1 if mux >= 0 else -1
    # sweep order: toObs sweeps towards larger height (decreasing k)
    if toObs:
        sweepZ = np.arange(Nz - 1, -1, -1)
    else:
        sweepZ = np.arange(Nz)

    dx = np.empty(Nx)
    if dj > 0:
        dx[1:] = x[1:] - x[:-1]
        dx[0] = x[1] - x[0]                      # periodic: uniform seam
    else:
        dx[:-1] = x[1:] - x[:-1]
        dx[-1] = x[-1] - x[-2]

    axisZ = np.zeros((Nz - 1, Nx), bool)
    wgt = np.zeros((Nz - 1, Nx))
    ds = np.zeros((Nz - 1, Nx))
    for m in range(1, Nz):
        k = sweepZ[m]
        kPrev = sweepZ[m - 1]
        dz = abs(z[k] - z[kPrev])
        tz = dz / max(abs(muz), 1e-30)
        for j in range(Nx):
            tx = (dx[j] / abs(mux)) if mux != 0.0 else np.inf
            if tx < tz:
                # hits the x side face: interpolate along z on column j-dj
                r = tx / tz                       # in (0, 1)
                axisZ[m - 1, j] = True
                wgt[m - 1, j] = r                 # weight of previous plane
                ds[m - 1, j] = tx
            else:
                # hits the previous z-plane: interpolate along x
                q = (tz / tx) if np.isfinite(tx) else 0.0
                axisZ[m - 1, j] = False
                wgt[m - 1, j] = q                 # weight of column j-dj
                ds[m - 1, j] = tz
    return {'axisZ': axisZ, 'w': wgt, 'ds': ds, 'sweepZ': sweepZ, 'dj': dj}


def _ring_affine_solve(A, b):
    """Solve the cyclic affine recurrence I_i = A_i I_{i-1} + b_i around a
    ring (indices in ring order).  A, b: [..., N]. Returns I [..., N]."""
    def compose(u, v):
        Au, bu = u
        Av, bv = v
        return Au * Av, Av * bu + bv

    As = jnp.moveaxis(A, -1, 0)
    bs = jnp.moveaxis(b, -1, 0)
    Ac, bc = jax.lax.associative_scan(compose, (As, bs), axis=0)
    Atot = Ac[-1]
    btot = bc[-1]
    Ilast = btot / (1.0 - Atot)
    I = Ac * Ilast[None] + bc
    return jnp.moveaxis(I, 0, -1)


@partial(jax.jit, static_argnames=('dj', 'interp', 'periodic'))
def _sweep_2d(chi, S, geomAxisZ, geomW, geomDs, Iupw, dj, interp='linear',
              periodic=True, Ibc=None):
    """z-plane sweep for one ray group.

    chi, S: [B, Nzs, Nx] already reordered into sweep order along axis 1;
    geom*: [Nzs-1, Nx]; Iupw: [B, Nx] starting-plane intensity.
    interp: 'linear' | 'besser' upwind interpolation of chi, S and I.
    periodic: cyclic x coupling; when False, the most-upwind x column is
    a fixed (callable) boundary column whose intensity per plane comes
    from Ibc [Nzs-1, B] (sweep order, starting plane excluded) and whose
    Psi is zero (ref: /root/reference/Source/FormalScalar2d.cpp:496-546).

    BESSER intensity interpolation keeps the in-plane coupling affine by
    freezing the monotonic control point at the linear-pass solution: an
    initial ring solve with linear I gives I0, the Bezier control point
    cM(I0) is then a known quantity, and the quadratic term (1-u)^2 in
    the unknown upwind intensity re-enters the affine recurrence exactly
    (a Jacobi linearisation of the reference's Gauss-Seidel x sweep,
    ref: interp_besser_2d /root/reference/Source/FormalScalar2d.cpp:297-434).

    Returns I, Psi (undivided), IeffBase: [B, Nzs, Nx] in sweep order,
    where IeffBase = I - Psi*S accumulated from non-cancelling terms
    (w1*SUw/dtau + (1-w0)*Iuw) for f32 safety in the optically-thick
    limit.
    """
    B, Nzs, Nx = chi.shape
    jPrev = (jnp.arange(Nx) - dj) % Nx
    jPrev2 = (jnp.arange(Nx) - 2 * dj) % Nx
    ringOrder = jnp.arange(Nx) if dj > 0 else jnp.arange(Nx)[::-1]
    invOrder = jnp.argsort(ringOrder)
    j0 = 0 if dj > 0 else Nx - 1                # most-upwind x column
    colMask = (jnp.arange(Nx) == j0)
    if Ibc is None:
        Ibc = jnp.zeros((Nzs - 1, B), chi.dtype)

    def solve_ring(A, b):
        Iring = _ring_affine_solve(A[:, ringOrder], b[:, ringOrder])
        return Iring[:, invOrder]

    def plane_step(carry, inputs):
        Iprev, Iprev2 = carry
        chiP2, chiP, chiC, SP2, SP, SC, axisZ, w, ds, IbcP = inputs
        # chiP/SP/Iprev: previous plane [B, Nx]; chiC/SC: current [B, Nx].
        # axis-Z (side face): upwind = (1-w)*(current, j-dj) + w*(prev, j-dj)
        # axis-X (prev plane): upwind = (1-w)*(prev, j) + w*(prev, j-dj)
        chiPP = chiP[:, jPrev]
        SPP = SP[:, jPrev]
        IPP = Iprev[:, jPrev]

        if interp == 'besser':
            # 3-point monotonic stencils (third point one step further
            # upwind): along x on the previous plane (axis-X) and along
            # z on the upwind column (axis-Z)
            chiUwX = _besser_interp(chiP, chiPP, chiP[:, jPrev2], w)
            SUwX = _besser_interp(SP, SPP, SP[:, jPrev2], w)
            chiUwZ = _besser_interp(chiC[:, jPrev], chiPP,
                                    chiP2[:, jPrev], w)
            SUwZ = _besser_interp(SC[:, jPrev], SPP, SP2[:, jPrev], w)
            chiUw = jnp.where(axisZ, chiUwZ, chiUwX)
            SUw = jnp.where(axisZ, SUwZ, SUwX)
        else:
            chiUw = jnp.where(axisZ,
                              (1.0 - w) * chiC[:, jPrev] + w * chiPP,
                              (1.0 - w) * chiP + w * chiPP)
            SUw = jnp.where(axisZ,
                            (1.0 - w) * SC[:, jPrev] + w * SPP,
                            (1.0 - w) * SP + w * SPP)

        dtau = 0.5 * (chiUw + chiC) * ds
        w0, w1 = w2(dtau)
        c1 = (SUw - SC) / dtau
        base = w0 * SC + w1 * c1

        # known part of (1-w0)*Iuw; the (current, j-dj) term is the
        # in-plane affine coupling with coefficient A
        IuwX = (1.0 - w) * Iprev + w * IPP
        bKnown = jnp.where(axisZ,
                           base + (1.0 - w0) * w * IPP,
                           base + (1.0 - w0) * IuwX)
        A = jnp.where(axisZ, (1.0 - w0) * (1.0 - w), 0.0)
        if not periodic:
            # fixed boundary column: breaks the ring into a plain chain
            A = jnp.where(colMask[None, :], 0.0, A)
            bKnown = jnp.where(colMask[None, :], IbcP[:, None], bKnown)
        Icur = solve_ring(A, bKnown)
        Iuw = jnp.where(axisZ, (1.0 - w) * Icur[:, jPrev] + w * IPP, IuwX)

        if interp == 'besser':
            # second pass: BESSER-interpolated upwind intensity with the
            # control point frozen at the first-pass solution
            IuwXb = _besser_interp(Iprev, IPP, Iprev[:, jPrev2], w)
            cM = besser_control_point(1.0, 1.0, Icur[:, jPrev], IPP,
                                      Iprev2[:, jPrev])
            knownZ = 2.0 * w * (1.0 - w) * cM + w ** 2 * IPP
            bKnown2 = jnp.where(axisZ,
                                base + (1.0 - w0) * knownZ,
                                base + (1.0 - w0) * IuwXb)
            A2 = jnp.where(axisZ, (1.0 - w0) * (1.0 - w) ** 2, 0.0)
            if not periodic:
                A2 = jnp.where(colMask[None, :], 0.0, A2)
                bKnown2 = jnp.where(colMask[None, :], IbcP[:, None],
                                    bKnown2)
            Icur = solve_ring(A2, bKnown2)
            Iuw = jnp.where(axisZ,
                            (1.0 - w) ** 2 * Icur[:, jPrev] + knownZ,
                            IuwXb)

        Psi = w0 - w1 / dtau
        # compensated split: I - Psi*S from non-cancelling terms
        Ieffb = w1 * SUw / dtau + (1.0 - w0) * Iuw
        if not periodic:
            Psi = jnp.where(colMask[None, :], 0.0, Psi)
            Ieffb = jnp.where(colMask[None, :], Icur, Ieffb)
        return (Icur, Iprev), (Icur, Psi, Ieffb)

    # plane m-2 (duplicated at the first interval, where the 3-point
    # stencil falls back towards linear)
    chiP2 = jnp.concatenate([chi[:, :1], chi[:, :-2]], axis=1)
    SP2 = jnp.concatenate([S[:, :1], S[:, :-2]], axis=1)
    inputs = (chiP2.swapaxes(0, 1),
              chi[:, :-1].swapaxes(0, 1), chi[:, 1:].swapaxes(0, 1),
              SP2.swapaxes(0, 1),
              S[:, :-1].swapaxes(0, 1), S[:, 1:].swapaxes(0, 1),
              geomAxisZ, geomW, geomDs, Ibc)
    _, (Iseq, PsiSeq, IeffSeq) = jax.lax.scan(plane_step, (Iupw, Iupw),
                                              inputs)
    I = jnp.concatenate([Iupw[:, None, :], Iseq.swapaxes(0, 1)], axis=1)
    Psi = jnp.concatenate([jnp.zeros((B, 1, Nx), chi.dtype),
                           PsiSeq.swapaxes(0, 1)], axis=1)
    Ieffb = jnp.concatenate([Iupw[:, None, :], IeffSeq.swapaxes(0, 1)],
                            axis=1)
    return I, Psi, Ieffb


def formal_sol_2d(chi, S, geom, Iupw, interp='linear', periodic=True,
                  Ibc=None):
    """2D formal solution for one (mu, toObs) ray over a [Nz, Nx] grid.

    chi, S: [B, Nz, Nx] (natural z order, index 0 = top); geom from
    build_geometry_2d; Iupw: [B, Nx] boundary intensity at the sweep
    start plane; interp: 'linear' | 'besser' upwind interpolation of
    chi, S and I; periodic: cyclic x (False = fixed callable x BC with
    per-plane intensities Ibc [B, Nz] in natural z order).
    Returns I, Psi, IeffBase ([B, Nz, Nx], natural order; Psi divided by
    chi; IeffBase = I - (Psi/chi)*(S*chi) via the compensated split).
    """
    sweepZ = geom['sweepZ']
    chi_s = chi[:, sweepZ]
    S_s = S[:, sweepZ]
    IbcS = None
    if Ibc is not None:
        IbcS = Ibc[:, sweepZ[1:]].swapaxes(0, 1)    # [Nzs-1, B]
    I_s, Psi_s, Ieff_s = _sweep_2d(chi_s, S_s,
                                   jnp.asarray(geom['axisZ']),
                                   jnp.asarray(geom['w'], chi.dtype),
                                   jnp.asarray(geom['ds'], chi.dtype),
                                   Iupw, int(geom['dj']), interp=interp,
                                   periodic=periodic, Ibc=IbcS)
    inv = np.argsort(sweepZ)
    I = I_s[:, inv]
    Psi = Psi_s[:, inv] / chi
    Ieffb = Ieff_s[:, inv]
    return I, Psi, Ieffb
