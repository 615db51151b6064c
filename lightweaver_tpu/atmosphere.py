"""Atmospheric models: stratification, boundary conditions, angular
quadrature.

Setup-time numpy structures; the Context converts these to device arrays.
ref: /root/reference/lightweaver/atmosphere.py (1636 LoC); this is a
re-design focused on the 1D/2D plane-parallel cases.  Hydrostatic
reconstruction uses the Saha EOS (eos.py) when ne/nHTot are not given.
"""
from dataclasses import dataclass, field
from enum import Enum
from pathlib import Path
from typing import Optional, Sequence, Union

import numpy as np
from numpy.polynomial.legendre import leggauss

DATA_DIR = Path(__file__).resolve().parent / 'data'


class ScaleType(Enum):
    Geometric = 0
    ColumnMass = 1
    Tau500 = 2


class BoundaryCondition:
    """Base class for radiation boundary conditions."""

    def compute_bc(self, atmos: 'Atmosphere', spect) -> Optional[np.ndarray]:
        """Return I_incident[Nwave, Nmu, Nspatial] or None when the
        condition is handled analytically in the solver."""
        return None


class NoBc(BoundaryCondition):
    pass


class ZeroRadiation(BoundaryCondition):
    pass


class ThermalisedRadiation(BoundaryCondition):
    pass


class PeriodicRadiation(BoundaryCondition):
    pass


@dataclass
class Stratifications:
    cmass: np.ndarray
    tauRef: np.ndarray


@dataclass
class Atmosphere:
    """1D plane-parallel (or flattened 2D) atmosphere.

    All arrays are [Nspace] with k=0 the top of the atmosphere (closest to
    the observer).  Height decreases with k.
    """
    height: np.ndarray
    temperature: np.ndarray
    vlos: np.ndarray
    vturb: np.ndarray
    ne: np.ndarray
    nHTot: np.ndarray
    B: Optional[np.ndarray] = None
    gammaB: Optional[np.ndarray] = None
    chiB: Optional[np.ndarray] = None
    lowerBc: BoundaryCondition = field(default_factory=ThermalisedRadiation)
    upperBc: BoundaryCondition = field(default_factory=ZeroRadiation)
    stratifications: Optional[Stratifications] = None
    Ndim: int = 1
    # 2D extensions (Ndim == 2): flattened [Nz*Nx] primary arrays plus
    # the x grid and velocity components
    x: Optional[np.ndarray] = None
    Nz: Optional[int] = None
    Nx: Optional[int] = None
    vx: Optional[np.ndarray] = None
    vz: Optional[np.ndarray] = None
    xLowerBc: BoundaryCondition = field(default_factory=PeriodicRadiation)
    xUpperBc: BoundaryCondition = field(default_factory=PeriodicRadiation)

    muz: np.ndarray = field(default=None, repr=False)
    mux: np.ndarray = field(default=None, repr=False)
    muy: np.ndarray = field(default=None, repr=False)
    wmu: np.ndarray = field(default=None, repr=False)

    @property
    def Nspace(self) -> int:
        return self.height.shape[0]

    @property
    def Nrays(self) -> int:
        if self.muz is None:
            raise ValueError('Angular quadrature not set: call quadrature()')
        return self.muz.shape[0]

    @property
    def zLowerBc(self):
        return self.lowerBc

    @property
    def zUpperBc(self):
        return self.upperBc

    @property
    def cmass(self):
        return self.stratifications.cmass if self.stratifications else None

    @property
    def tauRef(self):
        return self.stratifications.tauRef if self.stratifications else None

    @classmethod
    def make_1d(cls, scale: ScaleType, depthScale: np.ndarray,
                temperature: np.ndarray, vlos: np.ndarray,
                vturb: np.ndarray, ne: Optional[np.ndarray] = None,
                hydrogenPops: Optional[np.ndarray] = None,
                nHTot: Optional[np.ndarray] = None,
                B: Optional[np.ndarray] = None,
                gammaB: Optional[np.ndarray] = None,
                chiB: Optional[np.ndarray] = None,
                lowerBc: Optional[BoundaryCondition] = None,
                upperBc: Optional[BoundaryCondition] = None,
                abundance=None,
                verbose: bool = False) -> 'Atmosphere':
        """Build a 1D atmosphere on a Geometric / ColumnMass / Tau500
        depth scale.  When ne (and/or nHTot) are omitted they are
        reconstructed hydrostatically with the Saha EOS.

        ref: /root/reference/lightweaver/atmosphere.py:749-1160
        """
        from . import constants as Const
        from .atomic_table import DefaultAtomicAbundance
        if abundance is None:
            abundance = DefaultAtomicAbundance

        depthScale = np.asarray(depthScale, dtype=np.float64)
        temperature = np.asarray(temperature, dtype=np.float64)
        vlos = np.asarray(vlos, dtype=np.float64)
        vturb = np.asarray(vturb, dtype=np.float64)

        if nHTot is None and hydrogenPops is not None:
            nHTot = np.sum(hydrogenPops, axis=0)
        if ne is None or nHTot is None:
            # hydrostatic reconstruction via the Saha EOS
            # (ref: /root/reference/lightweaver/atmosphere.py:748-1160,
            #  which uses the Wittmann EOS)
            from .eos import SahaEos
            eos = SahaEos(abundance=abundance)
            g = Const.GSurface
            Nspace = depthScale.shape[0]
            if scale == ScaleType.ColumnMass:
                pgas = g * np.maximum(depthScale, 1e-6)
                out = eos.solve(temperature, pgas)
            elif scale == ScaleType.Geometric:
                pgas = np.empty(Nspace)
                pgas[0] = g * 6e-5            # ~ solar top column mass
                out0 = eos.solve(temperature[:1], pgas[:1])
                rhoPrev = out0['rho'][0]
                for k in range(1, Nspace):
                    dz = depthScale[k - 1] - depthScale[k]
                    p = pgas[k - 1] + g * rhoPrev * dz
                    for _ in range(3):        # implicit midpoint fixpoint
                        ok = eos.solve(temperature[k:k + 1],
                                       np.array([p]))
                        p = (pgas[k - 1]
                             + g * 0.5 * (rhoPrev + ok['rho'][0]) * dz)
                    pgas[k] = p
                    rhoPrev = ok['rho'][0]
                out = eos.solve(temperature, pgas)
            elif scale == ScaleType.Tau500:
                tau = np.maximum(depthScale, 1e-9)
                pgas = np.empty(Nspace)
                p = g * 6e-5
                for _ in range(5):            # top boundary: p ~ g tau/kappa
                    o = eos.solve(temperature[:1], np.array([p]))
                    kap = (eos.chi_500(temperature[:1], o['ne'],
                                       o['nHTot']) / o['rho'])[0]
                    p = max(g * tau[0] / kap, g * 6e-5)
                pgas[0] = p
                oPrev = eos.solve(temperature[:1], pgas[:1])
                kapPrev = (eos.chi_500(temperature[:1], oPrev['ne'],
                                       oPrev['nHTot']) / oPrev['rho'])[0]
                for k in range(1, Nspace):
                    dtau = tau[k] - tau[k - 1]
                    p = pgas[k - 1] + g * dtau / kapPrev
                    for _ in range(3):
                        ok = eos.solve(temperature[k:k + 1], np.array([p]))
                        kap = (eos.chi_500(temperature[k:k + 1], ok['ne'],
                                           ok['nHTot']) / ok['rho'])[0]
                        p = pgas[k - 1] + g * dtau * 2.0 / (kapPrev + kap)
                    pgas[k] = p
                    kapPrev = kap
                out = eos.solve(temperature, pgas)
            else:
                raise ValueError(f'Unknown scale {scale}')
            ne = out['ne'] if ne is None else np.asarray(ne, np.float64)
            nHTot = out['nHTot']
        ne = np.asarray(ne, dtype=np.float64)
        nHTot = np.asarray(nHTot, dtype=np.float64)

        if lowerBc is None:
            lowerBc = ThermalisedRadiation()
        if upperBc is None:
            upperBc = ZeroRadiation()
        if isinstance(lowerBc, PeriodicRadiation) or isinstance(upperBc, PeriodicRadiation):
            raise ValueError('Cannot use periodic BCs on the z axis of a 1D atmosphere')

        from . import constants as Const
        rho = Const.Amu * abundance.massPerH * nHTot
        Nspace = depthScale.shape[0]

        if scale == ScaleType.Geometric:
            height = depthScale
            cmass = np.zeros(Nspace)
            cmass[0] = ((nHTot[0] * abundance.massPerH + ne[0])
                        * (Const.KBoltzmann * temperature[0] / 10 ** 2.44))
            for k in range(1, Nspace):
                cmass[k] = cmass[k - 1] + 0.5 * ((rho[k - 1] + rho[k])
                                                 * (height[k - 1] - height[k]))
        elif scale == ScaleType.ColumnMass:
            cmass = depthScale
            height = np.zeros(Nspace)
            for k in range(1, Nspace):
                height[k] = height[k - 1] - 2.0 * ((cmass[k] - cmass[k - 1])
                                                   / (rho[k - 1] + rho[k]))
            # Zero-point of height is arbitrary for the transfer problem;
            # anchored roughly mid-atmosphere rather than at tau500 = 1
            # (which would require the background EOS).
            height -= height[Nspace // 2]
        elif scale == ScaleType.Tau500:
            # height from dtau = chi500 dh with chi500 from the Saha EOS
            from .eos import SahaEos
            eos2 = SahaEos(abundance=abundance)
            tau = np.maximum(np.asarray(depthScale, np.float64), 1e-9)
            chi500 = eos2.chi_500(temperature, ne, nHTot)
            height = np.zeros(Nspace)
            for k in range(1, Nspace):
                height[k] = height[k - 1] - 2.0 * (tau[k] - tau[k - 1]) \
                    / (chi500[k - 1] + chi500[k])
            iTau1 = int(np.argmin(np.abs(tau - 1.0)))
            height -= height[iTau1]
            cmass = np.zeros(Nspace)
            cmass[0] = tau[0] / chi500[0] * rho[0]
            for k in range(1, Nspace):
                cmass[k] = cmass[k - 1] + 0.5 * ((rho[k - 1] + rho[k])
                                                 * (height[k - 1] - height[k]))
        else:
            raise ValueError(f'Unknown scale {scale}')

        strat = Stratifications(cmass=cmass, tauRef=np.zeros(Nspace))
        atmos = cls(height=height, temperature=temperature, vlos=vlos,
                    vturb=vturb, ne=np.copy(ne), nHTot=nHTot, B=B,
                    gammaB=gammaB, chiB=chiB, lowerBc=lowerBc,
                    upperBc=upperBc, stratifications=strat)
        return atmos

    def quadrature(self, Nrays: Optional[int] = None,
                   mu: Optional[Sequence[float]] = None,
                   wmu: Optional[Sequence[float]] = None):
        """Set the angular quadrature: Gauss-Legendre on (0,1) in mu for 1D;
        Stepan et al. (2020) near-optimal sets for 2D.
        ref: /root/reference/lightweaver/atmosphere.py:1340-1457
        """
        if self.Ndim == 1:
            if Nrays is not None and mu is None:
                if Nrays < 1:
                    raise ValueError(f'Unsupported Nrays={Nrays}')
                x, w = leggauss(Nrays)
                self.muz = 0.5 + 0.5 * x
                self.wmu = 0.5 * w
            elif mu is not None:
                if wmu is None or len(mu) != len(wmu):
                    raise ValueError('mu and wmu must both be given, same length')
                self.muz = np.array(mu, dtype=np.float64)
                self.wmu = np.array(wmu, dtype=np.float64)
            else:
                raise ValueError('Provide Nrays or (mu, wmu)')
            self.muy = np.zeros_like(self.muz)
            self.mux = np.sqrt(1.0 - self.muz ** 2)
        else:
            quads = np.load(DATA_DIR / 'quadratures_2d.npz')
            byRays = {int(k.split('n')[1]): k for k in quads.files}
            if Nrays not in byRays:
                raise ValueError(f'2D Nrays must be one of {sorted(byRays)}')
            quad = np.atleast_2d(quads[byRays[Nrays]])
            n = quad.shape[0]
            theta = np.deg2rad(quad[:, 1])
            chi = np.deg2rad(quad[:, 2])
            self.mux = np.concatenate([np.sin(theta) * np.cos(chi),
                                       -np.sin(theta) * np.cos(chi)])
            self.muz = np.concatenate([np.cos(theta), np.cos(theta)])
            w = np.concatenate([quad[:, 0], quad[:, 0]])
            self.wmu = w / np.sum(w)
            self.muy = np.sqrt(np.maximum(
                1.0 - (self.mux ** 2 + self.muz ** 2), 0.0))

    def rays(self, muz: Union[float, Sequence[float]], wmu=None):
        """Replace the quadrature with an explicit set of outgoing rays
        (used for final synthesis)."""
        if np.isscalar(muz):
            muz = [muz]
        self.muz = np.array(muz, dtype=np.float64)
        self.wmu = (np.zeros_like(self.muz) if wmu is None
                    else np.asarray(wmu, dtype=np.float64))
        self.muy = np.zeros_like(self.muz)
        self.mux = np.sqrt(1.0 - self.muz ** 2)

    def vlos_mu(self) -> np.ndarray:
        """Projected bulk velocity [Nrays, Nspace]: mu_z v_z (1D) or
        mu_x v_x + mu_z v_z (2D).
        ref: /root/reference/Source/Atmosphere.cpp:5-45"""
        if self.Ndim == 2:
            return (self.mux[:, None] * self.vx[None, :]
                    + self.muz[:, None] * self.vz[None, :])
        return self.muz[:, None] * self.vlos[None, :]

    @classmethod
    def make_2d(cls, height: np.ndarray, x: np.ndarray,
                temperature: np.ndarray, vx: np.ndarray, vz: np.ndarray,
                vturb: np.ndarray, ne: np.ndarray, nHTot: np.ndarray,
                B: Optional[np.ndarray] = None,
                gammaB: Optional[np.ndarray] = None,
                chiB: Optional[np.ndarray] = None,
                lowerBc: Optional[BoundaryCondition] = None,
                upperBc: Optional[BoundaryCondition] = None) -> 'Atmosphere':
        """2D (x, z) cartesian atmosphere with periodic x.

        height: [Nz] decreasing; x: [Nx] increasing; all field arrays
        [Nz, Nx] (flattened internally, k = z*Nx + x).
        ref: /root/reference/lightweaver/atmosphere.py:1161+"""
        Nz, Nx = temperature.shape
        flat = lambda a: (np.asarray(a, np.float64).reshape(-1)
                          if a is not None else None)
        heightFull = np.repeat(np.asarray(height, np.float64), Nx)
        return cls(
            height=heightFull, temperature=flat(temperature),
            vlos=flat(vz), vturb=flat(vturb), ne=flat(ne), nHTot=flat(nHTot),
            B=flat(B), gammaB=flat(gammaB), chiB=flat(chiB),
            lowerBc=lowerBc or ThermalisedRadiation(),
            upperBc=upperBc or ZeroRadiation(),
            Ndim=2, x=np.asarray(x, np.float64), Nz=Nz, Nx=Nx,
            vx=flat(vx), vz=flat(vz))

    @property
    def zGrid(self) -> np.ndarray:
        """The z (height) axis [Nz] for 2D atmospheres."""
        return self.height[::self.Nx] if self.Ndim == 2 else self.height

    def B_projections(self):
        """cos(gamma), cos(2 chi), sin(2 chi) projections of the magnetic
        field onto each ray [Nrays, Nspace] (1D: field angles relative to
        the vertical).
        ref: /root/reference/Source/Atmosphere.cpp:50-84"""
        if self.B is None:
            raise ValueError('No magnetic field present')
        # ray direction: (mux, muy, muz); field dir from (gammaB, chiB)
        bx = np.sin(self.gammaB) * np.cos(self.chiB)
        by = np.sin(self.gammaB) * np.sin(self.chiB)
        bz = np.cos(self.gammaB)
        mux, muy, muz = self.mux, self.muy, self.muz
        b3 = (mux[:, None] * bx[None, :] + muy[:, None] * by[None, :]
              + muz[:, None] * bz[None, :])                  # cos(gamma)
        vertical = np.abs(muz) >= 1.0 - 1e-12               # [Nmu]
        cscTheta = 1.0 / np.sqrt(np.maximum(1.0 - muz ** 2, 1e-30))
        b1 = cscTheta[:, None] * (bz[None, :] - muz[:, None] * b3)
        b2 = cscTheta[:, None] * (muy[:, None] * bx[None, :]
                                  - mux[:, None] * by[None, :])
        denom = np.maximum(1.0 - b3 ** 2, 1e-30)
        cos2chi = (b1 ** 2 - b2 ** 2) / denom
        sin2chi = 2.0 * b1 * b2 / denom
        # field parallel to the ray: azimuth undefined, polarised weights
        # multiply sin^2(gamma) = 0 anyway
        degenerate = (1.0 - b3 ** 2) < 1e-12
        cos2chi = np.where(degenerate, 1.0, cos2chi)
        sin2chi = np.where(degenerate, 0.0, sin2chi)
        v = vertical[:, None]
        cosGamma = np.where(v, np.cos(self.gammaB)[None, :], b3)
        cos2chi = np.where(v, np.cos(2 * self.chiB)[None, :], cos2chi)
        sin2chi = np.where(v, np.sin(2 * self.chiB)[None, :], sin2chi)
        return cosGamma, cos2chi, sin2chi
