"""Zeeman-polarised synthesis through a 2D atmosphere -- a capability
beyond the reference framework (its Stokes solver rejects Ndim != 1,
ref: /root/reference/Source/FormalStokes.cpp:606-621).

A FAL-C-based slab with a sinusoidal horizontal temperature perturbation
and an inclined magnetic field whose azimuth rotates across x (a toy
flux-sheet): converge the unpolarised 2D NLTE problem, then synthesise
emergent Stokes I, Q, U, V images of the Ca II 8542 line.
"""
import numpy as np

import lightweaver_tpu as lw
from lightweaver_tpu.atmosphere import Atmosphere
from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom

if __name__ == '__main__':
    full = lw.Falc82()
    idx = np.unique(np.linspace(0, 81, 45).astype(int))
    Nz = len(idx)
    Nx = 16
    x = np.linspace(0.0, 1.5e6, Nx)          # 1.5 Mm wide, periodic

    def bc(a):
        return np.broadcast_to(a[:, None], (Nz, Nx)).copy()

    phase = 2.0 * np.pi * x / x[-1]
    T = bc(full.temperature[idx]) * (1.0 + 0.08 * np.sin(phase)[None, :])
    B = bc(np.full(Nz, 0.12)) * (1.0 + 0.5 * np.cos(phase)[None, :])
    gammaB = np.broadcast_to(np.deg2rad(35.0 + 20.0 * np.sin(phase)),
                             (Nz, Nx)).copy()
    chiB = np.broadcast_to(phase[None, :] * 0.5, (Nz, Nx)).copy()

    atmos = Atmosphere.make_2d(
        height=full.height[idx], x=x, temperature=T,
        vx=np.zeros((Nz, Nx)), vz=bc(full.vlos[idx]),
        vturb=bc(full.vturb[idx]), ne=bc(full.ne[idx]),
        nHTot=bc(full.nHTot[idx]), B=B, gammaB=gammaB, chiB=chiB)
    atmos.quadrature(3)

    rs = lw.RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    ctx = lw.Context(atmos, spect, eqPops)
    lw.iterate_ctx_se(ctx)

    # emergent Stokes images for the quadrature rays
    ctx.single_stokes_fs()
    I = np.asarray(ctx.I)                     # [Nlam, Nmu, Nx]
    Quv = np.asarray(ctx.Quv)                 # [3, Nlam, Nmu, Nx]
    lam = np.asarray(spect.wavelength)
    core = np.argmin(np.abs(lam - 854.44))

    np.savez('stokes_2d.npz', wavelength=lam, I=I, Quv=Quv, x=x,
             muz=ctx.cfg.muz)
    mu = int(np.argmax(ctx.cfg.muz))
    print('Stokes images [Nlam, Nmu, Nx]:', I.shape)
    print('core I across x     :', I[core, mu] / I[core, mu].mean())
    print('max |V|/I per column:',
          np.abs(Quv[2, :, mu]).max(axis=0) / I[:, mu].max(axis=0))
