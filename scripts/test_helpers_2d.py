"""Shared builder for an x-sharded 2D FAL-C slab context (used by
scripts/scaling_model.py; mirrors tests/test_context_2d_xsharded.py)."""
import numpy as np


def make_xsharded_ctx(mesh, Nz=16, Nx=8):
    from lightweaver_tpu.atmosphere import Atmosphere
    from lightweaver_tpu.atomic_set import RadiativeSet
    from lightweaver_tpu.context import Context
    from lightweaver_tpu.fal import Falc82
    from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom

    full = Falc82()
    idx = np.unique(np.linspace(0, 81, Nz).astype(int))
    Nz = len(idx)
    x = np.arange(Nx) * 2e5

    def bc(a):
        return np.broadcast_to(a[:, None], (Nz, Nx)).copy()

    T = bc(full.temperature[idx])
    T = T * (1.0 + 0.1 * np.sin(2 * np.pi * np.arange(Nx) / Nx)[None, :])
    atmos = Atmosphere.make_2d(
        height=full.height[idx], x=x, temperature=T,
        vx=np.zeros((Nz, Nx)), vz=bc(full.vlos[idx]),
        vturb=bc(full.vturb[idx]), ne=bc(full.ne[idx]),
        nHTot=bc(full.nHTot[idx]))
    atmos.quadrature(3)
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    return Context(atmos, spect, eqPops, mesh=mesh)
