"""x-sharded 2D sweep == unsharded 2D sweep, for every solver
configuration (interp x alongRay x periodicity x ray direction).

The sharded path recomputes the same plane-by-plane short-characteristics
solution with the x axis block-sharded over a device mesh: halo columns
via ppermute, ring closure via all_gather of per-shard affine totals.
Exactness (up to float reassociation) is the whole point -- this is a
distributed associative scan, not a lagged-halo approximation.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from lightweaver_tpu.ops.formal_solver2d import (build_geometry_2d,
                                                 formal_sol_2d)
from lightweaver_tpu.parallel.xshard2d import formal_sol_2d_xsharded

Nz, Nx, B = 12, 16, 5


def make_problem(seed=0):
    rng = np.random.default_rng(seed)
    z = np.linspace(2.0e6, 0.0, Nz)             # decreasing height
    x = np.linspace(0.0, 1.0e6, Nx)
    zz = np.linspace(0, 1, Nz)[None, :, None]
    xx = np.linspace(0, 2 * np.pi, Nx)[None, None, :]
    lam = np.linspace(0.5, 2.0, B)[:, None, None]
    chi = (1e-7 * lam * np.exp(6.0 * zz) * (1.1 + 0.3 * np.sin(xx))
           + 1e-9)
    S = lam * (1.0 + 0.5 * zz + 0.2 * np.cos(xx + zz))
    chi += 1e-8 * rng.random((B, Nz, Nx))
    Iupw = np.ascontiguousarray(S[:, -1] * (1.0 + 0.1 * np.sin(xx[0])))
    return x, z, jnp.asarray(chi), jnp.asarray(S), jnp.asarray(Iupw)


def xmesh(p=4):
    return Mesh(np.asarray(jax.devices()[:p]), axis_names=('x',))


@pytest.mark.parametrize('mux,muz', [(0.6, 0.8), (-0.6, 0.8), (0.3, -0.95)])
@pytest.mark.parametrize('interp', ['linear', 'besser'])
@pytest.mark.parametrize('alongRay', ['linear', 'besser'])
def test_sharded_matches_unsharded_periodic(mux, muz, interp, alongRay):
    x, z, chi, S, Iupw = make_problem()
    toObs = muz > 0
    geom = build_geometry_2d(x, z, mux, muz, toObs, periodic=True)
    I0, Psi0, Ieff0 = formal_sol_2d(chi, S, geom, Iupw, interp=interp,
                                    periodic=True, alongRay=alongRay)
    I1, Psi1, Ieff1 = formal_sol_2d_xsharded(
        chi, S, geom, Iupw, xmesh(), interp=interp, periodic=True,
        alongRay=alongRay)
    np.testing.assert_allclose(np.asarray(I1), np.asarray(I0),
                               rtol=1e-11, atol=1e-13 * np.abs(I0).max())
    np.testing.assert_allclose(np.asarray(Psi1), np.asarray(Psi0),
                               rtol=1e-11,
                               atol=1e-13 * np.abs(Psi0).max())
    np.testing.assert_allclose(np.asarray(Ieff1), np.asarray(Ieff0),
                               rtol=1e-11,
                               atol=1e-13 * np.abs(Ieff0).max())


@pytest.mark.parametrize('mux', [0.6, -0.6])
@pytest.mark.parametrize('interp', ['linear', 'besser'])
@pytest.mark.parametrize('alongRay', ['linear', 'besser'])
def test_sharded_matches_unsharded_callable_bc(mux, interp, alongRay):
    x, z, chi, S, Iupw = make_problem(seed=1)
    muz = 0.8
    geom = build_geometry_2d(x, z, mux, muz, True, periodic=False)
    Ibc = jnp.asarray(1.0 + 0.3 * np.cos(np.linspace(0, 3, Nz))[None, :]
                      * np.linspace(0.5, 2.0, B)[:, None])
    I0, Psi0, Ieff0 = formal_sol_2d(chi, S, geom, Iupw, interp=interp,
                                    periodic=False, Ibc=Ibc,
                                    alongRay=alongRay)
    I1, Psi1, Ieff1 = formal_sol_2d_xsharded(
        chi, S, geom, Iupw, xmesh(), interp=interp, periodic=False,
        Ibc=Ibc, alongRay=alongRay)
    np.testing.assert_allclose(np.asarray(I1), np.asarray(I0),
                               rtol=1e-11, atol=1e-13 * np.abs(I0).max())
    np.testing.assert_allclose(np.asarray(Psi1), np.asarray(Psi0),
                               rtol=1e-11,
                               atol=1e-13 * np.abs(Psi0).max())
    np.testing.assert_allclose(np.asarray(Ieff1), np.asarray(Ieff0),
                               rtol=1e-11,
                               atol=1e-13 * np.abs(Ieff0).max())


def test_vertical_ray_no_x_coupling():
    x, z, chi, S, Iupw = make_problem(seed=2)
    geom = build_geometry_2d(x, z, 0.0, 1.0, True, periodic=True)
    I0, Psi0, _ = formal_sol_2d(chi, S, geom, Iupw)
    I1, Psi1, _ = formal_sol_2d_xsharded(chi, S, geom, Iupw, xmesh())
    np.testing.assert_allclose(np.asarray(I1), np.asarray(I0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(Psi1), np.asarray(Psi0),
                               rtol=1e-12)


def test_rejects_single_column_shards():
    x, z, chi, S, Iupw = make_problem()
    geom = build_geometry_2d(x, z, 0.6, 0.8, True, periodic=True)
    with pytest.raises(ValueError):
        formal_sol_2d_xsharded(chi[..., :8], S[..., :8], geom,
                               Iupw[..., :8], xmesh(8))
