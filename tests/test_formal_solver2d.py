"""2D short-characteristics solver.

Oracles: (1) x-uniform atmosphere with shallow rays reproduces the 1D
solver exactly; (2) constant chi/S slab follows the analytic exponential
along the ray for ANY mux (exercising the cyclic in-plane solve);
(3) periodic translation invariance: rolling the atmosphere in x rolls
the solution.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from lightweaver_tpu.ops.formal_solver import formal_sol_1d
from lightweaver_tpu.ops.formal_solver2d import (build_geometry_2d,
                                                 formal_sol_2d)


def _grid(Nz=40, Nx=16, Lx=1e6):
    z = np.linspace(2e6, 0.0, Nz)          # decreasing (height-like)
    x = np.linspace(0.0, Lx, Nx, endpoint=False)
    return x, z


def test_x_uniform_matches_1d():
    x, z = _grid()
    Nz, Nx = len(z), len(x)
    rng = np.random.default_rng(1)
    chi1 = 10.0 ** rng.uniform(-7.0, -5.0, Nz)
    S1 = 10.0 ** rng.uniform(-9.0, -8.0, Nz)
    chi = jnp.asarray(np.broadcast_to(chi1[None, :, None], (1, Nz, Nx)))
    S = jnp.asarray(np.broadcast_to(S1[None, :, None], (1, Nz, Nx)))

    muz, mux = 0.9, 0.05       # shallow: all upwind points on z-planes
    geom = build_geometry_2d(x, z, mux, muz, toObs=True)
    assert not geom['axisZ'].any()
    Iupw = jnp.zeros((1, Nx))
    I2, Psi2, _ = formal_sol_2d(chi, S, geom, Iupw)

    I1, Psi1, _ = formal_sol_1d(jnp.asarray(chi1)[None], jnp.asarray(S1)[None],
                                jnp.asarray(z), jnp.asarray([muz]),
                                jnp.zeros(1), to_obs=True,
                                method='piecewise_linear_1d')
    for j in range(Nx):
        assert np.allclose(np.asarray(I2)[0, :, j], np.asarray(I1)[0],
                           rtol=1e-12)
        assert np.allclose(np.asarray(Psi2)[0, :, j], np.asarray(Psi1)[0],
                           rtol=1e-12)


@pytest.mark.parametrize('mux,muz', [(0.05, 0.9), (0.7, 0.3), (-0.7, 0.3),
                                     (0.95, 0.2)])
def test_constant_slab_analytic(mux, muz):
    """Constant chi/S: I(z) = S + (I0 - S) exp(-chi (z0 - z)/|muz|),
    independent of the x-walk (path segments add up geometrically)."""
    x, z = _grid(Nz=30, Nx=12)
    Nz, Nx = len(z), len(x)
    chi0, S0, I0 = 3e-6, 2e-9, 7e-9
    chi = jnp.full((1, Nz, Nx), chi0)
    S = jnp.full((1, Nz, Nx), S0)
    geom = build_geometry_2d(x, z, mux, muz, toObs=True)
    Iupw = jnp.full((1, Nx), I0)
    I2, _, _ = formal_sol_2d(chi, S, geom, Iupw)
    tau = chi0 * (z[-1] - z) / abs(muz)    # from bottom plane, upward
    # careful: toObs sweeps from the bottom (largest index, z smallest)
    tau = chi0 * np.abs(z - z[-1]) / abs(muz)
    expected = S0 + (I0 - S0) * np.exp(-tau)
    got = np.asarray(I2)[0]
    for j in range(Nx):
        assert np.allclose(got[:, j], expected, rtol=1e-10), (mux, muz, j)


def test_periodic_translation_invariance():
    x, z = _grid(Nz=25, Nx=16)
    Nz, Nx = len(z), len(x)
    rng = np.random.default_rng(3)
    chi = 10.0 ** rng.uniform(-7.0, -5.0, (1, Nz, Nx))
    S = 10.0 ** rng.uniform(-10.0, -8.0, (1, Nz, Nx))
    mux, muz = 0.8, 0.4
    geom = build_geometry_2d(x, z, mux, muz, toObs=True)
    Iupw = jnp.zeros((1, Nx))
    I, _, _ = formal_sol_2d(jnp.asarray(chi), jnp.asarray(S), geom, Iupw)

    shift = 5
    Ishift, _, _ = formal_sol_2d(jnp.asarray(np.roll(chi, shift, axis=2)),
                              jnp.asarray(np.roll(S, shift, axis=2)),
                              geom, Iupw)
    assert np.allclose(np.asarray(Ishift), np.roll(np.asarray(I), shift,
                                                   axis=2), rtol=1e-8)


def test_downward_sweep():
    """toObs=False sweeps top-to-bottom with zero upper boundary."""
    x, z = _grid(Nz=30, Nx=8)
    Nz, Nx = len(z), len(x)
    chi0, S0 = 3e-6, 2e-9
    chi = jnp.full((1, Nz, Nx), chi0)
    S = jnp.full((1, Nz, Nx), S0)
    geom = build_geometry_2d(x, z, -0.5, -0.6, toObs=False)
    I, _, _ = formal_sol_2d(chi, S, geom, jnp.zeros((1, Nx)))
    tau = chi0 * np.abs(z - z[0]) / 0.6
    expected = S0 * (1.0 - np.exp(-tau))
    assert np.allclose(np.asarray(I)[0, :, 3], expected, rtol=1e-10)


@pytest.mark.parametrize('mux,muz', [(0.6, 0.4), (-0.6, 0.4)])
def test_besser_constant_slab_exact(mux, muz):
    """BESSER upwind interpolation is exact for constant chi/S."""
    x, z = _grid(Nz=25, Nx=10)
    Nz, Nx = len(z), len(x)
    chi0, S0, I0 = 3e-6, 2e-9, 7e-9
    chi = jnp.full((1, Nz, Nx), chi0)
    S = jnp.full((1, Nz, Nx), S0)
    geom = build_geometry_2d(x, z, mux, muz, toObs=True)
    I2, _, _ = formal_sol_2d(chi, S, geom, jnp.full((1, Nx), I0),
                          interp='besser')
    tau = chi0 * np.abs(z - z[-1]) / abs(muz)
    expected = S0 + (I0 - S0) * np.exp(-tau)
    assert np.allclose(np.asarray(I2)[0, :, 4], expected, rtol=1e-10)


def test_besser_beats_linear_on_smooth_gradient():
    """For a smooth quadratic S(x) structure, BESSER chi/S interpolation
    reduces the error vs a refined-grid reference."""
    Nz, NxC, NxF = 30, 12, 96
    z = np.linspace(2e6, 0.0, Nz)
    mux, muz = 0.8, 0.35

    def fields(Nx):
        x = np.linspace(0.0, 1.2e6, Nx, endpoint=False)
        phase = 2 * np.pi * x / 1.2e6
        chi = 2e-6 * (1.0 + 0.5 * np.sin(phase))[None, None, :] \
            * np.ones((1, Nz, 1))
        S = 2e-9 * (1.0 + 0.8 * np.cos(phase))[None, None, :] \
            * np.ones((1, Nz, 1))
        return x, jnp.asarray(chi), jnp.asarray(S)

    xF, chiF, SF = fields(NxF)
    geomF = build_geometry_2d(xF, z, mux, muz, toObs=True)
    IF, _, _ = formal_sol_2d(chiF, SF, geomF, jnp.zeros((1, NxF)))
    refTop = np.asarray(IF)[0, 0, ::NxF // NxC]

    xC, chiC, SC = fields(NxC)
    geomC = build_geometry_2d(xC, z, mux, muz, toObs=True)
    errs = {}
    for interp in ('linear', 'besser'):
        IC, _, _ = formal_sol_2d(chiC, SC, geomC, jnp.zeros((1, NxC)),
                              interp=interp)
        errs[interp] = np.abs(np.asarray(IC)[0, 0] / refTop - 1.0).max()
    assert errs['besser'] <= errs['linear'] * 1.05, errs
