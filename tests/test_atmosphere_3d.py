"""3D atmosphere data-model parity (the reference carries Ndim==3 in
its Layout/velocity projections even though its solvers are 1D/2D;
ref: /root/reference/lightweaver/atmosphere.py:253, 326-341, 386, 421).
"""
import numpy as np
import pytest

from lightweaver_tpu.atmosphere import (Atmosphere, Layout,
                                        PeriodicRadiation,
                                        ThermalisedRadiation,
                                        ZeroRadiation)


def _make3d(Nz=4, Ny=3, Nx=2):
    z = np.linspace(1e6, 0.0, Nz)
    x = np.linspace(0.0, 1e5, Nx)
    y = np.linspace(0.0, 2e5, Ny)
    sh = (Nz, Ny, Nx)
    T = np.full(sh, 6000.0)
    rng = np.random.default_rng(0)
    vx, vy, vz = (rng.normal(0, 1e3, sh) for _ in range(3))
    return Atmosphere.make_3d(
        height=z, x=x, y=y, temperature=T, vx=vx, vy=vy, vz=vz,
        vturb=np.full(sh, 2e3), ne=np.full(sh, 1e18),
        nHTot=np.full(sh, 1e20)), (vx, vy, vz)


def test_3d_layout_shapes():
    atmos, _ = _make3d()
    assert atmos.Ndim == 3
    assert atmos.Nspace == 4 * 3 * 2
    lay = atmos.structure
    assert lay.Ndim == 3
    assert lay.Nspace == 24
    assert lay.dimensioned_shape == (4, 3, 2)
    assert lay.vx.shape == (4, 3, 2)
    dv = lay.dimensioned_view()
    assert dv.vz.shape == (4, 3, 2)
    assert isinstance(lay.zLowerBc, ThermalisedRadiation)
    assert isinstance(lay.zUpperBc, ZeroRadiation)
    assert isinstance(lay.yLowerBc, PeriodicRadiation)
    assert atmos.zGrid.shape == (4,)
    assert np.all(np.diff(atmos.zGrid) < 0)


def test_3d_vlos_mu_projection():
    atmos, (vx, vy, vz) = _make3d()
    # explicit ray set (no 3D quadrature, like the reference)
    atmos.mux = np.array([0.3])
    atmos.muy = np.array([0.4])
    atmos.muz = np.array([np.sqrt(1 - 0.09 - 0.16)])
    atmos.wmu = np.array([1.0])
    v = atmos.vlos_mu()
    expect = (0.3 * vx + 0.4 * vy
              + atmos.muz[0] * vz).reshape(-1)
    np.testing.assert_allclose(v[0], expect, rtol=1e-14)


def test_3d_quadrature_raises():
    atmos, _ = _make3d()
    with pytest.raises(NotImplementedError):
        atmos.quadrature(7)


def test_layout_make_3d_direct():
    lay = Layout.make_3d(
        x=np.arange(2.0), y=np.arange(3.0), z=np.arange(4.0)[::-1],
        vx=np.zeros((4, 3, 2)), vy=np.zeros((4, 3, 2)),
        vz=np.zeros((4, 3, 2)),
        xLowerBc=PeriodicRadiation(), xUpperBc=PeriodicRadiation(),
        yLowerBc=PeriodicRadiation(), yUpperBc=PeriodicRadiation(),
        zLowerBc=ThermalisedRadiation(), zUpperBc=ZeroRadiation())
    assert (lay.Nx, lay.Ny, lay.Nz) == (2, 3, 4)
    assert lay.Nspace == 24
