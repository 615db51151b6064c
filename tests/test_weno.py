"""WENO-4 interpolation (ops/weno.py) — order of accuracy and
non-oscillatory behaviour (Janett et al. 2019 properties; the reference
consumes the weno4 package for the same roles)."""
import numpy as np
import pytest

from lightweaver_tpu.ops.weno import weno4


def test_exact_on_quadratics():
    xp = np.array([0.0, 0.7, 1.1, 2.3, 3.0, 4.5])
    f = lambda x: 3.0 - 2.0 * x + 0.5 * x ** 2
    xs = np.linspace(0.0, 4.5, 200)
    assert np.allclose(weno4(xs, xp, f(xp)), f(xs), rtol=0, atol=1e-12)


def test_fourth_order_convergence():
    f = lambda x: np.sin(3.0 * x) + 0.2 * np.cos(7.0 * x)
    xs = np.linspace(0.1, 0.9, 313)
    errs = []
    for N in (33, 65, 129):
        xp = np.linspace(0.0, 1.0, N)
        errs.append(np.abs(weno4(xs, xp, f(xp)) - f(xs)).max())
    order = np.log2(errs[0] / errs[1]), np.log2(errs[1] / errs[2])
    assert min(order) > 3.5, (errs, order)


def test_non_oscillatory_at_step():
    """A cubic interpolant overshoots a step by ~O(1); WENO-4 must not."""
    xp = np.linspace(0.0, 1.0, 21)
    fp = (xp > 0.5).astype(float)
    xs = np.linspace(0.0, 1.0, 999)
    out = weno4(xs, xp, fp)
    assert out.min() > -0.02 and out.max() < 1.02


def test_left_right_and_extrapolation():
    xp = np.array([1.0, 2.0, 3.0, 4.0])
    fp = xp ** 2
    # edge-quadratic extrapolation by default (exact for this quadratic)
    assert weno4(0.5, xp, fp) == pytest.approx(0.25, abs=1e-10)
    assert weno4(4.5, xp, fp) == pytest.approx(20.25, abs=1e-10)
    # explicit fills override
    out = weno4(np.array([0.5, 2.5, 4.5]), xp, fp, left=0.0, right=-1.0)
    assert out[0] == 0.0 and out[2] == -1.0
    assert out[1] == pytest.approx(6.25, abs=1e-10)


def test_small_grids():
    assert weno4(1.5, np.array([1.0]), np.array([7.0])) == 7.0
    assert weno4(1.5, np.array([1.0, 2.0]),
                 np.array([0.0, 2.0])) == pytest.approx(1.0)
    xp = np.array([0.0, 1.0, 3.0])
    fp = xp ** 2 - xp
    assert weno4(2.0, xp, fp) == pytest.approx(2.0)


def test_interp_rates_uses_weno():
    from lightweaver_tpu.collisional_rates import interp_rates
    Tgrid = np.array([3000.0, 5000.0, 10000.0, 20000.0, 50000.0, 1e5])
    rates = np.array([1.0, 1.2, 1.5, 1.9, 2.2, 2.4])
    T = np.array([4000.0, 65000.0, 2000.0])
    out = interp_rates(T, Tgrid, rates)
    assert np.all(out >= 0.0)
    assert abs(out[0] - weno4(4000.0, Tgrid, rates)) < 1e-14
