import numpy as np

from lightweaver_tpu.ops.ng import Ng


def _linear_problem(n=50, seed=0, rho=0.95):
    rng = np.random.default_rng(seed)
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    lam = rng.uniform(0.5, rho, n)
    A = Q @ np.diag(lam) @ Q.T
    xStar = rng.uniform(5.0, 15.0, n)
    b = (np.eye(n) - A) @ xStar
    return A, b, xStar


def _run(A, b, xStar, ng, maxIter=200, tol=1e-10):
    x = np.ones(len(b))
    for it in range(maxIter):
        x = A @ x + b
        if ng is not None:
            _, x = ng.accelerate(x)
        if np.max(np.abs(x - xStar) / np.abs(xStar)) < tol:
            return it + 1
    return maxIter


def test_ng_accelerates_linear_fixed_point():
    A, b, xStar = _linear_problem()
    plain = _run(A, b, xStar, None)
    accel = _run(A, b, xStar, Ng(2, 4, 10, np.ones(len(b))))
    assert accel < plain / 2


def test_ng_disabled_is_identity():
    A, b, xStar = _linear_problem(n=10)
    ng = Ng(0, 0, 0, np.ones(10))
    x = np.ones(10)
    xn = A @ x + b
    acc, out = ng.accelerate(xn)
    assert not acc
    np.testing.assert_array_equal(out, xn)
    assert ng.max_change() > 0


def test_ng_max_change_tracks():
    ng = Ng(0, 0, 0, np.ones(4))
    _, _ = ng.accelerate(np.full(4, 2.0))
    np.testing.assert_allclose(ng.max_change(), 0.5)
