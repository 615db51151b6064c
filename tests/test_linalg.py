"""Batched unrolled Gaussian-elimination solve vs numpy LAPACK."""
import jax.numpy as jnp
import numpy as np
import pytest

from lightweaver_tpu.ops.linalg import batched_solve, solve_KxK_over_depth


@pytest.mark.parametrize('N', [2, 6, 9])
def test_batched_solve_matches_numpy(N):
    rng = np.random.default_rng(42 + N)
    B = 37
    A = rng.normal(size=(B, N, N))
    # scale rows over many orders of magnitude, like Gamma matrices
    A *= 10.0 ** rng.uniform(-6, 6, size=(B, N, 1))
    b = rng.normal(size=(B, N)) * 10.0 ** rng.uniform(-3, 3, size=(B, N))
    x = np.asarray(batched_solve(jnp.asarray(A), jnp.asarray(b)))
    xRef = np.linalg.solve(A, b[..., None])[..., 0]
    assert np.allclose(x, xRef, rtol=1e-9, atol=0)


def test_batched_solve_needs_pivoting():
    # leading zero pivot forces a row swap
    A = np.array([[[0.0, 1.0], [1.0, 0.0]]])
    b = np.array([[2.0, 3.0]])
    x = np.asarray(batched_solve(jnp.asarray(A), jnp.asarray(b)))
    assert np.allclose(x, [[3.0, 2.0]])


def test_solve_KxK_over_depth_layout():
    rng = np.random.default_rng(0)
    N, Nk = 5, 11
    G = rng.normal(size=(N, N, Nk)) + 4 * np.eye(N)[:, :, None]
    rhs = rng.normal(size=(N, Nk))
    x = np.asarray(solve_KxK_over_depth(jnp.asarray(G), jnp.asarray(rhs)))
    for k in range(Nk):
        assert np.allclose(x[:, k], np.linalg.solve(G[:, :, k], rhs[:, k]),
                           rtol=1e-9)
