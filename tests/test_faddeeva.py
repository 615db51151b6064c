import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import wofz as scipy_wofz

from lightweaver_tpu.ops.faddeeva import voigt_H, voigt_HF, wofz


def _grid():
    a = np.array([1e-4, 1e-3, 1e-2, 0.1, 0.5, 1.0, 5.0])
    v = np.concatenate([np.linspace(0.0, 12.0, 200),
                        np.geomspace(12.0, 5000.0, 100)])
    A, V = np.meshgrid(a, v, indexing='ij')
    return A.ravel(), V.ravel()


def test_wofz_vs_scipy():
    a, v = _grid()
    z = v + 1j * a
    expected = scipy_wofz(z)
    got = np.asarray(wofz(jnp.asarray(z)))
    # Weideman N=48: <1e-9 relative accuracy over the physical range
    np.testing.assert_allclose(got.real, expected.real, rtol=1e-8, atol=1e-30)
    np.testing.assert_allclose(got.imag, expected.imag, rtol=1e-8, atol=1e-30)


def test_voigt_H_matches_wofz_real():
    a, v = _grid()
    H = np.asarray(voigt_H(jnp.asarray(a), jnp.asarray(v)))
    expected = scipy_wofz(v + 1j * a).real
    np.testing.assert_allclose(H, expected, rtol=1e-8, atol=1e-30)


def test_voigt_H_negative_v_symmetry():
    a = jnp.full(50, 0.1)
    v = jnp.linspace(-10.0, 10.0, 50)
    H = voigt_H(a, v)
    Hm = voigt_H(a, -v)
    np.testing.assert_allclose(np.asarray(H), np.asarray(Hm), rtol=1e-12)


def test_voigt_normalisation():
    # integral of H(a, v) dv = sqrt(pi)
    v = np.linspace(-4000, 4000, 2_000_001)
    H = np.asarray(voigt_H(jnp.asarray(0.3), jnp.asarray(v)))
    integral = np.trapezoid(H, v)
    np.testing.assert_allclose(integral, np.sqrt(np.pi), rtol=1e-3)


def test_voigt_HF_parts():
    H, F = voigt_HF(jnp.asarray(0.2), jnp.asarray(1.5))
    expected = scipy_wofz(1.5 + 0.2j)
    np.testing.assert_allclose(float(H), expected.real, rtol=5e-4)
    np.testing.assert_allclose(float(F), expected.imag, rtol=5e-4)


def test_float32_no_overflow():
    a = jnp.asarray(1e-3, dtype=jnp.float32)
    v = jnp.asarray(3000.0, dtype=jnp.float32)
    H = voigt_H(a, v)
    assert np.isfinite(np.asarray(H))
