import jax.numpy as jnp
import numpy as np

from lightweaver_tpu import constants as C
from lightweaver_tpu.ops.planck import planck_nu


def test_planck_against_direct():
    T = np.array([3000.0, 5000.0, 8000.0, 1e4, 1e6])
    wav = 500.0  # nm
    got = np.asarray(planck_nu(jnp.asarray(T), wav))
    lam = wav * 1e-9
    nu = C.CLight / lam
    expected = (2 * C.HPlanck * nu**3 / C.CLight**2
                / (np.exp(C.HPlanck * nu / (C.KBoltzmann * T)) - 1.0))
    np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_planck_cold_no_overflow():
    got = np.asarray(planck_nu(jnp.asarray(2.0), 100.0))
    assert got == 0.0


def test_planck_broadcast():
    T = jnp.linspace(4000.0, 9000.0, 82)
    wav = jnp.linspace(100.0, 1000.0, 11)[:, None]
    B = planck_nu(T[None, :], wav)
    assert B.shape == (11, 82)
    assert np.all(np.asarray(B) > 0)
