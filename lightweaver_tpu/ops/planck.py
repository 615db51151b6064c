"""Planck function in the framework's wavelength-in-nm convention.

B_nu as a function of (T, lambda[nm]) in J m^-2 s^-1 Hz^-1 sr^-1.
ref: /root/reference/Source/LwMisc.hpp:29-46
"""
import jax.numpy as jnp

from .. import constants as C

_MAX_EXPONENT = 150.0


def planck_nu(temperature, wavelength_nm):
    """B_nu(T, lambda). Broadcasts over both arguments.

    temperature: [K], wavelength_nm: vacuum wavelength in nm.
    """
    hc_kla = C.HC_K / wavelength_nm
    twohnu3_c2 = C.TwoHC / wavelength_nm**3
    x = hc_kla / temperature
    xc = jnp.minimum(x, _MAX_EXPONENT)
    B = twohnu3_c2 / (jnp.exp(xc) - 1.0)
    return jnp.where(x <= _MAX_EXPONENT, B, 0.0)
