"""lightweaver_tpu: a TPU-native NLTE radiative transfer framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
Lightweaver framework (Osborne & Milic 2021): MALI NLTE synthesis for
optically-thick spectral lines in stratified atmospheres, batched and
sharded across TPU meshes.
"""
from . import constants
from .ops.faddeeva import voigt_H, voigt_HF, wofz
from .ops.planck import planck_nu

__version__ = '0.1.0'
