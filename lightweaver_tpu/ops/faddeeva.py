"""Faddeeva function w(z) and Voigt profiles, fully vectorized in JAX.

The reference implementation uses the MIT Faddeeva library
(ref: /root/reference/Source/Faddeeva.cc, /root/reference/Source/LwMisc.hpp:13-27),
accurate to ~1e-13.  Here we use Weideman's (1994, SIAM J. Numer. Anal. 31,
1497) single rational approximation with N=48 terms: one branch-free complex
Horner evaluation, which maps far better onto the TPU VPU than the MIT
library's region switching, and achieves <1e-9 relative accuracy in the
Voigt H over the physically relevant damping range (a >= 1e-5; see
tests/test_faddeeva.py for the golden comparison against scipy.wofz).

All arithmetic is performed on explicit (real, imag) pairs: TPU backends
do not implement complex primitives, and pair arithmetic lowers to plain
VPU ops.
"""
import numpy as np

import jax.numpy as jnp

_N_WEIDEMAN = 48


def _weideman_coeffs(N):
    """Polynomial coefficients a_1..a_N of Weideman's rational approximation
    w(z) ~= (1/sqrt(pi) + 2 p(Z) / (L - iz)) / (L - iz), Z = (L+iz)/(L-iz),
    computed by the FFT construction of the original paper."""
    M = 2 * N
    L = np.sqrt(N / np.sqrt(2.0))
    theta = np.arange(-M + 1, M) * np.pi / M
    t = L * np.tan(theta / 2.0)
    f = np.exp(-t * t) * (L * L + t * t)
    f = np.concatenate([[0.0], f])
    a = np.real(np.fft.fft(np.fft.fftshift(f))) / (2.0 * M)
    return L, np.flipud(a[1:N + 1])   # highest order first


# Stored as Python floats: numpy scalars are strongly typed in JAX and
# would silently promote f32 inputs to (TPU-emulated) f64 under x64;
# Python floats are weak-typed and follow the input dtype.
_WEIDEMAN_L, _A_ARR = _weideman_coeffs(_N_WEIDEMAN)
_WEIDEMAN_L = float(_WEIDEMAN_L)
_WEIDEMAN_A = [float(c) for c in _A_ARR]
_ISQRTPI = float(1.0 / np.sqrt(np.pi))


def _cdiv(ar, ai, br, bi):
    d = br * br + bi * bi
    return (ar * br + ai * bi) / d, (ai * br - ar * bi) / d


def _wofz_parts_impl(x, y):
    """(Re, Im) of w(z) for z = x + iy with y >= 0."""
    L = _WEIDEMAN_L
    # d = L - iz = (L + y) - i x
    dr = L + y
    di = -x
    # Z = (L + iz) / (L - iz)
    zr, zi = _cdiv(L - y, x, dr, di)

    # p(Z) by Horner on (re, im) pairs; coefficients are real
    pr = jnp.full_like(x, _WEIDEMAN_A[0])
    pi = jnp.zeros_like(x)
    for c in _WEIDEMAN_A[1:]:
        pr, pi = pr * zr - pi * zi + c, pr * zi + pi * zr

    # w = (2 p / d + 1/sqrt(pi)) / d
    nr, ni = _cdiv(2.0 * pr, 2.0 * pi, dr, di)
    return _cdiv(nr + _ISQRTPI, ni, dr, di)


# Dispatch policy: the ~200-op Horner chain costs ~100 ms/call in eager
# mode on full profile tensors, so concrete arrays are flattened, padded
# to the next power-of-two length and run through a jitted 1D kernel --
# every profile shape shares a handful of cached compilations.  Tracers
# (calls from inside an enclosing jit) use the impl directly: they are
# inlined into the outer program and have no dispatch overhead.
import jax as _jax  # noqa: E402

_wofz_parts_jit = _jax.jit(_wofz_parts_impl)


def _wofz_parts(x, y):
    if isinstance(x, _jax.core.Tracer) or isinstance(y, _jax.core.Tracer):
        return _wofz_parts_impl(x, y)
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n = x.size
    if n == 0:
        return jnp.zeros_like(x), jnp.zeros_like(x)
    b = 1 << (n - 1).bit_length()
    xf = jnp.concatenate([jnp.ravel(x), jnp.zeros(b - n, x.dtype)])
    yf = jnp.concatenate([jnp.ravel(y), jnp.zeros(b - n, y.dtype)])
    wr, wi = _wofz_parts_jit(xf, yf)
    return wr[:n].reshape(x.shape), wi[:n].reshape(x.shape)


def wofz(z):
    """Faddeeva function w(z) = exp(-z^2) erfc(-iz) for Im(z) >= 0.

    Takes/returns complex arrays; prefer voigt_H / voigt_HF on TPU, where
    complex dtypes are not supported by the backend.
    """
    import jax
    wr, wi = _wofz_parts(jnp.real(z), jnp.imag(z))
    return jax.lax.complex(wr, wi)


def voigt_H(a, v):
    """Voigt function H(a, v) = Re[w(v + ia)], normalized so that
    integral over v of H dv = sqrt(pi).

    ref: /root/reference/Source/LwMisc.hpp:13-19
    """
    a, v = jnp.broadcast_arrays(jnp.asarray(a), jnp.asarray(v))
    return _wofz_parts(v, a)[0]


def voigt_HF(a, v):
    """Voigt and dispersion profiles as a real pair (H, F):
    H + iF = w(v + ia).  Used for Zeeman-polarised anomalous dispersion.

    ref: /root/reference/Source/LwMisc.hpp:21-27
    """
    a, v = jnp.broadcast_arrays(jnp.asarray(a), jnp.asarray(v))
    return _wofz_parts(v, a)
