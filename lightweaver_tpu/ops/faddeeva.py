"""Faddeeva function w(z) and Voigt profiles, fully vectorized in JAX.

The reference implementation uses the MIT Faddeeva library
(ref: /root/reference/Source/Faddeeva.cc, /root/reference/Source/LwMisc.hpp:13-27).
Here we use Humlicek's (1982, JQSRT 27, 437) four-region rational
approximation.  Relative accuracy is ~1e-4 over the upper half plane,
well below the 1e-3 population-convergence tolerances used in NLTE
iteration; see tests/test_faddeeva.py for golden comparison against
scipy.special.wofz.

All arithmetic is performed on explicit (real, imag) pairs: TPU backends
do not implement complex primitives, and pair arithmetic lowers to plain
VPU ops.
"""
import jax.numpy as jnp


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _cdiv(ar, ai, br, bi):
    d = br * br + bi * bi
    return (ar * br + ai * bi) / d, (ai * br - ar * bi) / d


def _poly(coeffs, tr, ti):
    """Complex Horner evaluation of sum_k coeffs[k] * t^k (real coeffs,
    coeffs given highest order first)."""
    pr = jnp.full_like(tr, coeffs[0])
    pi = jnp.zeros_like(tr)
    for c in coeffs[1:]:
        pr, pi = _cmul(pr, pi, tr, ti)
        pr = pr + c
    return pr, pi


def _w4_parts(x, y):
    """(Re, Im) of w(z) for z = x + iy with y >= 0, Humlicek w4."""
    ax = jnp.abs(x)
    s = ax + y
    # t = y - i x
    tr_full, ti_full = y, -x

    in1 = s >= 15.0
    in2 = jnp.logical_and(~in1, s >= 5.5)
    in3 = jnp.logical_and(~jnp.logical_or(in1, in2),
                          y >= 0.195 * ax - 0.176)
    in4 = ~(in1 | in2 | in3)

    # Region I: w = t * 0.5641896 / (0.5 + t^2)
    tr = jnp.where(in1, tr_full, 16.0)
    ti = jnp.where(in1, ti_full, 0.0)
    u_r, u_i = _cmul(tr, ti, tr, ti)
    w1r, w1i = _cdiv(0.5641896 * tr, 0.5641896 * ti, 0.5 + u_r, u_i)

    # Region II: w = t (1.410474 + 0.5641896 u) / (0.75 + u (3 + u))
    tr = jnp.where(in2, tr_full, 6.0)
    ti = jnp.where(in2, ti_full, 0.0)
    u_r, u_i = _cmul(tr, ti, tr, ti)
    n_r, n_i = _cmul(tr, ti, 1.410474 + 0.5641896 * u_r, 0.5641896 * u_i)
    d_r, d_i = _cmul(u_r, u_i, 3.0 + u_r, u_i)
    w2r, w2i = _cdiv(n_r, n_i, 0.75 + d_r, d_i)

    # Region III: rational in t
    tr = jnp.where(in3, tr_full, 1.0)
    ti = jnp.where(in3, ti_full, 0.0)
    n_r, n_i = _poly([0.5642236, 3.778987, 11.96482, 20.20933, 16.4955],
                     tr, ti)
    d_r, d_i = _poly([1.0, 6.699398, 21.69274, 39.27121, 38.82363, 16.4955],
                     tr, ti)
    w3r, w3i = _cdiv(n_r, n_i, d_r, d_i)

    # Region IV: w = exp(u) - t P(u)/Q(u), u = t^2
    tr = jnp.where(in4, tr_full, 0.5)
    ti = jnp.where(in4, ti_full, 2.0)
    u_r, u_i = _cmul(tr, ti, tr, ti)
    p_r, p_i = _poly([0.56419, -1.320522, 35.76683, -219.0313, 1540.787,
                      -3321.9905, 36183.31], u_r, u_i)
    q_r, q_i = _poly([-1.0, 1.841439, -61.57037, 364.2191, -2186.181,
                      9022.228, -24322.84, 32066.6], u_r, u_i)
    n_r, n_i = _cmul(tr, ti, p_r, p_i)
    f_r, f_i = _cdiv(n_r, n_i, q_r, q_i)
    # exp(u) with Re(u) <= 0 in-region (y < 0.195|x|)
    e_mag = jnp.exp(jnp.minimum(u_r, 0.0))
    e_r = e_mag * jnp.cos(u_i)
    e_i = e_mag * jnp.sin(u_i)
    w4r = e_r - f_r
    w4i = e_i - f_i

    wr = jnp.where(in1, w1r, jnp.where(in2, w2r, jnp.where(in3, w3r, w4r)))
    wi = jnp.where(in1, w1i, jnp.where(in2, w2i, jnp.where(in3, w3i, w4i)))
    return wr, wi


def wofz(z):
    """Faddeeva function w(z) = exp(-z^2) erfc(-iz) for Im(z) >= 0.

    Takes/returns complex arrays; prefer voigt_H / voigt_HF on TPU, where
    complex dtypes are not supported by the backend.
    """
    import jax
    wr, wi = _w4_parts(jnp.real(z), jnp.imag(z))
    return jax.lax.complex(wr, wi)


def voigt_H(a, v):
    """Voigt function H(a, v) = Re[w(v + ia)], normalized so that
    integral over v of H dv = sqrt(pi).

    ref: /root/reference/Source/LwMisc.hpp:13-19
    """
    a, v = jnp.broadcast_arrays(jnp.asarray(a), jnp.asarray(v))
    return _w4_parts(v, a)[0]


def voigt_HF(a, v):
    """Voigt and dispersion profiles as a real pair (H, F):
    H + iF = w(v + ia).  Used for Zeeman-polarised anomalous dispersion.

    ref: /root/reference/Source/LwMisc.hpp:21-27
    """
    a, v = jnp.broadcast_arrays(jnp.asarray(a), jnp.asarray(v))
    return _w4_parts(v, a)
