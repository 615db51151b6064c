"""Custom line-profile protocol (LineProfileState/Result).

A user subclass of VoigtLine overriding `compute_phi` drives the
synthesis, exactly as the reference's frontend/backend profile callback
(ref: /root/reference/lightweaver/atomic_model.py:389-432, 605-630;
/root/reference/Source/LwMiddleLayer.pyx:1966-2002).

Oracles:
  1. A subclass that simply forwards to default_voigt_callback is
     bit-identical to the stock VoigtLine.
  2. A Gaussian-profile subclass (aDamp forced to 0 in the callback)
     matches a Voigt evaluation at a=0 analytically.
"""
import copy
from dataclasses import dataclass

import numpy as np

from lightweaver_tpu.atmosphere import Atmosphere
from lightweaver_tpu.atomic_model import (LineProfileResult,
                                          LineProfileState, VoigtLine)
from lightweaver_tpu.atomic_set import RadiativeSet
from lightweaver_tpu.context import Context
from lightweaver_tpu.fal import Falc82
from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom


@dataclass
class ForwardingLine(VoigtLine):
    """Uses the protocol but defers to the backend Voigt."""

    def compute_phi(self, state: LineProfileState) -> LineProfileResult:
        vBroad = (self.atom.vBroad(state.atmos) if state.vBroad is None
                  else state.vBroad)
        aDamp, Qelast = self.damping(state.atmos, state.eqPops,
                                     vBroad=vBroad)
        return LineProfileResult(phi=state.default_voigt_callback(
            aDamp, vBroad), aDamp=aDamp, Qelast=Qelast)


@dataclass
class GaussianLine(VoigtLine):
    """Pure Doppler core: Voigt with a = 0."""

    def compute_phi(self, state: LineProfileState) -> LineProfileResult:
        vBroad = (self.atom.vBroad(state.atmos) if state.vBroad is None
                  else state.vBroad)
        aDamp, Qelast = self.damping(state.atmos, state.eqPops,
                                     vBroad=vBroad)
        phi = state.default_voigt_callback(np.zeros_like(aDamp), vBroad)
        return LineProfileResult(phi=phi, aDamp=np.zeros_like(aDamp),
                                 Qelast=Qelast)


def _swap_line_class(atom, cls):
    atom = copy.deepcopy(atom)
    atom.lines = [cls(**{k: getattr(l, k)
                         for k in ('i', 'j', 'f', 'type', 'quadrature',
                                   'broadening', 'gLandeEff')})
                  for l in atom.lines]
    # re-run setup wiring on the swapped lines
    for l in atom.lines:
        l.setup(atom)
    return atom


def _ctx(caCls=None):
    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 20).astype(int))
    atmos = Atmosphere(height=full.height[idx],
                       temperature=full.temperature[idx],
                       vlos=full.vlos[idx], vturb=full.vturb[idx],
                       ne=full.ne[idx], nHTot=full.nHTot[idx])
    atmos.quadrature(3)
    ca = CaII_atom()
    if caCls is not None:
        ca = _swap_line_class(ca, caCls)
    rs = RadiativeSet([H_6_atom(), ca])
    rs.set_active('Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    return Context(atmos, spect, eqPops)


def test_forwarding_subclass_matches_stock_voigt():
    ref = _ctx()
    fwd = _ctx(ForwardingLine)
    for tRef, tFwd in zip(ref.phi[0], fwd.phi[0]):
        if tRef is None:
            assert tFwd is None
            continue
        np.testing.assert_array_equal(np.asarray(tRef), np.asarray(tFwd))
    u1 = ref.formal_sol_gamma_matrices()
    u2 = fwd.formal_sol_gamma_matrices()
    np.testing.assert_allclose(np.asarray(fwd.I), np.asarray(ref.I),
                               rtol=1e-12)
    assert np.isclose(float(u1.dJMax), float(u2.dJMax))


def test_gaussian_profile_is_zero_damping_voigt():
    from lightweaver_tpu import constants as Const
    from lightweaver_tpu.ops.faddeeva import voigt_H
    import jax.numpy as jnp

    gau = _ctx(GaussianLine)
    atmos = gau.atmos
    vlosMu = np.asarray(atmos.vlos_mu())
    a = gau.cfg.activeAtoms[0]
    model = a.model
    vBroad = model.vBroad(atmos)
    found = 0
    for t, phi in zip(a.trans, gau.phi[0]):
        if not t.isLine:
            continue
        found += 1
        lam = np.asarray(t.wavelength)
        vBase = (lam - t.lambda0) * Const.CLight / t.lambda0
        s = np.array([-1.0, 1.0])
        vk = ((vBase[:, None, None, None]
               + s[None, None, :, None] * vlosMu[None, :, None, :])
              / vBroad[None, None, None, :])
        expect = (np.asarray(voigt_H(jnp.zeros(vBroad.shape), jnp.asarray(vk)))
                  / (np.sqrt(np.pi) * vBroad[None, None, None, :]))
        np.testing.assert_allclose(np.asarray(phi), expect,
                                   rtol=1e-10, atol=1e-30)
        # pure-Gaussian profile must also differ from the stock Voigt
        assert np.isclose(np.asarray(phi)[..., -1].max(),
                          1.0 / (np.sqrt(np.pi) * vBroad[-1]), rtol=1e-6)
    assert found == len(model.lines)
    # aDamp stored for PRD must reflect the override
    for ad, t in zip(gau.aDamp[0], a.trans):
        if t.isLine:
            assert np.all(np.asarray(ad) == 0.0)


def test_gaussian_profile_synthesis_runs():
    gau = _ctx(GaussianLine)
    for it in range(8):
        gau.formal_sol_gamma_matrices()
        if it >= 2:
            gau.stat_equil()
    assert np.all(np.isfinite(np.asarray(gau.I)))
