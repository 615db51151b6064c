"""Self-consistent LTE electron density fixpoint
(ref: atomic_set.py:851-963 iterate_lte_ne_eq_pops)."""
import numpy as np

from lightweaver_tpu.atomic_set import RadiativeSet, lte_pops
from lightweaver_tpu.fal import Falc82
from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom


def _implied_ne(rs, atmos, ne):
    out = np.zeros_like(ne)
    for a in sorted(rs.atoms.values(), key=lambda a: a.element):
        nTotal = rs.abundance[a.element] * atmos.nHTot
        nStar = lte_pops(a, atmos.temperature, ne, nTotal, debye=True)
        stages = np.array([l.stage for l in a.levels])
        out += np.sum(nStar * stages[:, None], axis=0)
    return out


def test_lte_ne_fixpoint_self_consistent():
    atmos = Falc82()
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('Ca')
    eqPops = rs.iterate_lte_ne_eq_pops(atmos)
    ne = np.asarray(atmos.ne)
    implied = _implied_ne(rs, atmos, ne)
    assert np.max(np.abs(implied / ne - 1)) < 1e-3
    # eqPops carries the LTE pops computed at the converged ne
    nH = eqPops.atomicPops['H'].nStar
    assert np.all(np.isfinite(nH)) and np.all(nH > 0)


def test_lte_ne_direct_agrees_with_newton():
    atmos = Falc82()
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('Ca')
    rs.iterate_lte_ne_eq_pops(atmos, tol=1e-4)
    neNK = np.asarray(atmos.ne).copy()
    atmosB = Falc82()
    rsB = RadiativeSet([H_6_atom(), CaII_atom()])
    rsB.set_active('Ca')
    rsB.iterate_lte_ne_eq_pops(atmosB, direct=True, tol=1e-5)
    neD = np.asarray(atmosB.ne)
    assert np.max(np.abs(neNK / neD - 1)) < 5e-3
