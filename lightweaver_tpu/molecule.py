"""Molecular models: Kurucz / Sauval & Tatum equilibrium-constant fits.

ref: /root/reference/lightweaver/molecule.py:35-220 (the reference parses
RH .molecule files at runtime with numba-jitted scalar fits; here the
public data tables are shipped pre-extracted and the fits are vectorised
numpy).
"""
import json
from pathlib import Path
from typing import List, Optional, Union

import numpy as np

from . import constants as Const
from .atomic_table import Element, PeriodicTable

DATA_DIR = Path(__file__).resolve().parent / 'data'


class Molecule:
    def __init__(self, d: dict):
        self.name = d['name']
        self.charge = int(d['charge'])
        self.elements = [PeriodicTable.element(e) for e in d['elements']]
        self.elementCount = [int(c) for c in d['counts']]
        self.Nnuclei = sum(self.elementCount)
        self.Ediss = d['Ediss_eV'] * Const.EV
        self.fit = d['fit']
        self.formationTempRange = (d['Tmin'], d['Tmax'])
        # stored low->high order in the file; evaluated Horner high-first
        self.pfCoeffs = np.array(d['pfCoef'][::-1])
        self.eqcCoeffs = np.array(d['eqcCoef'][::-1])
        self.weight = sum(c * PeriodicTable[e].mass
                          for c, e in zip(self.elementCount, self.elements))
        self._mk = self.Nnuclei - 1 - self.charge

    def equilibrium_constant(self, T) -> np.ndarray:
        """Phi(T) such that n_mol = Phi * prod(n_constituent) / ne^charge,
        zero outside the formation temperature range.
        ref: /root/reference/lightweaver/molecule.py:35-99"""
        T = np.asarray(T, np.float64)
        kT = Const.KBoltzmann * T
        if self.fit == 'KURUCZ_70':
            eq = np.polyval(self.eqcCoeffs, T)
            out = (np.exp(self.Ediss / kT + eq - 1.5 * self._mk * np.log(T))
                   * (Const.CM_TO_M ** 3) ** self._mk)
        elif self.fit == 'KURUCZ_85':
            eq = np.polyval(self.eqcCoeffs, T * 1e-4)
            out = (np.exp(self.Ediss / kT + eq - 1.5 * self._mk * np.log(T))
                   * (Const.CM_TO_M ** 3) ** self._mk)
        elif self.fit == 'SAUVAL_TATUM_84':
            theta = Const.Theta0 / T
            eq = np.polyval(self.eqcCoeffs, np.log10(theta))
            out = 10.0 ** (self.Ediss / Const.EV * theta - eq) * kT
        else:
            raise ValueError(f'Unknown fit {self.fit} for {self.name}')
        lo, hi = self.formationTempRange
        return np.where((T < lo) | (T > hi), 0.0, out)


class MolecularTable:
    """Set of molecular models indexed by name."""

    def __init__(self, molecules: Optional[List[Molecule]] = None):
        self.molecules = molecules or []
        self.indices = {m.name.upper(): i
                        for i, m in enumerate(self.molecules)}

    @classmethod
    def default(cls, names: Optional[List[str]] = None) -> 'MolecularTable':
        with open(DATA_DIR / 'molecules.json') as f:
            data = json.load(f)
        if names is None:
            names = sorted(data)
        return cls([Molecule(data[n.upper()]) for n in names])

    def __getitem__(self, name: str) -> Molecule:
        return self.molecules[self.indices[name.upper()]]

    def __contains__(self, name) -> bool:
        return isinstance(name, str) and name.upper() in self.indices

    def __len__(self):
        return len(self.molecules)

    def __iter__(self):
        return iter(self.molecules)
