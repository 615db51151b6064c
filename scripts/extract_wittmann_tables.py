"""Extract the published fit tables used by the reference Wittmann EOS /
Kurucz continuum-opacity package (reference: lightweaver/wittmann.py) into
a compressed npz so lightweaver_tpu.wittmann_eos does not transcribe
hundreds of physical constants by hand.

The tables are published physical data (Wittmann 1974 abundances, Kurucz
ATLAS-9 opacity fit coefficients); only the data is extracted — all code
in wittmann_eos.py is an independent, depth-vectorised implementation.

Run from the repo root:  python scripts/extract_wittmann_tables.py
"""
import sys
import types
from pathlib import Path

import numpy as np

REF = Path('/root/reference')
OUT = Path(__file__).resolve().parent.parent / 'lightweaver_tpu' / 'data'


def _stub_numba():
    """The image has no numba; the reference decorates everything with
    @njit.  Provide an identity stub so the module imports."""
    numba = types.ModuleType('numba')
    numba.njit = lambda *a, **k: (a[0] if a and callable(a[0])
                                  else (lambda f: f))
    typed = types.ModuleType('numba.typed')
    typed.List = list
    numba.typed = typed
    sys.modules['numba'] = numba
    sys.modules['numba.typed'] = typed


def _stub_xdrlib():
    """xdrlib was removed in py3.13; provide the tiny subset the pf
    reader needs (big-endian XDR uints/doubles)."""
    import struct

    class Unpacker:
        def __init__(self, data):
            self._d = data
            self._p = 0

        def unpack_uint(self):
            v = struct.unpack_from('>I', self._d, self._p)[0]
            self._p += 4
            return v

        def unpack_double(self):
            v = struct.unpack_from('>d', self._d, self._p)[0]
            self._p += 8
            return v

        def unpack_farray(self, n, fn):
            return [fn() for _ in range(n)]

    mod = types.ModuleType('xdrlib')
    mod.Unpacker = Unpacker
    sys.modules['xdrlib'] = mod


def main():
    _stub_numba()
    _stub_xdrlib()
    # Load wittmann.py standalone: the full reference package __init__
    # pulls in astropy (absent here), so fake the package skeleton and
    # the one helper wittmann.py imports from it.
    import importlib.util
    pkg = types.ModuleType('lightweaver')
    pkg.__path__ = [str(REF / 'lightweaver')]
    sys.modules['lightweaver'] = pkg
    utils = types.ModuleType('lightweaver.utils')
    utils.get_data_path = lambda: str(REF / 'lightweaver' / 'Data') + '/'
    sys.modules['lightweaver.utils'] = utils
    spec = importlib.util.spec_from_file_location(
        'lightweaver.wittmann', REF / 'lightweaver' / 'wittmann.py')
    w = importlib.util.module_from_spec(spec)
    sys.modules['lightweaver.wittmann'] = w
    spec.loader.exec_module(w)

    np.savez_compressed(
        OUT / 'wittmann_tables.npz',
        defaultAbundances=w.defaultAbundances,
        aMass=w.aMass,
        hEnergy=w.hEnergy,
        hStatg=w.hStatg,
        # Coulomb free-free Gaunt table (Kurucz)
        Z4LOG=w.Z4LOG, A0=w.A0,
        # hydrogenic bf correction coefficients
        A1=w.A1, B1=w.B1, C1=w.C1,
        # He I bound-free levels
        G0=w.G0, HEFREQ0=w.HEFREQ0, CHI0=w.CHI0,
        # Mg I / Si I / Si II Peach cross-section tables
        PEACH0=w.PEACH0, FREQMG=w.FREQMG, FLOG0=w.FLOG0, TLG0=w.TLG0,
        PEACH1=w.PEACH1, FREQSI1=w.FREQSI1, FLOG1=w.FLOG1, TLG1=w.TLG1,
        PEACH2=w.PEACH2, FREQSI2=w.FREQSI2, FLOG2=w.FLOG2, TLG2=w.TLG2,
        # Fe I line-cluster table
        G1=w.G1, E1=w.E1, WNO1=w.WNO1,
        # FAL-C-calibrated top-of-atmosphere gas pressure (cgs) vs
        # temperature, from the reference's get_top_pressure
        # (atmosphere.py:148-165); parsed from the source via ast since
        # the reference module itself needs astropy to import.
        **_top_pressure_table(),
    )
    print('wrote', OUT / 'wittmann_tables.npz')


def _top_pressure_table():
    import ast
    src = (REF / 'lightweaver' / 'atmosphere.py').read_text()
    tree = ast.parse(src)
    fn = next(n for n in ast.walk(tree)
              if isinstance(n, ast.FunctionDef)
              and n.name == 'get_top_pressure')
    vals = {}
    for node in ast.walk(fn):
        if (isinstance(node, ast.Assign)
                and isinstance(node.targets[0], ast.Name)
                and node.targets[0].id in ('pgasCgs', 'tempCoord')):
            vals[node.targets[0].id] = np.array(
                ast.literal_eval(node.value.args[0]))
    assert set(vals) == {'pgasCgs', 'tempCoord'}
    return {'topPgasCgs': vals['pgasCgs'], 'topTempCoord': vals['tempCoord']}


if __name__ == '__main__':
    main()
