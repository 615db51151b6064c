"""Generate golden EOS/opacity arrays from the *reference* wittmann.py
(imported standalone with numba stubbed to identity) for
tests/test_wittmann_eos.py.  Needs /root/reference present.

Run from repo root: python scripts/refgold/gen_wittmann_golden.py
"""
import sys, types, importlib.util
from pathlib import Path
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
import scripts.extract_wittmann_tables as ex

ex._stub_numba(); ex._stub_xdrlib()
REF = Path('/root/reference')
pkg = types.ModuleType('lightweaver'); pkg.__path__ = [str(REF/'lightweaver')]
sys.modules['lightweaver'] = pkg
utils = types.ModuleType('lightweaver.utils')
utils.get_data_path = lambda: str(REF/'lightweaver'/'Data') + '/'
sys.modules['lightweaver.utils'] = utils
spec = importlib.util.spec_from_file_location(
    'lightweaver.wittmann', REF/'lightweaver'/'wittmann.py')
w = importlib.util.module_from_spec(spec)
sys.modules['lightweaver.wittmann'] = w
spec.loader.exec_module(w)

from lightweaver_tpu.fal import Falc82

ref = w.Wittmann()
atmos = Falc82()
T = np.asarray(atmos.temperature, float)
ne = np.asarray(atmos.ne, float)
pe = ne * 1e-6 * w.BK * T  # cgs

N = len(T)
pg = np.array([ref.pg_from_pe(T[k], pe[k]) for k in range(N)])
peRT = np.array([ref.pe_from_pg(T[k], pg[k]) for k in range(N)])
rho = np.array([ref.rho_from_pe(T[k], pe[k]) for k in range(N)])
peFromRho = np.array([ref.pe_from_rho(T[k], rho[k]) for k in range(N)])
pgFromRho = np.array([ref.pg_from_rho(T[k], rho[k]) for k in range(N)])
h6 = np.stack([ref.get_H6_pops(T[k], pg[k], pe[k]) for k in range(N)], axis=1)
bp = np.stack([ref.get_background_partials(T[k], pg[k], pe[k])
               for k in range(N)], axis=1)
wavs = np.array([912.0, 1500.0, 3000.0, 5000.0, 8000.0, 16000.0, 50000.0])
cop = np.stack([ref.cont_opacity(T[k], pg[k], pe[k], wavs) for k in range(N)])

out = Path(__file__).resolve().parents[2] / 'tests' / 'golden' / 'wittmann_ref.npz'
np.savez_compressed(out, T=T, pe=pe, pg=pg, peRoundTrip=peRT, rho=rho,
                    peFromRho=peFromRho, pgFromRho=pgFromRho, h6=h6,
                    backgroundPartials=bp, wavs=wavs, contOpacity=cop)
print('wrote', out)
