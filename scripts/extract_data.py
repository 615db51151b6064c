"""Extract public physical data tables from the reference distribution into
lightweaver_tpu's own npz/json formats.

The extracted content is *data* (Asplund et al. 2009 abundances, CIAAW
atomic masses, Kurucz partition functions in RH's XDR layout, Stepan &
Trujillo Bueno (2020) 2D angular quadratures, Barklem ABO cross-section
tables) — not code.  Run once at build time; outputs are committed under
lightweaver_tpu/data/.
"""
import json
import pickle
import struct
import sys
from pathlib import Path

import numpy as np

REF = Path('/root/reference/lightweaver/Data')
OUT = Path(__file__).resolve().parent.parent / 'lightweaver_tpu' / 'data'
OUT.mkdir(parents=True, exist_ok=True)


class Xdr:
    """Minimal big-endian XDR reader (xdrlib was removed in py3.13)."""

    def __init__(self, buf):
        self.buf = buf
        self.pos = 0

    def u32(self):
        v = struct.unpack_from('>I', self.buf, self.pos)[0]
        self.pos += 4
        return v

    def i32(self):
        v = struct.unpack_from('>i', self.buf, self.pos)[0]
        self.pos += 4
        return v

    def doubles(self, n):
        v = np.frombuffer(self.buf, dtype='>f8', count=n, offset=self.pos)
        self.pos += 8 * n
        return v.astype(np.float64)

    def double_array(self):
        n = self.u32()
        return self.doubles(n)


def extract_abundances():
    with open(REF / 'AbundancesAsplund09.pickle', 'rb') as f:
        data = pickle.load(f)
    out = []
    for entry in data:
        e = entry['elem']
        out.append({
            'Z': e['elem']['Z'],
            'name': e['elem']['name'],
            'mass': e['elem']['mass'],
            'abundance': e['abundance'],
            'isotopes': [{'N': i['N'], 'mass': i['mass'],
                          'proportion': i['proportion']}
                         for i in entry['isotopes']],
        })
    with open(OUT / 'abundances_asplund09.json', 'w') as f:
        json.dump(out, f, indent=1)
    print(f'abundances: {len(out)} elements')


def extract_kurucz_pf():
    with open(REF / 'pf_Kurucz.input', 'rb') as f:
        buf = f.read()
    x = Xdr(buf)
    Tpf = x.double_array()
    NT = len(Tpf)
    Nelem = 99
    nStages = np.zeros(Nelem, dtype=np.int32)
    pfs = []
    ionpots = []
    for i in range(Nelem):
        z = x.i32()
        ns = x.i32()
        nStages[i] = ns
        pfs.append(x.doubles(ns * NT).reshape(ns, NT))
        ionpots.append(x.doubles(ns))
    maxS = int(nStages.max())
    pf = np.zeros((Nelem, maxS, NT))
    ionpot = np.zeros((Nelem, maxS))
    for i in range(Nelem):
        pf[i, :nStages[i]] = pfs[i]
        ionpot[i, :nStages[i]] = ionpots[i]
    np.savez_compressed(OUT / 'kurucz_pf.npz', Tpf=Tpf, nStages=nStages,
                        pf=pf, ionpot_cm1=ionpot)
    print(f'kurucz pf: {Nelem} elements, {NT} temps, max {maxS} stages')


def extract_quadratures():
    with open(REF / 'Quadratures.pickle', 'rb') as f:
        q = pickle.load(f)
    np.savez_compressed(OUT / 'quadratures_2d.npz',
                        **{k: np.asarray(v) for k, v in q.items()})
    print(f'quadratures: {len(q)} sets')


def extract_barklem():
    for name in ['spdata', 'pddata', 'dfdata']:
        rows = []
        with open(REF / f'Barklem_{name}.dat') as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith('c'):
                    continue
                rows.append([float(v) for v in line.split()])
        arr = np.array(rows)
        np.savez_compressed(OUT / f'barklem_{name}.npz', data=arr)
        print(f'barklem {name}: {arr.shape}')


if __name__ == '__main__':
    extract_abundances()
    extract_kurucz_pf()
    extract_quadratures()
    extract_barklem()


def extract_falc():
    """Pull the FAL-C (Fontenla et al. 1993) model tables out of the
    reference's fal.py source (pure data: cmass, T, ne, vturb, nh)."""
    import re
    src = (Path('/root/reference/lightweaver/fal.py')).read_text()
    ns = {'np': np}
    for name in ['cmass', 'temp', 'ne', 'vturb', 'nh']:
        m = re.search(rf'^{name} = ', src, re.M)
        start = m.end()
        depth, i = 0, start
        while True:
            c = src[i]
            if c in '([':
                depth += 1
            elif c in ')]':
                depth -= 1
                if depth == 0:
                    j = i + 1
                    while j < len(src) and src[j] in '.T)':
                        j += 1
                    i = j
                    break
            i += 1
        ns[name] = eval(src[start:i], ns)  # noqa: S307 - data extraction
    np.savez_compressed(OUT / 'falc82.npz',
                        cmass_log_cgs=np.log10(ns['cmass']),
                        temperature=ns['temp'],
                        ne_cgs=ns['ne'],
                        vturb_kms=ns['vturb'],
                        nh_cgs=ns['nh'])
    print('falc82:', ns['temp'].shape, 'nh', ns['nh'].shape)


if __name__ == '__main__':
    extract_falc()
