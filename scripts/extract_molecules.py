"""Extract the RH/Kurucz molecular model data tables from the reference
distribution's data files into our own JSON format.

Data provenance: Kurucz (1970, 1985) and Sauval & Tatum (1984)
equilibrium-constant/partition-function polynomial fits, distributed as
plain data files with RH (public atomic/molecular data, not code).
"""
import json
import re
from pathlib import Path

SRC = Path('/root/reference/lightweaver/Data/DefaultMolecules')
DST = Path(__file__).resolve().parent.parent / 'lightweaver_tpu' / 'data'


def next_line(lines):
    while lines:
        line = lines.pop(0)
        s = line.strip()
        if s.startswith('#') or not s:
            continue
        return s
    return None


def parse_constituent(s):
    m = re.match(r'^(\d+)([A-Za-z]+)$', s.strip())
    if m:
        return int(m.group(1)), m.group(2)
    return 1, s.strip()


def parse_molecule(path):
    lines = path.read_text().splitlines()
    name = next_line(lines)
    charge = int(next_line(lines))
    constituents = [parse_constituent(c)
                    for c in next_line(lines).split(',')]
    Ediss_eV = float(next_line(lines))
    fit = next_line(lines)
    tmin, tmax = [float(x) for x in next_line(lines).split()]
    pf = next_line(lines).split()
    pfCoef = [float(x) for x in pf[1:]]
    assert len(pfCoef) == int(pf[0])
    eqc = next_line(lines).split()
    eqcCoef = [float(x) for x in eqc[1:]]
    assert len(eqcCoef) == int(eqc[0])
    return {
        'name': name, 'charge': charge,
        'elements': [e for (_c, e) in constituents],
        'counts': [c for (c, _e) in constituents],
        'Ediss_eV': Ediss_eV, 'fit': fit, 'Tmin': tmin, 'Tmax': tmax,
        'pfCoef': pfCoef, 'eqcCoef': eqcCoef,
    }


def main():
    out = {}
    for p in sorted(SRC.glob('*.molecule')):
        try:
            m = parse_molecule(p)
        except Exception as e:
            print(f'skip {p.name}: {e}')
            continue
        # key (and name) by file stem: CO_NLTE.molecule declares the
        # name 'CO' and would otherwise shadow CO.molecule (their
        # equilibrium data is identical; they differ only in the line
        # list pointer, which neither parser reads)
        m['name'] = p.stem
        out[p.stem.upper()] = m
        print(f'{m["name"]}: {m["fit"]} Ediss={m["Ediss_eV"]} eV')
    (DST / 'molecules.json').write_text(json.dumps(out, indent=1))
    print(f'wrote {len(out)} molecules')


if __name__ == '__main__':
    main()
