"""Extract published opacity data tables from the reference Background.cpp.

These are pure data: Geltman (1962) H- bf cross-sections, Stilley &
Callaway (1970) H- ff, John (1988) long-wavelength H- ff fit, Bell (1980)
H2- ff, Bates (1952) H2+ ff, Victor & Dalgarno (1969) H2 Rayleigh, and the
Kurucz OH/CH photodissociation tables.
"""
import re
from pathlib import Path

import numpy as np

SRC = Path('/root/reference/Source/Background.cpp').read_text()
OUT = Path(__file__).resolve().parent.parent / 'lightweaver_tpu' / 'data'


def grab(name):
    """Extract a C array literal by variable name."""
    m = re.search(rf'{name}\s*(?:\[[^\]]*\])+\s*=\s*\{{', SRC)
    if m is None:
        raise KeyError(name)
    start = m.end() - 1
    depth = 0
    i = start
    while True:
        c = SRC[i]
        if c == '{':
            depth += 1
        elif c == '}':
            depth -= 1
            if depth == 0:
                break
        i += 1
    body = SRC[start:i + 1]
    body = re.sub(r'/\*.*?\*/', '', body, flags=re.S)
    body = re.sub(r'//.*', '', body)
    nums = re.findall(r'[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?', body)
    return np.array([float(x) for x in nums])


tables = {}
# H- bound-free (Geltman 1962)
tables['hmin_bf_lambda'] = grab('lambdaBF')
tables['hmin_bf_alpha'] = grab('alphaBF')
# H- free-free (Stilley & Callaway 1970)
tables['hmin_ff_lambda'] = grab('lambdaFF')
tables['hmin_ff_theta'] = grab('thetaFF')
tables['hmin_ff_kappa'] = grab('kappaFF').reshape(17, 16)
# John 1988 long-wavelength H- ff coefficients
for c in 'ABCDEF':
    tables[f'john_{c}'] = grab(rf'double {c}')[:6]
# H2- ff (Bell 1980)
tables['h2min_ff_lambda'] = grab('lambdaFFMinus')
tables['h2min_ff_theta'] = grab('thetaFFMinus')
tables['h2min_ff_kappa'] = grab('kappaFFMinus').reshape(19, 8)
# H2+ ff (Bates 1952)
tables['h2plus_ff_lambda'] = grab('lambdaFFPlus')
tables['h2plus_ff_temp'] = grab('tempFFPlus')
tables['h2plus_ff_kappa'] = grab('kappaFFPlus').reshape(15, 10)
# H2 Rayleigh (Victor & Dalgarno 1969)
tables['rayleigh_h2_lambda'] = grab('lambdaRH2')
tables['rayleigh_h2_sigma'] = grab('double sigma')
tables['rayleigh_h2_a'] = grab('double a')[:3]
# OH / CH photodissociation (Kurucz)
tables['oh_T'] = grab('TOH')
tables['oh_E'] = grab('EOH')
tables['oh_cross'] = grab('OH_cross').reshape(130, 15)
tables['ch_T'] = grab('TCH')
tables['ch_E'] = grab('ECH')
tables['ch_cross'] = grab('CH_cross').reshape(-1, 15)

for k, v in tables.items():
    print(k, v.shape)
np.savez_compressed(OUT / 'background_tables.npz', **tables)
print('saved background_tables.npz')
