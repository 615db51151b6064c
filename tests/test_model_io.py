"""Model I/O: MULTI atmosphere reader and CRTAF atomic import."""
import textwrap

import numpy as np
import pytest

from lightweaver_tpu.atmosphere import ScaleType
from lightweaver_tpu.crtaf import from_crtaf
from lightweaver_tpu.fal import Falc82
from lightweaver_tpu.multi import read_multi_atmos


def test_multi_reader_roundtrip(tmp_path):
    """Write FAL-C (column-mass scale, cgs) in MULTI format, read it back,
    and compare to the native atmosphere."""
    full = Falc82()
    N = 30
    idx = np.unique(np.linspace(0, 81, N).astype(int))
    N = len(idx)
    cm = full.cmass[idx]
    lines = ['* test atmosphere', 'FALC-test', 'Mass scale',
             '* lg g', '4.44', '* Ndep', str(N)]
    hpop = np.zeros((6, N))
    hpop[0] = full.nHTot[idx] * 0.9
    hpop[5] = full.nHTot[idx] * 0.1
    for k in range(N):
        lines.append(f'{np.log10(cm[k] * 1e3 / 1e4):.6e} '
                     f'{full.temperature[idx][k]:.6e} '
                     f'{full.ne[idx][k] * 1e-6:.6e} '
                     f'{full.vlos[idx][k] / 1e3:.6e} '
                     f'{full.vturb[idx][k] / 1e3:.6e}')
    for k in range(N):
        lines.append(' '.join(f'{hpop[l, k] * 1e-6:.6e}'
                              for l in range(6)))
    p = tmp_path / 'falc.atmos'
    p.write_text('\n'.join(lines) + '\n')

    meta, atmos = read_multi_atmos(str(p))
    assert meta.name == 'FALC-test'
    assert np.isclose(meta.logG, 2.44)
    assert np.allclose(atmos.temperature, full.temperature[idx])
    assert np.allclose(atmos.ne, full.ne[idx], rtol=1e-6)
    assert np.allclose(atmos.nHTot, full.nHTot[idx], rtol=1e-6)
    assert np.allclose(atmos.vturb, full.vturb[idx])
    assert np.all(np.diff(atmos.height) < 0)


CRTAF_YAML = textwrap.dedent("""
crtaf_meta:
  version: v0.1.0
  level: high-level
element:
  symbol: Ca
levels:
  ground:
    energy: {unit: cm-1, value: 0.0}
    g: 2
    stage: 2
    label: "Ca II ground"
    J: {numerator: 1, denominator: 2}
    L: 0
    S: {numerator: 1, denominator: 2}
  excited:
    energy: {unit: cm-1, value: 25414.4}
    g: 4
    stage: 2
    J: {numerator: 3, denominator: 2}
    L: 1
    S: {numerator: 1, denominator: 2}
  ion:
    energy: {unit: cm-1, value: 95751.87}
    g: 1
    stage: 3
lines:
  - type: Voigt
    transition: [excited, ground]
    f_value: 0.682
    broadening:
      - {type: Natural, value: {unit: s-1, value: 1.4e8}}
      - {type: VdW_Unsold, H_scaling: 1.0, He_scaling: 1.0}
      - {type: Stark_Quadratic, scaling: 1.0}
    wavelength_grid:
      type: LinearCoreExpWings
      q_core: 15.0
      q_wing: 600.0
      n_lambda: 51
continua:
  - type: Hydrogenic
    transition: [ion, ground]
    sigma_peak: {unit: m2, value: 2.0e-23}
    lambda_min: {unit: nm, value: 50.0}
    n_lambda: 15
collisions:
  - transition: [excited, ground]
    data:
      - type: Omega
        temperature: {unit: K, value: [3000.0, 10000.0, 30000.0]}
        data: {unit: "", value: [10.0, 10.0, 10.0]}
  - transition: [ion, ground]
    data:
      - type: CI
        temperature: {unit: K, value: [3000.0, 10000.0, 30000.0]}
        data: {unit: "m3 s-1 K(-1/2)", value: [1.0e-16, 1.0e-16, 1.0e-16]}
""")


def test_crtaf_import():
    model = from_crtaf(CRTAF_YAML)
    assert model.element.name == 'Ca'
    assert len(model.levels) == 3
    assert model.levels[0].stage == 1         # CRTAF stage is 1-based
    assert len(model.lines) == 1
    line = model.lines[0]
    assert np.isclose(line.lambda0, 1e7 / 25414.4, rtol=1e-6)
    assert line.polarisable                   # J/L/S given
    assert len(model.continua) == 1
    assert np.isclose(model.continua[0].lambda0, 1e7 / 95751.87, rtol=1e-6)
    assert len(model.collisions) == 2

    # usable in a synthesis pipeline (LTE pops on FAL-C)
    from lightweaver_tpu.atmosphere import Atmosphere
    from lightweaver_tpu.atomic_set import RadiativeSet
    from lightweaver_tpu.rh_atoms import H_6_atom
    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 20).astype(int))
    atmos = Atmosphere(height=full.height[idx],
                       temperature=full.temperature[idx],
                       vlos=full.vlos[idx], vturb=full.vturb[idx],
                       ne=full.ne[idx], nHTot=full.nHTot[idx])
    rs = RadiativeSet([H_6_atom(), model])
    eqPops = rs.compute_eq_pops(atmos)
    nStar = eqPops.atomicPops['Ca'].nStar
    assert np.all(np.isfinite(nStar)) and np.all(nStar > 0)


def test_crtaf_ev_units():
    m = from_crtaf(CRTAF_YAML.replace(
        'energy: {unit: cm-1, value: 25414.4}',
        'energy: {unit: eV, value: 3.15099}'))
    assert np.isclose(m.levels[1].E, 25414.4, rtol=1e-4)
