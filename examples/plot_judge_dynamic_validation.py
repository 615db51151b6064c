"""Gallery: time-dependent hydrogen ionisation after impulsive heating —
the figure of Judge (2017), ApJ 851, 5, as rendered by the reference's
``plot_JudgeDynamicValidation.py`` gallery script.

Run ``python examples/time_dependent_h.py`` first (it saves
``time_dependent_h.npz``; this script can also compute a reduced run
itself).  The figure (proton + ground-level H populations vs column
mass over time) is written as ``judge_dynamic_validation.png``.
"""
import os
import subprocess
import sys

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt
import numpy as np


def load_or_compute():
    path = os.path.join(os.getcwd(), 'time_dependent_h.npz')
    if not os.path.exists(path):
        here = os.path.dirname(os.path.abspath(__file__))
        subprocess.run([sys.executable,
                        os.path.join(here, 'time_dependent_h.py')],
                       check=True)
    return np.load(path)


def main():
    d = load_or_compute()
    hPops, dt, cmass = d['hPops'], float(d['dt']), d['cmass']
    nT = hPops.shape[0]
    x = np.log10(cmass)

    fig, (axP, axG) = plt.subplots(1, 2, figsize=(9.5, 4.2), sharex=True)
    cmap = plt.get_cmap('viridis')
    for it in range(nT):
        c = cmap(it / max(nT - 1, 1))
        lw_ = 2.0 if it in (0, nT - 1) else 0.8
        axP.plot(x, np.log10(hPops[it][-1]), color=c, lw=lw_)
        axG.plot(x, np.log10(hPops[it][0]), color=c, lw=lw_)
    axP.set_title('protons')
    axG.set_title('H I ground level')
    for ax in (axP, axG):
        ax.set_xlabel(r'log$_{10}$ column mass [kg m$^{-2}$]')
        ax.set_xlim(x.max(), x.min())
    axP.set_ylabel(r'log$_{10}$ n [m$^{-3}$]')
    sm = plt.cm.ScalarMappable(
        cmap=cmap, norm=plt.Normalize(0.0, (nT - 1) * dt))
    fig.colorbar(sm, ax=(axP, axG), label='time [s]', fraction=0.04)
    fig.suptitle('Time-dependent H ionisation after impulsive heating '
                 '(Judge 2017 validation)')
    out = 'judge_dynamic_validation.png'
    fig.savefig(out, dpi=150)
    print('wrote', out)


if __name__ == '__main__':
    main()
