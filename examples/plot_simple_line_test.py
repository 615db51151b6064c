"""Gallery: Ca II 8542 NLTE profiles under three electron-density
treatments, as a publication figure — the figure-producing counterpart
of ``examples/simple_line_test.py`` (the analogue of the reference's
``plot_SimpleLineTest.py`` gallery script, which renders the same three
synthesis variants with matplotlib).

Run ``python examples/simple_line_test.py`` first (or let this script
compute everything itself); the figure is written next to the data as
``simple_line_test.png``.
"""
import os
import sys

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt
import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

LABELS = {
    'fixed_ne': "model ne (FAL-C)",
    'lte_ne': "iterated LTE ne",
    'conserve': "NR charge conservation",
}


def load_or_compute():
    path = os.path.join(os.getcwd(), 'simple_line_test.npz')
    if os.path.exists(path):
        d = np.load(path)
        return d['wavelength'], {k: d[k] for k in LABELS if k in d}
    import lightweaver_tpu as lw
    from simple_line_test import synth_8542
    results = {}
    lam, results['fixed_ne'], _ = synth_8542(lw.Falc82(), conserve=False,
                                             useNe=True)
    _, results['conserve'], _ = synth_8542(lw.Falc82(), conserve=True,
                                           useNe=False)
    _, results['lte_ne'], _ = synth_8542(lw.Falc82(), conserve=False,
                                         useNe=False)
    return lam, results


def main():
    lam, results = load_or_compute()
    fig, (ax, axr) = plt.subplots(
        2, 1, figsize=(7.0, 6.0), sharex=True,
        gridspec_kw={'height_ratios': [3, 1]})
    ref = results['fixed_ne']
    for key, I in results.items():
        ax.plot(lam, I / 1e-8, label=LABELS.get(key, key))
        if key != 'fixed_ne':
            axr.plot(lam, I / ref - 1.0, label=LABELS.get(key, key))
    ax.set_ylabel(r'I$_\lambda$ [$10^{-8}$ J m$^{-2}$ s$^{-1}$'
                  r' Hz$^{-1}$ sr$^{-1}$]')
    ax.legend(frameon=False)
    ax.set_title('Ca II 8542 Å, FAL-C, three ne treatments')
    axr.axhline(0.0, color='0.7', lw=0.8)
    axr.set_ylabel('rel. diff.')
    axr.set_xlabel('wavelength [nm]')
    fig.tight_layout()
    out = 'simple_line_test.png'
    fig.savefig(out, dpi=150)
    print('wrote', out)


if __name__ == '__main__':
    main()
