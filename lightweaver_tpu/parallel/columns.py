"""Scale-out over independent atmospheric columns (1.5D synthesis) and
wavelength, via jax.sharding over a device mesh.

The reference delegates multi-column work to user-level MPI/ProcessPool
(ref: /root/reference/docs/index.rst:36-38); here it is first-class: the
single-column MALI iteration is a pure function of a params pytree
(see context.build_iteration_fn), so a batch of columns is vmap over a
stacked pytree, sharded across the mesh 'columns' axis, with the dense
wavelength axis optionally sharded across 'wavelength' (XLA inserts the
window-slice halo collectives automatically under GSPMD).
"""
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..context import Context, build_iteration_fn, _stat_eq_solve
from ..iteration_update import IterationUpdate


def make_mesh(nColumns: Optional[int] = None, nWavelength: int = 1,
              devices=None) -> Mesh:
    """Create a ('columns', 'wavelength') device mesh."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if nColumns is None:
        nColumns = n // nWavelength
    if nColumns * nWavelength != n:
        raise ValueError(f'{nColumns} x {nWavelength} != {n} devices')
    dev = np.asarray(devices).reshape(nColumns, nWavelength)
    return Mesh(dev, axis_names=('columns', 'wavelength'))


class ColumnBatch:
    """A batch of independent 1D NLTE problems sharing the same models and
    wavelength grid, iterated in lockstep and sharded over a mesh."""

    def __init__(self, contexts: List[Context], mesh: Optional[Mesh] = None):
        if not contexts:
            raise ValueError('Need at least one context')
        self.contexts = contexts
        self.cfg = contexts[0].cfg
        self.mesh = mesh
        self.Ncol = len(contexts)

        paramsList = [c.build_params() for c in contexts]
        self.params = jax.tree.map(lambda *xs: jnp.stack(xs), *paramsList)
        if mesh is not None:
            self.params = self._shard(self.params)

        base = build_iteration_fn(self.cfg)
        self._iter_full = jax.jit(jax.vmap(partial(base,
                                                   lambdaIterate=False)))
        self._iter_lambda = jax.jit(jax.vmap(partial(base,
                                                     lambdaIterate=True)))
        self._stat_eq = jax.jit(jax.vmap(_stat_eq_solve))
        self._GammaOut = None

    def _shard(self, tree):
        """Columns axis on dim 0 of every stacked leaf; wavelength axis on
        the dense [Nlam, Nk] leaves."""
        mesh = self.mesh
        lamSharded = {'J', 'bgChi', 'bgEta', 'bgSca'}

        def put(path, x):
            name = path[-1] if path else ''
            if x.ndim >= 3 and name in lamSharded:
                spec = P('columns', 'wavelength')
            else:
                spec = P('columns')
            return jax.device_put(x, NamedSharding(mesh, spec))

        # jax.tree_util with path
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        out = []
        for path, leaf in flat:
            keys = [getattr(p, 'key', getattr(p, 'idx', None)) for p in path]
            name = next((k for k in reversed(keys) if isinstance(k, str)), '')
            if hasattr(leaf, 'ndim') and leaf.ndim >= 3 and name in lamSharded:
                spec = P('columns', 'wavelength')
            else:
                spec = P('columns')
            out.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
        return jax.tree_util.tree_unflatten(treedef, out)

    # ------------------------------------------------------------------
    def formal_sol_gamma_matrices(self, lambdaIterate: bool = False) \
            -> IterationUpdate:
        fn = self._iter_lambda if lambdaIterate else self._iter_full
        out = fn(self.params)
        self.params['J'] = out['J']
        self._GammaOut = out['Gamma']
        self.I = out['I']
        dJ = float(jnp.max(out['dJ']))
        return IterationUpdate(self, updatedJ=True, dJMax=dJ)

    def stat_equil(self) -> IterationUpdate:
        dPops = []
        for ai, a in enumerate(self.cfg.activeAtoms):
            n = self.params['pops'][ai]
            nTotal = jnp.stack(
                [jnp.asarray(c.eqPops.atomicPops[a.model.element].nTotal,
                             self.cfg.dtype) for c in self.contexts])
            nNew = self._stat_eq(self._GammaOut[ai], n, nTotal)
            dPops.append(float(jnp.max(jnp.abs(1.0 - n / nNew))))
            self.params['pops'][ai] = nNew
        return IterationUpdate(self, updatedPops=True, dPops=dPops)

    @property
    def crswDone(self):
        return True

    def iterate(self, Nscatter: int = 3, NmaxIter: int = 500,
                JTol: float = 5e-3, popsTol: float = 1e-3,
                quiet: bool = True) -> int:
        for it in range(NmaxIter):
            ju = self.formal_sol_gamma_matrices()
            if it < Nscatter:
                continue
            pu = self.stat_equil()
            if not quiet:
                print(f'-- it {it}: dJ={ju.dJMax:.2e} '
                      f'dPops={pu.dPopsMax:.2e}')
            if ju.dJMax < JTol and pu.dPopsMax < popsTol:
                return it + 1
        return NmaxIter
