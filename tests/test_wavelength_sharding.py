"""Wavelength-axis sharding of the MALI iteration over a device mesh.

The reference parallelises over wavelength with threads and per-thread
Gamma replicas (ref: SimdFullIterationTemplates.hpp:645-698,
ThreadStorage.cpp); here the same axis is sharded across devices by
annotating the dense [Nlambda, ...] params arrays -- GSPMD partitions
the windows and inserts the psum for the Gamma/J contractions
automatically.  Oracle: sharded == unsharded to roundoff.
"""
import numpy as np
import pytest


@pytest.mark.slow
def test_wavelength_sharded_iteration_matches():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 4:
        pytest.skip('needs >= 4 devices (conftest forces 8 CPU devices)')

    from lightweaver_tpu.atmosphere import Atmosphere
    from lightweaver_tpu.atomic_set import RadiativeSet
    from lightweaver_tpu.context import Context, build_iteration_fn
    from lightweaver_tpu.fal import Falc82
    from lightweaver_tpu.rh_atoms import CaII_atom, H_6_atom

    full = Falc82()
    idx = np.unique(np.linspace(0, 81, 24).astype(int))
    atmos = Atmosphere(height=full.height[idx],
                       temperature=full.temperature[idx],
                       vlos=full.vlos[idx], vturb=full.vturb[idx],
                       ne=full.ne[idx], nHTot=full.nHTot[idx])
    atmos.quadrature(3)
    rs = RadiativeSet([H_6_atom(), CaII_atom()])
    rs.set_active('Ca')
    spect = rs.compute_wavelength_grid()
    eqPops = rs.compute_eq_pops(atmos)
    ctx = Context(atmos, spect, eqPops)
    params = ctx.build_params()

    fn = jax.jit(build_iteration_fn(ctx.cfg),
                 static_argnames=('lambdaIterate', 'storeDepthData'))
    ref = fn(params)

    Nlam = ctx.cfg.Nlam
    nDev = max(d for d in (8, 6, 4, 3, 2) if Nlam % d == 0
               and d <= len(jax.devices()))
    mesh = Mesh(np.array(jax.devices()[:nDev]), axis_names=('wavelength',))
    lamSharded = {'J', 'bgChi', 'bgEta', 'bgSca'}

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        keys = [getattr(p, 'key', None) for p in path]
        name = next((k for k in reversed(keys) if isinstance(k, str)), '')
        if hasattr(leaf, 'ndim') and leaf.ndim == 2 and name in lamSharded:
            spec = P('wavelength', None)
        else:
            spec = P()
        out.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    paramsSharded = jax.tree_util.tree_unflatten(treedef, out)

    shd = fn(paramsSharded)

    assert np.allclose(np.asarray(shd['J']), np.asarray(ref['J']),
                       rtol=1e-12)
    assert np.allclose(np.asarray(shd['dJ']), np.asarray(ref['dJ']),
                       rtol=1e-10)
    for Gs, Gr in zip(shd['Gamma'], ref['Gamma']):
        assert np.allclose(np.asarray(Gs), np.asarray(Gr), rtol=1e-10)
