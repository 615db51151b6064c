"""Probe whether Pallas/Mosaic kernels lower through the axon TPU tunnel.

Round-2 finding (CLAUDE.md): Mosaic custom calls were unsupported over
the tunnel.  Re-test each round: if this passes, the fused formal-solver
sweep kernel is the clean path to the roofline target.

Run detached:  nohup python scripts/pallas_probe.py > /tmp/pallas_probe.log 2>&1 &
"""
import json

import jax
import jax.numpy as jnp
import numpy as np


def main():
    dev = jax.devices()[0]
    print(json.dumps({'device': str(dev), 'platform': dev.platform}),
          flush=True)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0 + 1.0

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    try:
        y = np.asarray(f(x))
        ok = bool(np.allclose(y, np.asarray(x) * 2.0 + 1.0))
        print(json.dumps({'pallas_elementwise': 'ok' if ok else 'WRONG'}),
              flush=True)
    except Exception as e:
        print(json.dumps({'pallas_elementwise': 'FAIL',
                          'error': repr(e)[:500]}), flush=True)
        return

    # a kernel with a fori_loop carrying a recurrence (the FS shape)
    def sweep_kernel(a_ref, b_ref, o_ref):
        def body(k, carry):
            carry = a_ref[k, :] * carry + b_ref[k, :]
            o_ref[k, :] = carry
            return carry
        jax.lax.fori_loop(0, a_ref.shape[0], body,
                          jnp.zeros((a_ref.shape[1],), a_ref.dtype))

    @jax.jit
    def sweep(a, b):
        return pl.pallas_call(
            sweep_kernel,
            out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)

    a = jnp.full((64, 256), 0.5, jnp.float32)
    b = jnp.ones((64, 256), jnp.float32)
    try:
        y = np.asarray(sweep(a, b))
        ref = np.zeros((256,), np.float32)
        refs = []
        for k in range(64):
            ref = 0.5 * ref + 1.0
            refs.append(ref.copy())
        ok = bool(np.allclose(y, np.stack(refs)))
        print(json.dumps({'pallas_recurrence': 'ok' if ok else 'WRONG'}),
              flush=True)
    except Exception as e:
        print(json.dumps({'pallas_recurrence': 'FAIL',
                          'error': repr(e)[:500]}), flush=True)


if __name__ == '__main__':
    main()
