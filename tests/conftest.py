import os

# 8 virtual CPU devices so sharding tests run without a TPU pod.
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8')
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

# The axon TPU plugin (if present) force-registers itself and overrides
# JAX_PLATFORMS; pin the test session to CPU explicitly.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
