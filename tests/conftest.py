import os

# Virtual 8-device CPU mesh for sharding tests. XLA_FLAGS must be set before
# the CPU backend initializes; the platform itself is forced through
# jax.config because the environment's TPU plugin overrides JAX_PLATFORMS.
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# persistent compilation cache: the 1-core host recompiles every test
# program otherwise; cached reruns cut the suite time several-fold
from rmem_ocu_tpu.utils.run_utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import pytest  # noqa: E402


@pytest.fixture(scope='session')
def rng():
    return jax.random.PRNGKey(0)
