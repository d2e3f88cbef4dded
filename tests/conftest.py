"""Test configuration: force an 8-device virtual CPU mesh before JAX runs.

Multi-device tests run on CPU with ``xla_force_host_platform_device_count``
(SURVEY.md §4e) — parallelism in this framework is batch-only, so CPU devices
validate every sharding path without TPU hardware.

NB: this environment pre-registers an external TPU PJRT plugin and pins
``JAX_PLATFORMS`` in the parent env, so ``os.environ.setdefault`` is not
enough — we must override the env var AND force the platform through
``jax.config`` after import.
"""

import os

os.environ.setdefault('SPEC_JAX_CACHE_DIR', os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), '.jax_cache'))

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ.setdefault('JAX_ENABLE_X64', '0')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == 'cpu', (
    f'tests must run on CPU, got {jax.default_backend()}')


@pytest.fixture
def rng():
    return np.random.RandomState(42)
