"""The driver-contract entry points must be robust to a broken TPU backend.

Round-1 postmortem (VERDICT.md): ``dryrun_multichip`` is a CPU-mesh
correctness artifact, but it probed ``jax.devices()`` and imported
``spec_tpu`` (module-level jnp constants) before pinning the CPU platform,
so a TPU-tunnel flake (libtpu version mismatch) turned the multi-chip
signal red. These tests run the dryrun in a subprocess whose default JAX
platform is *guaranteed broken* — ``JAX_PLATFORMS=axon`` with the axon
plugin never registered — and require it to pass anyway.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # subprocess dryruns, ~1-2 min

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _broken_tpu_env():
    """Env where the default platform ('axon') exists as a name but was
    never registered: any bare default-backend init raises."""
    env = dict(os.environ)
    # Without PALLAS_AXON_POOL_IPS the sitecustomize skips plugin
    # registration, and JAX_PLATFORMS=axon then makes the default backend
    # unresolvable (no silent CPU fallback) — a faithful stand-in for a
    # down/mismatched TPU tunnel.
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env['JAX_PLATFORMS'] = 'axon'
    env.pop('JAX_PLATFORM_NAME', None)
    return env


def test_broken_default_backend_simulation_is_real():
    """Negative control: under the sabotaged env a bare jax.devices()
    must fail — otherwise the main test below proves nothing."""
    r = subprocess.run(
        [sys.executable, '-c', 'import jax; jax.devices()'],
        env=_broken_tpu_env(), cwd=REPO, capture_output=True, text=True,
        timeout=300)
    assert r.returncode != 0, (
        'expected the unregistered-axon env to break jax.devices(); '
        f'stdout={r.stdout!r} stderr={r.stderr[-500:]!r}')


def test_dryrun_multichip_survives_broken_tpu_backend():
    """dryrun_multichip(8) must complete on the virtual CPU mesh even when
    the default (TPU) backend cannot initialize at all."""
    r = subprocess.run(
        [sys.executable, '-c',
         'from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)'],
        env=_broken_tpu_env(), cwd=REPO, capture_output=True, text=True,
        timeout=900)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert '[dryrun_multichip] n=8 ok' in r.stdout, r.stdout[-2000:]


def test_bench_emits_stale_cached_result_when_backend_down():
    """bench.py with an unreachable backend must still print ONE JSON
    line: the last cached real measurement for the exact config, clearly
    marked stale (a red round-end artifact would otherwise conflate an
    infra outage with a perf regression). Requires the committed
    .bench_cache.json headline entry."""
    import json

    env = _broken_tpu_env()
    env['SPEC_BENCH_BACKEND_BUDGET_S'] = '5'   # don't ride out 30 min
    r = subprocess.run(
        [sys.executable, 'bench.py'],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    line = r.stdout.strip().splitlines()[-1]
    payload = json.loads(line)
    assert payload['stale'] is True
    assert payload['unit'] == 'img/s/chip'
    assert payload['value'] > 0
    assert 'backend unavailable' in payload['stale_reason']
