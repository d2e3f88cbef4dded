"""Backend liveness probing for tunnel-backed TPU environments.

The TPU in this sandbox is reached through a remote tunnel that flakes
for minutes at a time (libtpu upgrades, pool churn); a dead tunnel at
artifact time (bench / entry compile check) must not produce a red
result if it recovers within the budget. A failed backend init is
cached in-process by jax and cannot be retried, so the probe runs in a
SUBPROCESS — only once it answers does the caller touch the backend in
its own process.
"""

from __future__ import annotations

import subprocess
import sys
import time

__all__ = ['wait_for_backend']


def wait_for_backend(budget_s: float = 600.0,
                     probe_timeout_s: float = 180.0,
                     retry_sleep_s: float = 30.0) -> bool:
    """Block until a trivial device op answers in a fresh subprocess, or
    the budget runs out. Returns True when the backend answered; on
    exhaustion prints a note to stderr and returns False (callers should
    proceed — the real run will surface the error). Healthy-path cost:
    one ~5 s python startup. stdout is never written (bench.py's
    one-JSON-line contract)."""
    deadline = time.time() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            p = subprocess.run(
                [sys.executable, '-c',
                 'import jax, jax.numpy as jnp; '
                 'print(float(jnp.ones((8, 8)).sum()))'],
                timeout=probe_timeout_s, capture_output=True)
            if p.returncode == 0:
                if attempt > 1:
                    print(f'[backend] recovered on attempt {attempt}',
                          file=sys.stderr)
                return True
            err = p.stderr.decode(errors='replace').strip().splitlines()
        except subprocess.TimeoutExpired:
            err = [f'probe timed out ({probe_timeout_s:.0f} s)']
        if time.time() >= deadline:
            print('[backend] probe budget exhausted; proceeding (the '
                  'run itself will surface the error)', file=sys.stderr)
            return False
        print(f'[backend] probe attempt {attempt} failed '
              f'({err[-1] if err else "?"}); retrying in '
              f'{retry_sleep_s:.0f} s', file=sys.stderr)
        time.sleep(retry_sleep_s)
