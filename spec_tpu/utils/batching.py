"""Padded-batch sizing shared by the serving engine and the detector.

XLA compiles one program per static batch shape; padding every call to
the next power of two (capped at the configured batch size) bounds the
number of compiled shapes to log2(cap) while keeping one-item calls from
paying a full batch of backbone compute.
"""

from __future__ import annotations


def pad_pow2(n: int, cap: int) -> int:
    """Smallest power of two >= ``n``, capped at ``cap``."""
    p = 1
    while p < n:
        p *= 2
    return min(p, cap)
