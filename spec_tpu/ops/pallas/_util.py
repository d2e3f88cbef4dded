"""Shared kernel-side helpers."""

from __future__ import annotations


def round_up(x: int, m: int) -> int:
    """Smallest multiple of m >= x (tile/pad sizing)."""
    return ((x + m - 1) // m) * m
