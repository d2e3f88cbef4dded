"""Fused ResNet identity-bottleneck chain — Pallas TPU kernel.

The e2e pipeline is HBM-bandwidth-bound in the ResNet trunks (CLAUDE.md;
XLA already runs the flax blocks at ~90% HBM utilization, so the only
remaining lever is TRAFFIC). This kernel executes K consecutive identity
bottleneck blocks (1x1 -> 3x3 -> 1x1, BatchNorm folded, residual, ReLU —
reference block semantics: the PARE/torchvision bottleneck our flax twin
mirrors at ``models/backbones/resnet.py:107-139``) over a VMEM row band:
the input is read once (+K halo rows/side), intermediates never touch
HBM, the output is written once. vs XLA's per-block ~3x-output traffic,
a K-chain cuts HBM bytes by ~3K/2.

Layout/halo design (verified on hardware):
  * grid = (batch, row-tiles); channels ride the lanes (NHWC).
  * 3x3 via im2col + one (px, 9M) x (9M, M) MXU dot — at M=64 (layer1)
    nine K=N=64 dots leave the 128-wide MXU 3/4 idle.
  * top/bottom halos are extra Blocked inputs with index maps clamped at
    the image edges (Mosaic aborts on negative block offsets — there is
    no low-side clamping); border rows are re-zeroed *at the h1 level*
    per block, because the 3x3 zero-pads its OWN input (= post-relu h1,
    where a zeroed x would still contribute relu(b1)).
  * each chained block consumes one halo row per side; at a true image
    border block k zeroes its outermost K-k h1 rows (the positions
    outside the image).

Timing note (this environment): through the axon tunnel only
long-running chained calls with a final host fetch are trustworthy —
``block_until_ready`` does not force remote execution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(kernel, scale, bias, mean, var, eps=1e-5):
    """Fold inference BatchNorm into conv weights.

    kernel: (kh, kw, Cin, Cout) [or (Cin, Cout)]; BN params (Cout,).
    Returns (kernel', bias') with y = conv(x, k') + b' == bn(conv(x, k)).
    Fp32 math — callers cast afterwards.
    """
    s = scale.astype(jnp.float32) * jax.lax.rsqrt(
        var.astype(jnp.float32) + eps)
    k = kernel.astype(jnp.float32) * s  # broadcasts over the last (out) dim
    b = bias.astype(jnp.float32) - mean.astype(jnp.float32) * s
    return k, b


def _pick_row_tile(h: int, limit: int, at_least: int = 1) -> int:
    """Largest divisor of ``h`` in [at_least, limit], else the smallest
    divisor >= at_least (awkward heights pay VMEM, not correctness)."""
    for rt in range(min(limit, h), at_least - 1, -1):
        if h % rt == 0:
            return rt
    for rt in range(at_least, h + 1):
        if h % rt == 0:
            return rt
    return h


def _block_body(band, r, n_r, n_invalid, w, dt, width, c, m):
    """One folded bottleneck over a row band; returns band minus 2 rows."""
    w1, b1, w2, b2, w3, b3 = w
    rows = band.shape[0]
    h1 = jnp.dot(band.reshape(-1, c), w1, preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 + b1, 0.0).astype(dt).reshape(rows, width, m)
    # Zero h1 rows lying outside the image (conv zero-pad semantics).
    rid = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
    bad = ((r == 0) & (rid < n_invalid)) | (
        (r == n_r - 1) & (rid >= rows - n_invalid))
    h1 = jnp.where(bad, jnp.zeros_like(h1), h1)
    h1 = jnp.pad(h1, ((0, 0), (1, 1), (0, 0)))             # width halo
    rt_out = rows - 2
    col = jnp.concatenate(
        [h1[dy:dy + rt_out, dx:dx + width].reshape(-1, m)
         for dy in range(3) for dx in range(3)], axis=1)
    acc = jnp.dot(col, w2, preferred_element_type=jnp.float32)
    h2 = jnp.maximum(acc + b2, 0.0).astype(dt)
    z = jnp.dot(h2, w3, preferred_element_type=jnp.float32) + b3
    y = jnp.maximum(
        z.reshape(rt_out, width, c) + band[1:rows - 1].astype(jnp.float32),
        0.0)
    return y.astype(dt)


def _chain_kernel(*refs, k, kp, rt, width, c, m):
    xc, xt, xb = refs[0], refs[1], refs[2]
    wrefs = refs[3:-1]
    out_ref = refs[-1]
    r = pl.program_id(1)
    n_r = pl.num_programs(1)
    dt = out_ref.dtype
    # Halo blocks are kp rows (kp | rt for aligned Blocked indexing);
    # only the k rows adjacent to the tile are real halo.
    band = jnp.concatenate(
        [xt[kp - k:], xc[...], xb[:k]], axis=0)            # (rt+2k, W, C)
    for i in range(k):
        w = [wr[...] for wr in wrefs[6 * i:6 * i + 6]]
        band = _block_body(band, r, n_r, k - i, w, dt, width, c, m)
    out_ref[...] = band


def _halo_quantum(rt: int, k: int) -> int:
    """Smallest kp with k <= kp <= rt and kp | rt (halo fetch block rows)."""
    for kp in range(k, rt + 1):
        if rt % kp == 0:
            return kp
    return rt


@functools.partial(jax.jit, static_argnames=('interpret', 'row_tile'))
def fused_bottleneck_chain(
    x: jnp.ndarray,          # (B, H, W, C)
    weights: tuple,          # K tuples (w1 (C,M), b1 (M,), w2 (9,M,M),
                             #           b2 (M,), w3 (M,C), b3 (C,))
    interpret: bool = False,
    row_tile: int = 16,
) -> jnp.ndarray:
    """K chained identity bottlenecks with folded BN, one HBM round trip."""
    B, H, W, C = x.shape
    k = len(weights)
    M = weights[0][0].shape[1]
    if k >= H:
        raise ValueError(f'chain of {k} needs image height > {k}, got {H}')
    rt = _pick_row_tile(H, row_tile, at_least=k)
    n_r = H // rt
    kp = _halo_quantum(rt, k)
    dt = x.dtype

    flat = []
    for (w1, b1, w2, b2, w3, b3) in weights:
        flat += [w1.astype(dt), b1.astype(jnp.float32).reshape(1, M),
                 w2.reshape(9 * M, M).astype(dt),
                 b2.astype(jnp.float32).reshape(1, M),
                 w3.astype(dt), b3.astype(jnp.float32).reshape(1, C)]

    kernel = functools.partial(
        _chain_kernel, k=k, kp=kp, rt=rt, width=W, c=C, m=M)
    whole = lambda *shape: pl.BlockSpec(
        shape, (lambda n: lambda b, r: (0,) * n)(len(shape)),
        memory_space=pltpu.VMEM)
    nhb = H // kp  # halo blocks along H
    return pl.pallas_call(
        kernel,
        grid=(B, n_r),
        in_specs=[
            pl.BlockSpec((None, rt, W, C), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (None, kp, W, C),
                lambda b, r: (b, jnp.maximum(r * (rt // kp) - 1, 0), 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (None, kp, W, C),
                lambda b, r: (b, jnp.minimum(r * (rt // kp) + rt // kp,
                                             nhb - 1), 0, 0),
                memory_space=pltpu.VMEM),
        ] + [whole(*w.shape) for w in flat],
        out_specs=pl.BlockSpec((None, rt, W, C), lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * B * H * W * (C * M * 2 + 9 * M * M),
            bytes_accessed=(2 * B * H * W * C) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, x, *flat)


def fused_identity_bottleneck(
    x, w1, b1, w2, b2, w3, b3, interpret=False, row_tile=16):
    """Single fused identity bottleneck (chain of one)."""
    return fused_bottleneck_chain(
        x, ((w1, b1, w2, b2, w3, b3),), interpret=interpret,
        row_tile=row_tile)
