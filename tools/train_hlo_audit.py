"""HLO-level audit of the SPEC training step (the r2 inference audit's
sibling — CLAUDE.md 'HLO-level audit of the fused pipeline').

Compiles the exact bench.py --mode train graph (B=128 224^2 bf16 trunk,
donated state) through the persistent cache and reports a BANDWIDTH
proxy: result bytes per opcode and the largest single instructions.
The step is HBM-bound like the rest of this model family, so bytes
moved per op class is the attribution that matters; conv dtype mix is
printed to catch f32 epilogues sneaking onto the conv path (CLAUDE.md).

Usage: python tools/train_hlo_audit.py [--batch 128] [--backbone resnet50]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

os.makedirs('/root/repo/.jax_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

_DTYPE_BYTES = {'pred': 1, 's8': 1, 'u8': 1, 'bf16': 2, 'f16': 2,
                's16': 2, 'u16': 2, 'f32': 4, 's32': 4, 'u32': 4,
                'f64': 8, 's64': 8, 'u64': 8}

# `%name = bf16[128,56,56,256]{3,2,1,0:T(8,128)(2,1)} opcode(...)`
_INSTR = re.compile(
    r'^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*'
    r'(?:\()?([a-z]+\d*)\[([\d,]*)\][^\s]*\s+'
    r'([a-z][\w\-]*)\(')


def _bytes(dtype: str, dims: str) -> float:
    n = 1
    for d in dims.split(','):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dtype, 4)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=128)
    p.add_argument('--backbone', type=str, default='resnet50')
    p.add_argument('--top', type=int, default=20)
    args = p.parse_args()

    import bench

    ge, rng, ex, state, raw_step = bench._train_setup(
        args.batch, args.backbone)
    batch = ge._example_batch(args.batch, rng, ex)

    from functools import partial

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, key):
        new_state, losses = raw_step(state, batch, key)
        total = losses['loss/total_loss']
        key = key + (total * 1e-30).astype(key.dtype)
        return new_state, total, key

    key = jax.random.PRNGKey(1)
    compiled = step.lower(state, batch, key).compile()
    txt = compiled.as_text()

    # Only ENTRY-computation results materialize to HBM: instructions
    # inside a fusion body are registers/VMEM, so counting them wildly
    # overstates traffic. In the entry computation a fused op appears as
    # one `fusion(...)` instruction whose result (plus operands, not
    # counted here) is the real HBM movement.
    by_op = defaultdict(float)          # opcode -> result bytes
    conv_dtypes = defaultdict(int)      # conv result dtype -> count
    biggest: list = []                  # (bytes, line head)
    in_entry = False
    for line in txt.splitlines():
        if line.startswith('ENTRY '):
            in_entry = True
            continue
        if in_entry and line.startswith('}'):
            in_entry = False
        m = _INSTR.match(line)
        if not m:
            continue
        dtype, dims, op = m.groups()
        if op == 'convolution':
            conv_dtypes[dtype] += 1   # counted everywhere (dtype mix)
        if not in_entry:
            continue
        b = _bytes(dtype, dims)
        by_op[op] += b
        if b > 50 * 2**20:   # list individual >50 MiB results
            biggest.append((b, line.strip()[:110]))

    total = sum(by_op.values()) or 1.0
    print(f'== SPEC train step HLO audit (B={args.batch}, '
          f'{args.backbone}) — ENTRY result-bytes per opcode (HBM '
          f'materialization proxy) ==')
    for op, b in sorted(by_op.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f'{op:28s} {b / 2**30:8.2f} GiB  ({100.0 * b / total:5.1f}%)')

    print(f'\nconvolutions by result dtype: {dict(conv_dtypes)}')
    print('(f32-result convs materialize full-size f32 copies — keep '
          'epilogues in bf16, CLAUDE.md)')

    print(f'\nindividual results > 50 MiB: {len(biggest)}')
    for b, head in sorted(biggest, key=lambda t: -t[0])[:12]:
        print(f'  {b / 2**20:8.1f} MiB  {head}')

    mem = compiled.memory_analysis()
    if mem is not None:
        print(f'\nmemory: temp '
              f'{getattr(mem, "temp_size_in_bytes", 0) / 2**30:.2f} GiB, '
              f'args '
              f'{getattr(mem, "argument_size_in_bytes", 0) / 2**30:.2f} '
              f'GiB, out '
              f'{getattr(mem, "output_size_in_bytes", 0) / 2**30:.2f} GiB')
    ca = None
    try:
        ca = compiled.cost_analysis()
    except Exception:
        pass
    if ca:
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = ca.get('flops', 0.0)
        print(f'whole-program cost_analysis: {flops / 1e12:.2f} TFLOP, '
              f'bytes accessed '
              f'{ca.get("bytes accessed", 0.0) / 2**30:.2f} GiB')


if __name__ == '__main__':
    main()
