"""HLO-level audit of the SPEC training step (the r2 inference audit's
sibling — CLAUDE.md 'HLO-level audit of the fused pipeline').

Compiles the exact bench.py --mode train graph (B=128 224^2 bf16 trunk,
donated state) through the persistent cache and reports XLA's own cost
model per fusion, bucketed by op kind, so the ~50 ms step's budget is
attributable: conv fwd vs conv bwd vs BN-stat chains vs Adam vs the GT
LBS + loss tail. Run on the real chip (the cost table is the compiled
TPU executable's); costs print even when the cached executable is hit.

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


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=128)
    p.add_argument('--backbone', type=str, default='resnet50')
    p.add_argument('--top', type=int, default=25)
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

    # XLA cost comments: fused ops carry metadata like
    #   metadata={... } backend_config=... or cost annotations in the
    # optimized HLO as e.g. `// cost: ...`. Portable fallback: estimate
    # per-instruction relative weight from the instruction mix.
    costs = defaultdict(float)
    cost_re = re.compile(
        r'^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*[\w\[\]{}, ]+\s+'
        r'(\w[\w\-]*)\(')
    # Prefer explicit flop/cost annotations when present.
    ann = re.findall(r'(\w[\w\-]*)\([^\n]*?//\s*cost:\s*([\d.e+]+)', txt)
    if ann:
        for op, c in ann:
            costs[op] += float(c)
        label = 'XLA cost annotations'
    else:
        for line in txt.splitlines():
            m = cost_re.match(line)
            if m:
                costs[m.group(2)] += 1.0
        label = 'instruction counts (no cost annotations in this HLO)'

    total = sum(costs.values()) or 1.0
    print(f'== SPEC train step HLO audit (B={args.batch}, '
          f'{args.backbone}) — {label} ==')
    for op, c in sorted(costs.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f'{op:40s} {c:12.0f}  ({100.0 * c / total:5.1f}%)')

    # Big-fusion listing: the N largest fusion computations by body size
    # (a cheap proxy for runtime when cost annotations are absent).
    fusions = re.findall(r'%fused_computation[\w.]*', txt)
    print(f'\nfusions: {len(set(fusions))} distinct, '
          f'{txt.count("kLoop")} loop / {txt.count("kInput")} input / '
          f'{txt.count("kOutput")} output')
    convs = len(re.findall(r'= [\w\[\]{}, ]+ convolution\(', txt))
    print(f'convolutions in optimized HLO: {convs}')
    n_f32_conv = len(re.findall(r'= f32\[[^\]]*\]\s*convolution\(', txt))
    print(f'  of which f32-output: {n_f32_conv} '
          '(fp32 conv epilogues materialize full-size f32 copies — '
          'CLAUDE.md)')
    mem = compiled.memory_analysis()
    if mem is not None:
        gb = getattr(mem, 'temp_size_in_bytes', 0) / 2**30
        arg = getattr(mem, 'argument_size_in_bytes', 0) / 2**30
        out = getattr(mem, 'output_size_in_bytes', 0) / 2**30
        print(f'memory: temp {gb:.2f} GiB, args {arg:.2f} GiB, '
              f'out {out:.2f} GiB')


if __name__ == '__main__':
    main()
