"""Regenerate tests/goldens.json (frozen numeric goldens).

Run this ONLY after an intentional numeric change, and justify the diff
in the commit message. See tests/test_goldens.py for what each golden
freezes.

Usage: python tools/make_goldens.py
"""

import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tests'))


def main():
    import jax

    # Goldens are CPU numbers (the test suite runs on the forced CPU
    # mesh; TPU bf16 matmul defaults would not reproduce them).
    jax.config.update('jax_platforms', 'cpu')

    import test_goldens as tg

    with tempfile.TemporaryDirectory() as d:
        goldens = tg.compute_all_goldens(d)
    with open(tg.GOLDENS_PATH, 'w') as f:
        json.dump(goldens, f, indent=2, sort_keys=True)
    print(f'wrote {tg.GOLDENS_PATH}')
    print(json.dumps(goldens, indent=2, sort_keys=True)[:2000])


if __name__ == '__main__':
    main()
