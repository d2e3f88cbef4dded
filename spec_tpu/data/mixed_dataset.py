"""Ratio-weighted mixture over CamDatasets.

Rebuild of reference ``spec/dataset/mixed_cam_dataset.py:31-90``: dataset
names + ratios parsed from ``'ds1_ds2_r1_r2'`` strings; in-the-wild ratios
re-normalized by dataset size; a sample draws a dataset by cumulative ratio
then indexes modulo its length; len = max member length.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def parse_datasets_ratios(spec: str):
    """``'ds-a_ds-b_0.3_0.7' -> (['ds-a','ds-b'], [0.3, 0.7])`` (the pare
    ``parse_datasets_ratios`` helper; import site reference
    mixed_cam_dataset.py:24,34)."""
    parts = spec.split('_')
    half = len(parts) // 2
    names = parts[:half]
    ratios = [float(r) for r in parts[half:]]
    assert len(names) == len(ratios), f'bad datasets_and_ratios: {spec}'
    return names, ratios


class MixedCamDataset:
    """Samples from member datasets with fixed probabilities."""

    def __init__(self, datasets: Sequence, ratios: Sequence[float],
                 itw_names: Sequence[str] = ('mpii', 'coco', 'lspet'),
                 seed: int = 0):
        assert len(datasets) == len(ratios)
        self.datasets = list(datasets)
        lengths = np.array([len(d) for d in datasets], np.float64)
        ratios = np.array(ratios, np.float64)

        # Reference :70-76 — in-the-wild members get their ratio scaled by
        # relative size so small itw sets aren't oversampled.
        names = [getattr(d, 'dataset', '') for d in datasets]
        itw_idx = [i for i, nm in enumerate(names) if nm in itw_names]
        if itw_idx:
            itw_total = lengths[itw_idx].sum()
            for i in itw_idx:
                ratios[i] = ratios[i] * lengths[i] / itw_total

        self.partition = np.cumsum(ratios / ratios.sum())
        self.lengths = lengths.astype(np.int64)
        self.length = int(lengths.max())
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return self.length

    def __getitem__(self, index):
        p = self.rng.rand()
        for i in range(len(self.datasets)):
            if p <= self.partition[i]:
                return self.datasets[i][index % self.lengths[i]]
        return self.datasets[-1][index % self.lengths[-1]]
