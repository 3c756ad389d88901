"""Shared dataset containers (reference: the `Data` class in each dataset file)."""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Split:
    """One data split: observations (N, T, D) and times (T,), float32 on host.

    Mirrors `src/datasets/vanderpol.py:8-17` et al. Device placement happens
    at the jit boundary; data generation and preprocessing stay host-side.
    """

    ys: np.ndarray
    ts: np.ndarray

    def __post_init__(self):
        self.ys = np.asarray(self.ys, dtype=np.float32)
        self.ts = np.asarray(self.ts, dtype=np.float32)

    def __len__(self) -> int:
        return self.ys.shape[0]

    def __getitem__(self, index):
        return self.ys[index, ...], self.ts
