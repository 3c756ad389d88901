"""CMU MoCap dataset: 50-D sensor sequences with a host-side PCA pipeline.

Rebuilds `src/datasets/mocap.py:30-101` + `src/misc/mocap_utils.py:12-34`:
subjects 09/35/39 from `data/mocap/mocap{subject}.npz`, zeroed-sensor columns
clamped, optional data normalization, PCA to `pca_components` latents fit on
train only, optional PCA-space normalization, and the latent-to-data
projector used inside the projected likelihood.

PCA runs as a host-side SVD at data-prep time (the reference used sklearn);
the projector becomes a `Projector` pytree of constants that lives inside the
jitted loss.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from gpode_tpu.data.common import Split
from gpode_tpu.models.likelihoods import Projector

_ZEROED_SENSORS = (24, 25, 31, 32)  # always-zero columns (`mocap.py:88-90`)


class Normalize:
    """Standardization with stored moments (`mocap.py:6-15`)."""

    def __init__(self, mean: np.ndarray, std: np.ndarray):
        self.mean = mean
        self.std = std

    def __call__(self, x):
        return (x - self.mean) / self.std

    def inverse(self, x):
        return x * self.std + self.mean


class PCA:
    """Minimal host-side PCA via SVD (replaces sklearn, `mocap.py:92-99`).

    Matches sklearn's convention: `transform(x) = (x - mean) @ components.T`.
    """

    def __init__(self, n_components: int):
        self.n_components = n_components
        self.mean_: Optional[np.ndarray] = None
        self.components_: Optional[np.ndarray] = None

    def fit_transform(self, x: np.ndarray) -> np.ndarray:
        self.mean_ = x.mean(axis=0)
        xc = x - self.mean_
        _, _, vt = np.linalg.svd(xc, full_matrices=False)
        # sklearn's svd_flip with u_based_decision=False — what
        # sklearn.decomposition.PCA applies (all solvers since v1.5): the
        # largest-|value| entry of each ROW of Vt decides the sign, so
        # latents match the reference's sklearn pipeline exactly, not just
        # up to sign (pinned against sklearn in tests/test_data.py)
        max_idx = np.argmax(np.abs(vt), axis=1)
        signs = np.sign(vt[np.arange(vt.shape[0]), max_idx])
        vt = vt * signs[:, None]
        self.components_ = vt[: self.n_components]
        return xc @ self.components_.T

    def transform(self, x: np.ndarray) -> np.ndarray:
        return (x - self.mean_) @ self.components_.T


class MocapDataset:
    """MoCap splits in data space (pca_components=-1) or PCA latent space."""

    def __init__(self, data_path: str = "data/mocap", subject: str = "09",
                 dt: float = 0.01, pca_components: int = -1, seqlen: int = 50,
                 data_normalize: bool = False, pca_normalize: bool = True):
        if subject not in ("09", "35", "39"):
            raise ValueError("Wrong subject passed")
        self.data_path = data_path
        self.dt = dt
        self.pca_components = pca_components

        with np.load(os.path.join(data_path, f"mocap{subject}.npz")) as d:
            xs_train = np.array(d["train"])
            xs_valid = np.array(d["validation"])
            xs_test = np.array(d["test"])

        ts_train = dt * np.arange(xs_train.shape[1])
        ts_valid = dt * np.arange(xs_valid.shape[1])
        ts_test = dt * np.arange(xs_test.shape[1])

        for xs in (xs_train, xs_valid, xs_test):
            xs[:, :, _ZEROED_SENSORS] = 1e-6

        self.data_mean = xs_train.mean((0, 1), keepdims=True)
        self.data_std = xs_train.std((0, 1), keepdims=True) + 1e-5
        if data_normalize:
            self.data_normalize = Normalize(self.data_mean, self.data_std)
            xs_train = self.data_normalize(xs_train)
            xs_valid = self.data_normalize(xs_valid)
            xs_test = self.data_normalize(xs_test)
        else:
            self.data_normalize = None

        self.pca: Optional[PCA] = None
        if pca_components > 0:
            self.pca = PCA(pca_components)
            xs_train = self._apply_pca(xs_train, train=True)
            xs_valid = self._apply_pca(xs_valid, train=False)
            xs_test = self._apply_pca(xs_test, train=False)

        if pca_normalize:
            pca_m = xs_train.mean((0, 1), keepdims=True)
            pca_s = xs_train.std((0, 1), keepdims=True) + 1e-5
            self.pca_normalize = Normalize(pca_m, pca_s)
            xs_train = self.pca_normalize(xs_train)
            xs_valid = self.pca_normalize(xs_valid)
            xs_test = self.pca_normalize(xs_test)
        else:
            self.pca_normalize = None

        self.trn = Split(ys=xs_train[:, :seqlen], ts=ts_train[:seqlen])
        self.val = Split(ys=xs_valid, ts=ts_valid)
        self.tst = Split(ys=xs_test, ts=ts_test)

    def _apply_pca(self, x: np.ndarray, train: bool) -> np.ndarray:
        n, t, _ = x.shape
        flat = x.reshape(n * t, -1)
        out = self.pca.fit_transform(flat) if train else self.pca.transform(flat)
        return out.reshape(n, t, -1)


def latent_to_data_projector(dataset: MocapDataset) -> Projector:
    """Build the latent->data `Projector` pytree from a PCA-space dataset
    (the reference's `Latent2DataProjector`, `mocap_utils.py:12-34`)."""
    if dataset.pca is None:
        raise ValueError("projector requires a PCA-space dataset (pca_components > 0)")
    if dataset.pca_normalize is not None:
        norm_mean = np.asarray(dataset.pca_normalize.mean, dtype=np.float32)
        norm_std = np.asarray(dataset.pca_normalize.std, dtype=np.float32)
    else:
        norm_mean = norm_std = None
    return Projector(components=np.asarray(dataset.pca.components_, dtype=np.float32),
                     norm_mean=norm_mean, norm_std=norm_std)


class CombinedDataset:
    """Pairs the data-space and PCA-space views of the same split for
    iteration (`src/misc/mocap_utils.py:37-47`)."""

    def __init__(self, data_pca: "MocapDataset", data_full: "MocapDataset"):
        self.data_pca = data_pca
        self.data_full = data_full

    def __len__(self) -> int:
        return self.data_pca.trn.ys.shape[0]

    def __getitem__(self, index):
        return (self.data_full.trn.ys[index, ...],
                self.data_pca.trn.ys[index, ...], self.data_pca.trn.ts)
