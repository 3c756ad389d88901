"""Dataset tests: simulators, MoCap PCA pipeline, projector round trips."""

import numpy as np
import pytest

from gpode_tpu.data.fhn import FHN, load_fhn_interpolation
from gpode_tpu.data.mocap import MocapDataset, latent_to_data_projector
from gpode_tpu.data.vanderpol import VanderPol, VanderPolNonUniform
from gpode_tpu.models.likelihoods import project

import jax.numpy as jnp


def test_vdp_shapes_and_determinism():
    d1 = VanderPol(s_train=25, t_train=7.0, s_test=50, t_test=14.28,
                   noise_var=0.05)
    d2 = VanderPol(s_train=25, t_train=7.0, s_test=50, t_test=14.28,
                   noise_var=0.05)
    assert d1.trn.ys.shape == (1, 25, 2)
    assert d1.tst.ys.shape == (1, 50, 2)
    assert d1.tst_new_x0.ys.shape == (100, 25, 2)
    np.testing.assert_array_equal(d1.trn.ys, d2.trn.ys)  # fixed seeds
    # train = noisy version of the underlying clean trajectory
    assert 0.01 < np.var(d1.trn.ys - d1.tst.ys[:, :25]) < 0.2


def test_vdp_nonuniform_times_sorted():
    d = VanderPolNonUniform(s_train=20, t_train=7.0)
    assert d.trn.ts[0] == 0.0
    assert np.all(np.diff(d.trn.ts) > 0)
    assert np.all(d.tst.ts >= 7.0 - 1e-6)


def test_fhn_shapes():
    d = FHN(s_train=20, t_train=6.0, noise_var=0.01)
    assert d.trn.ys.shape == (1, 20, 2)
    assert d.tst.ys.shape == (1, 40, 2)  # 2x default test horizon
    data = load_fhn_interpolation("data/fhn")
    assert data["train_ys"].shape[-1] == 2
    assert "interpolation_mask" in data


def test_mocap_loading_and_pca():
    full = MocapDataset(data_path="data/mocap", subject="09",
                        pca_components=-1, pca_normalize=False, seqlen=100)
    assert full.trn.ys.shape == (6, 100, 50)
    assert full.val.ys.shape[0] == 2 and full.tst.ys.shape[0] == 2
    # zeroed sensors clamped
    assert np.allclose(full.trn.ys[:, :, [24, 25, 31, 32]], 1e-6)

    pca = MocapDataset(data_path="data/mocap", subject="09",
                       pca_components=5, pca_normalize=True, seqlen=100)
    assert pca.trn.ys.shape == (6, 100, 5)
    # pca_normalize: train latents standardized
    flat = pca.trn.ys.reshape(-1, 5)
    np.testing.assert_allclose(flat.mean(0), 0.0, atol=0.3)
    np.testing.assert_allclose(flat.std(0), 1.0, atol=0.3)


def test_projector_matches_pipeline_inverse():
    """projector(latents) must reproduce the centered data reconstruction:
    the reference's projector omits the PCA mean (`mocap_utils.py:29`), so
    compare against (data - pca_mean) reconstructed from top components."""
    pca = MocapDataset(data_path="data/mocap", subject="09",
                       pca_components=5, pca_normalize=True, seqlen=50)
    full = MocapDataset(data_path="data/mocap", subject="09",
                        pca_components=-1, pca_normalize=False, seqlen=50)
    proj = latent_to_data_projector(pca)
    recon = np.asarray(project(proj, jnp.asarray(pca.trn.ys)))
    centered = full.trn.ys - pca.pca.mean_
    # 5 PCA components on 50-D mocap capture most variance
    rel_err = np.linalg.norm(recon - centered) / np.linalg.norm(centered)
    assert rel_err < 0.5
    # exact on the projected subspace
    proj_centered = (centered.reshape(-1, 50) @ pca.pca.components_.T
                     ) @ pca.pca.components_
    np.testing.assert_allclose(recon.reshape(-1, 50), proj_centered,
                               rtol=1e-3, atol=1e-3)


def test_mocap_subjects_35_39_load():
    for subject, n_train in (("35", 16), ("39", 6)):
        d = MocapDataset(data_path="data/mocap", subject=subject,
                         pca_components=3, seqlen=30)
        assert d.trn.ys.shape[0] == n_train
        assert d.trn.ys.shape[1:] == (30, 3)


def test_bad_subject_rejected():
    with pytest.raises(ValueError):
        MocapDataset(data_path="data/mocap", subject="99")


def test_host_pca_matches_sklearn_exactly():
    # incl. the U-based svd_flip sign convention sklearn's PCA applies —
    # latents must match the reference pipeline exactly, not just up to sign
    sklearn = pytest.importorskip("sklearn.decomposition")
    from gpode_tpu.data.mocap import PCA
    rng = np.random.RandomState(3)
    x = rng.randn(40, 12) @ rng.randn(12, 12)  # correlated features
    ours = PCA(5)
    z_ours = ours.fit_transform(x)
    ref = sklearn.PCA(n_components=5, svd_solver="full")
    z_ref = ref.fit_transform(x)
    np.testing.assert_allclose(ours.components_, ref.components_,
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(z_ours, z_ref, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(ours.transform(x[:7]), ref.transform(x[:7]),
                               rtol=1e-7, atol=1e-9)


def test_split_iteration_protocol():
    """The reference `Data` protocol (`src/datasets/vanderpol.py:8-17`):
    len() = number of sequences, data[i] -> (ys_i, ts); CombinedDataset pairs
    the data-space and PCA-space views (`src/misc/mocap_utils.py:37-47`)."""
    from gpode_tpu.data.common import Split
    ys = np.arange(24, dtype=np.float32).reshape(3, 4, 2)
    ts = np.linspace(0.0, 1.0, 4).astype(np.float32)
    split = Split(ys, ts)
    assert len(split) == 3
    y0, t0 = split[1]
    np.testing.assert_array_equal(y0, ys[1])
    np.testing.assert_array_equal(t0, ts)
    # iterable like the reference Data
    seqs = [y for y, _ in split]
    assert len(seqs) == 3
