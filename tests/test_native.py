"""Native host library tests: k-means and RK45 vs scipy references."""

import numpy as np
import pytest
from scipy.integrate import odeint as scipy_odeint

from gpode_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_kmeans_recovers_separated_clusters():
    rng = np.random.default_rng(0)
    true_centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    data = np.concatenate([
        c + 0.3 * rng.normal(size=(200, 2)) for c in true_centers]).astype(np.float32)
    centers = native.kmeans(data, 3, seed=1)
    # each true center matched by some found center
    for c in true_centers:
        dists = np.linalg.norm(centers - c, axis=1)
        assert dists.min() < 0.2


def test_kmeans_requires_enough_points():
    with pytest.raises(ValueError):
        native.kmeans(np.zeros((2, 2), np.float32), 5)


def test_native_vdp_matches_scipy():
    def vdp(y, t, mu=0.5):
        return [y[1], -y[0] + mu * y[1] * (1 - y[0] ** 2)]

    ts = np.linspace(0, 7.0, 25)
    want = scipy_odeint(vdp, [-1.5, 2.5], ts, rtol=1e-12, atol=1e-12)
    got = native.integrate("vdp", np.array([-1.5, 2.5]), ts, params=(0.5,))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_native_fhn_matches_scipy():
    def fhn(y, t):
        return [3.0 * (y[0] - y[0] ** 3 / 3 + y[1]),
                (0.2 - 3.0 * y[0] - 0.2 * y[1]) / 3.0]

    ts = np.linspace(0, 6.0, 30)
    want = scipy_odeint(fhn, [-1.0, -1.0], ts, rtol=1e-12, atol=1e-12)
    got = native.integrate("fhn", np.array([-1.0, -1.0]), ts)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_native_callback_rhs():
    ts = np.linspace(0.0, 1.0, 5)
    got = native.integrate_callback(lambda t, y: -y, np.array([1.0, 2.0]), ts)
    want = np.stack([np.exp(-ts), 2 * np.exp(-ts)], axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-8)
