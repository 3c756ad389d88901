"""Datasets: simulated 2-D systems (Van der Pol, FitzHugh-Nagumo) and CMU MoCap."""

from gpode_tpu.data.common import Split  # noqa: F401
