"""Multi-chip scaling: meshes, shardings, and sharded training steps."""

from gpode_tpu.parallel.mesh import make_mesh  # noqa: F401
