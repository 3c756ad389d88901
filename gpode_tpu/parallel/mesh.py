"""Device meshes and sharding layouts for GPODE training.

The reference is single-device (`src/misc/settings.py:19`); this module is the
deliberate TPU-native scale-out path (SURVEY.md §2.3). The model's parallel
axes are:

  * `dp`  — data parallelism over sequences (the N axis),
  * `mc`  — Monte-Carlo parallelism over reparameterized state samples /
            posterior function draws (the S axis),

and, implicitly, the shooting-segment axis (T) which rides inside the
flattened (S·N·T) integration batch: sharding S and N shards the segment
batch with zero collectives inside the ODE loop. Parameters are replicated;
the only cross-chip traffic is the all-reduce of ELBO means/sums and of
gradients, which XLA inserts automatically from the sharding annotations —
collectives ride ICI, never the host.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def parse_mesh_spec(spec: str) -> dict:
    """Parse a CLI mesh spec like 'dp=2,mc=4' into ordered {axis: size}.

    One size may be -1 to infer from the device count (`make_mesh`). This is
    the user-facing entry to multi-chip training: the shooting drivers and
    bench.py accept `--mesh dp=2,mc=4` and train SPMD over the mesh.
    """
    axis_sizes = {}
    for part in spec.split(","):
        if "=" not in part:
            raise ValueError(f"bad mesh spec {spec!r}: expected 'axis=size' "
                             f"entries separated by commas, got {part!r}")
        name, _, size = part.partition("=")
        axis_sizes[name.strip()] = int(size)
    return axis_sizes


def make_mesh(axis_sizes: Optional[dict] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh; default: all devices on one `dp` axis.

    axis_sizes: ordered {axis_name: size}; sizes must multiply to the device
    count (one size may be -1 to infer).
    """
    devices = jax.devices() if devices is None else list(devices)
    if axis_sizes is None:
        axis_sizes = {"dp": len(devices)}
    names = tuple(axis_sizes.keys())
    sizes = list(axis_sizes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total != len(devices):
        raise ValueError(f"mesh {dict(zip(names, sizes))} != {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (sequence) axis of (N, T, D) data."""
    return NamedSharding(mesh, P(axis))


def sample_sharding(mesh: Mesh) -> NamedSharding:
    """Shard shooting-state samples (S, N, T, D): S over `mc`, N over `dp`
    (when those axes exist in the mesh)."""
    names = mesh.axis_names
    s_axis = "mc" if "mc" in names else None
    n_axis = "dp" if "dp" in names else None
    return NamedSharding(mesh, P(s_axis, n_axis))
