"""Multi-host (multi-process) mesh support: ICI/DCN scale-out.

SURVEY.md §2.3 names "JAX collectives over ICI/DCN (`jax.distributed` + pjit
meshes)" as this rebuild's distributed backend; `parallel/mesh.py` covers the
single-host (ICI) case and this module adds the cross-process (DCN) wiring
(VERDICT r4 item 4 / missing #1). The design point is unchanged: parameters
and optimizer state replicate, sequences shard over `dp` and MC draws over
`mc`, and the only cross-device traffic is the gradient/ELBO all-reduce XLA
inserts from the sharding annotations — on a multi-host mesh those
collectives ride ICI within a host and DCN across hosts, never the Python
layer.

Usage (one call per process, before any other JAX API):

    from gpode_tpu.parallel import multihost
    multihost.initialize("10.0.0.1:8476", num_processes=4, process_id=rank)
    mesh = make_mesh({"dp": -1})          # global devices across processes

then build global arrays with :func:`global_put` (every process holds the
same host value — true for replicated params and for the small datasets this
framework trains on) and run the usual sharded step
(`parallel.train.make_sharded_shooting_step`): jit is SPMD across processes.

Tested with a real 2-process CPU cluster in tests/test_multihost.py and
driven by `__graft_entry__.dryrun_multichip` (cross-process phase).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import NamedSharding


def initialize(coordinator_address: str, num_processes: int, process_id: int,
               local_device_count: Optional[int] = None) -> None:
    """`jax.distributed.initialize` wrapper: start/join the cluster.

    Must run before the backend initializes (i.e. before any jax op). On TPU
    pods the three arguments are normally auto-detected from the environment
    and may be None; for CPU/GPU clusters (and the 2-process CPU test) they
    are explicit. `local_device_count` documents how many local devices this
    process contributes — on CPU clusters that is set via
    `--xla_force_host_platform_device_count` in XLA_FLAGS (jax's own
    distributed API discovers it from the backend)."""
    del local_device_count  # discovered from the backend (see docstring)
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_array(value, sharding: NamedSharding) -> jax.Array:
    """Build a GLOBAL jax.Array spanning all processes from a host value
    every process holds in full.

    `jax.device_put` refuses shardings with non-addressable devices; the
    multi-process path is `make_array_from_callback`, where each process
    materializes only its addressable shards (the callback receives global
    index tuples). Replicated leaves (params, opt state, ts) and
    dp/mc-sharded batches both go through here."""
    value = np.asarray(value)
    return jax.make_array_from_callback(value.shape, sharding,
                                        lambda idx: value[idx])


def global_put(tree: Any, sharding: NamedSharding) -> Any:
    """`global_array` over a pytree (one sharding for every leaf)."""
    return jax.tree_util.tree_map(lambda l: global_array(l, sharding), tree)


def fetch_replicated(x: jax.Array) -> np.ndarray:
    """Host value of a replicated global array (reads the first addressable
    shard — every shard is identical by construction)."""
    return np.asarray(x.addressable_data(0))
