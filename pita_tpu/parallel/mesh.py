"""Device-mesh utilities.

Reference parity: §2.9 of the survey — the reference's two distribution
mechanisms are Lightning DDP (NCCL data parallelism, configs/trainer/ddp.yaml)
and hand-rolled chain sharding with a per-step ``all_gather``
(sde_integration.py:214-258). The TPU-native replacements:

- ``dp`` axis: training batches sharded over devices; XLA inserts the gradient
  ``psum`` from the sharding annotations (no DDP wrapper, no NCCL).
- ``chains`` axis: SDE chains sharded over devices; the global systematic
  resample gathers *log-weights only* (B floats) and every device computes the
  identical ancestor choice from a shared PRNG key, then the chain exchange is
  one collective gather over ICI — instead of the reference's replicate-
  everything-every-step ``all_gather``.
"""

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "chains") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (axis_name,))


def chain_sharding(mesh: Mesh, axis_name: Optional[str] = None) -> NamedSharding:
    """Shard the leading (chain/batch) dimension over the mesh."""
    axis_name = axis_name or mesh.axis_names[0]
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
