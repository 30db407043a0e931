"""Device-mesh runtime: the TPU-native replacement for the reference's
MPI/NCCL distributed layer (trainer/utils/mpi_adapter.py, utils/distributed.py).

Instead of MPI rendezvous + DistributedDataParallel, we build one
``jax.sharding.Mesh`` over all devices with named axes and let pjit/XLA
insert the collectives. Axis conventions:

- ``data``  : batch (data parallelism; grad sync = compiler-inserted psum)
- ``model`` : tensor parallelism for wide matmuls (LLM, decoder FFNs)

The reference's explicit collectives map as: DDP grad all-reduce -> psum on
``data``; contrastive-loss all_gather (modeling/language/loss.py:34-40) ->
``jax.lax.all_gather`` on ``data``; evaluator object gathers -> host-side
``jax.experimental.multihost_utils.process_allgather``.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    data: int = -1  # -1: all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = max(1, self.model)
        data = self.data if self.data > 0 else n_devices // model
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} does not cover {n_devices} devices"
            )
        return data, model


def maybe_init_distributed() -> None:
    """Initialize multi-host JAX if launched under a cluster scheduler.

    Replaces the reference MPIAdapter (trainer/utils/mpi_adapter.py:11-131):
    JAX's coordination service handles rendezvous and teardown, so there is
    no MPI-abort hook equivalent needed.
    """
    if "JAX_COORDINATOR_ADDRESS" in os.environ and jax.process_count() == 1:
        jax.distributed.initialize()


def create_mesh(spec: MeshSpec | None = None, devices=None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    spec = spec or MeshSpec()
    data, model = spec.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
