"""Device-mesh sharding for fusion volumes and data-parallel training.

The reference's only parallelism is Keras graph-replication DP
(``Mask_RCNN/mrcnn/parallel_model.py:54-102``: CPU-side input split,
per-GPU towers, CPU-side concat). TPU-native replacement (SURVEY §2.5):

* **Data parallel**: one jitted train step with the batch sharded over the
  mesh's ``data`` axis and parameters replicated — XLA inserts the gradient
  all-reduce over ICI; there is no host-side split/merge.
* **Volume sharding** (SURVEY §5.7 — the scale axis of this workload): the
  TSDF state shards along the volume's x axis (dense state) or the block
  axis (blocked state). The fusion update is voxel-local with the frame
  tables replicated, so fusing runs collective-free; renders/probes that
  read across shards let XLA insert the gathers.

At 512^3 x 32 bins the histogram alone is 17 GB in u32 (2.15 GB at 256^3,
reference ``tsdf.cu:249-250``) — past a single v5e's HBM; u16 + sharding
makes 512^3 feasible (SURVEY §5.7 options (a)+(b) both implemented).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first n devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def data_parallel_sharding(mesh: Mesh, axis: str = "data"):
    """(batch_sharding, replicated) pair for jit in_shardings."""
    return NamedSharding(mesh, P(axis)), NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Place every array in the batch with its leading dim sharded."""
    sh = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def shard_params(params, mesh: Mesh):
    """Replicate a parameter pytree across the mesh."""
    rep = NamedSharding(mesh, P())
    return jax.device_put(params, rep)


def shard_volume_state(state, mesh: Mesh, axis: str = "data"):
    """Shard a TSDFState (dense, on volume-x) or BlockedTSDFState (on the
    block axis) across the mesh; scalars/metadata replicated."""
    from slam_maskrcnn_tpu.fusion.state import TSDFState

    big = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def place(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 3 and leaf.shape[0] >= mesh.size:
            return jax.device_put(leaf, big)
        return jax.device_put(leaf, rep)

    return jax.tree.map(place, state)
