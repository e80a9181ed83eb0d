"""Device mesh helpers.

The reference scales by running more worker containers against Kafka/HBase
(reference: cufacesearch/updater/extraction_processor.py DaemonBatchExtractor
process pools); the TPU-native counterpart is a ``jax.sharding.Mesh`` over
which training is data-parallel (GSPMD-inserted psums over ICI) and the code
index is row-sharded with an explicit shard_map top-k merge.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from columbiaimagesearch_tpu.utils.chunking import round_up

DATA_AXIS = "dp"
SHARD_AXIS = "shard"


def make_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_rows(mesh: Mesh, x, axis_name: str | None = None, pad_value=0.0):
    """Pad the leading dim to the mesh size and shard it across the mesh.

    :returns: (sharded device array, original row count)
    """
    axis_name = axis_name or mesh.axis_names[0]
    n_dev = mesh.devices.size
    x = np.asarray(x)
    n = x.shape[0]
    target = round_up(max(n, 1), n_dev)
    if target != n:
        pad = [(0, target - n)] + [(0, 0)] * (x.ndim - 1)
        x = np.pad(x, pad, constant_values=pad_value)
    spec = P(axis_name, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec)), n
