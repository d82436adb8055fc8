"""Device mesh construction.

Axes (SURVEY §2.3):
- ``data``  — primary axis: replay batch + env streams sharded, gradients
  psum over ICI (the reference has NO distributed machinery; this is the
  build obligation replacing torch.distributed/NCCL).
- ``model`` — reserved tensor-parallel axis for the larger-VAE/drone configs
  (BASELINE configs 3-5): large Dense/GRU kernels shard their output column
  dimension here.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh;
``mesh_utils.create_device_mesh`` lays out ICI-adjacent devices along the
fastest-varying axis so data-parallel collectives ride ICI, not DCN.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh.  Defaults to all visible devices on the
    data axis."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices")
    grid = mesh_utils.create_device_mesh((n_data, n_model),
                                         devices=devices[: n_data * n_model])
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
