"""Device-mesh construction for the sharded trainer.

The reference is single-GPU, single-process (SURVEY.md §2.7 — its only
"multi-GPU" is shell scripts pinning independent scenes to devices). The
TPU-native design replaces that with SPMD over a ``jax.sharding.Mesh`` with
axes ('data', 'model'):

  data  — cameras of the per-step micro-batch (the reference renders its
          batch sequentially in Python, train.py:197-209)
  model — horizontal slabs of image tile rows (the SP/CP analog for
          splatting; see fourdgs_tpu.parallel.trainer)

Multi-host meshes (DCN × ICI) are built by fourdgs_tpu.parallel.multihost.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_data: int = 1, n_model: int = 1, devices=None) -> Mesh:
    """A single-process ('data','model') mesh over the first n_data*n_model
    local devices."""
    devices = devices if devices is not None else jax.devices()
    need = n_data * n_model
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    dev = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def parse_mesh_arg(spec: str) -> dict[str, int]:
    """Parse a CLI mesh spec like ``data=2,model=4`` into axis sizes.

    Unknown axis names are rejected; omitted axes default to 1.
    """
    sizes = {"data": 1, "model": 1}
    for part in filter(None, (p.strip() for p in spec.split(","))):
        name, _, val = part.partition("=")
        if name not in sizes or not val:
            raise ValueError(
                f"bad mesh spec {spec!r}: expected e.g. 'data=2,model=4'"
            )
        sizes[name] = int(val)
        if sizes[name] < 1:
            raise ValueError(f"mesh axis {name} must be >= 1")
    return sizes
