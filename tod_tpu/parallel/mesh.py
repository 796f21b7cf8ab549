"""Device mesh construction.

The reference is single-accelerator (SURVEY.md §2.4); scaling here is native
jax.sharding: a 2-axis ``(dp, tp)`` mesh over ICI, with a third logical use of
the dp axis for spatial partitioning (parallel/spatial.py).  No NCCL/MPI —
collectives are XLA's, laid out on the mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """Build a ('dp', 'tp') mesh over the first ``n_devices`` devices.

    ``tp`` must divide ``n_devices``; dp = n_devices // tp.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    if n % tp:
        raise ValueError(f"tp={tp} does not divide n_devices={n}")
    arr = np.array(devices[:n]).reshape(n // tp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))
