"""Device-mesh construction and multi-host initialization.

The canonical PLS mesh has two logical axes (SURVEY.md §2):
  'rows'  — data parallelism over observations: X/Y row shards; the
            contractions XᵀY, XᵀX, Xᵀt, tᵀt all-reduce over this axis.
  'folds' — scenario parallelism over CV folds / bootstrap replicates:
            embarrassingly parallel model fits.

On a pod slice, lay 'rows' along ICI-adjacent devices (the per-component
all-reduces ride ICI); 'folds' can span the DCN dimension since replicates
never communicate.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_pls_mesh(
    rows: int | None = None,
    folds: int = 1,
    devices=None,
) -> Mesh:
    """Build a ('rows', 'folds') mesh over the given (default: all) devices.

    If `rows` is None, it is inferred as n_devices // folds.
    """
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if rows is None:
        if n % folds:
            raise ValueError(f"{n} devices not divisible by folds={folds}")
        rows = n // folds
    if rows * folds != n:
        raise ValueError(f"rows*folds = {rows * folds} != {n} devices")
    dev_array = np.asarray(devices).reshape(rows, folds)
    return Mesh(dev_array, ("rows", "folds"))


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bring-up: `jax.distributed.initialize` wrapper.

    On TPU pods the arguments are discovered from the environment; on CPU
    or single-host setups this is a no-op if already initialized.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        # already initialized, or single-process context
        pass
