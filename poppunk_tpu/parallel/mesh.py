"""Device mesh construction.

Axis conventions used throughout the framework:

- ``r`` — the reference axis. The packed reference sketch tensor
  ``planes[R, K, P, Wp]`` is sharded along its first dimension; distance
  tiles computed on each device cover that device's reference shard.
- ``q`` — the query (data-parallel) axis. Query batches shard along it.

A 1-D mesh puts every device on ``r`` (maximally shards the big resident
tensor); a 2-D mesh trades reference-shard size against query parallelism.
The reference framework has no analogue (single-device only, SURVEY.md §5.8).
"""

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_shape_for(n_devices, n_q=None):
    """Pick a (q, r) mesh shape for ``n_devices`` devices.

    Default: r gets everything (the reference sketch tensor dominates
    memory); pass n_q to reserve a data-parallel query axis.
    """
    if n_q is None:
        return (1, n_devices)
    if n_devices % n_q != 0:
        raise ValueError(f"n_q={n_q} must divide n_devices={n_devices}")
    return (n_q, n_devices // n_q)


def get_mesh(n_devices=None, n_q=None, devices=None):
    """A Mesh with axes ('q', 'r') over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if len(devices) < n_devices:
                raise ValueError(
                    f"need {n_devices} devices, have {len(devices)}"
                )
            devices = devices[:n_devices]
    shape = mesh_shape_for(len(devices), n_q)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=("q", "r"))


def pad_to_multiple(n, m):
    return ((n + m - 1) // m) * m


def largest_pow2_divisor(n):
    return n & (-n) if n else 1


def pick_chunk(total, target, align=8):
    """A chunk size <= target that is a multiple of ``align``."""
    c = min(total, target)
    c = max(align, (c // align) * align)
    return c
