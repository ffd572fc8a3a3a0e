"""Device-mesh construction for the read-id sharded pipeline.

The reference is single-threaded (SURVEY.md §2.4); all distribution here is
new design: a 1-D mesh over the read-id axis ("r").  Hits live block-sharded
by query-read id; trim tables (O(n_reads), small) are replicated; mirrored
hits are exchanged with all_to_all; scalar stats/convergence flags use psum.
"""

from __future__ import annotations

import jax


def make_mesh(n_devices: int | None = None, axis: str = "r") -> jax.sharding.Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return jax.sharding.Mesh(np.array(devs), (axis,))
