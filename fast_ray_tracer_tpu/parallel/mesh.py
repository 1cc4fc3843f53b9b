"""Device-mesh data parallelism for the renderer.

The reference's only parallelism is one pthread job per scanline over
per-thread deep world copies, merged through a mutex-guarded canvas
(src/renderer/renderer.c:243-281, src/libs/thpool/thpool.c). The TPU-native
equivalent: rays/pixels shard over a 1-D `Mesh` axis ('batch'), the scene
IR is replicated (it is small), and the only cross-device communication is
the gradient `psum` GSPMD inserts in the backward pass — there are no
mutexes and no world copies because everything is pure.

Scaling to multi-host follows the same structure: `jax.distributed` makes
all hosts' devices visible in one mesh; each host feeds its own pixel
shard (process-local addressable slice) and collectives ride ICI.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


BATCH_AXIS = "batch"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """A 1-D mesh over the first n (default: all) devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (BATCH_AXIS,))


def shard_pixel_batch(mesh: Mesh, *arrays):
    """Place per-ray/per-pixel arrays sharded on the batch axis."""
    sh = NamedSharding(mesh, P(BATCH_AXIS))
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate_scene(mesh: Mesh, tree):
    """Replicate a pytree (SceneIR / optimizer state) on every device."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)
