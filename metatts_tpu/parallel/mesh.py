"""Device mesh + sharding layout.

The reference scales by Lightning DDP over NCCL (``main.py:31-32``) — one
episode per GPU, gradient all-reduce after backward.  The TPU-native
equivalent is a 1-D SPMD mesh over ICI: the meta-batch's episode axis is
sharded across chips (`P("dp")`), params/optimizer state are replicated, and
the mean over episodes inside the jitted step becomes an XLA `psum` — no
user-level collective code.

``meta_batch_size`` episodes per step = reference recipe (8 episodes on
8xV100, ``README.md:73-77``); with fewer chips, episodes stack per chip and
XLA keeps them local (the vmap axis), exactly like grad accumulation but
without host round-trips.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis="dp"):
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def episode_sharding(mesh, axis="dp"):
    """Shard the leading (episode / batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis="dp"):
    """Place every array in a Batch pytree with its leading axis sharded."""
    sh = episode_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)
