"""Device->host transfer helpers for the tunneled-TPU environment.

Through the remote-TPU tunnel, ``jax.device_get`` of a many-leaf pytree is
LATENCY-bound, not bandwidth-bound: each leaf is a separate synchronous
round trip.  Measured on the v5e tunnel (2026-08-19, /tmp/probe_d2h.py):

* 218-leaf / 138 MB params pytree: 158 s  (~0.7 s **per leaf**, 0.9 MB/s)
* the same 138 MB as ONE packed array: 8.4 s  (16 MB/s)
* a 1.11 GB packed array: 91 s  (12 MB/s)

So fetching a snapshot pytree leaf-by-leaf is ~19x slower than fetching one
concatenated buffer — and even packed, the tunnel moves ~12-16 MB/s, which
is why the test stage keeps snapshots device-resident whenever they fit HBM
(System._snapshot_keep) and why ``packed_device_get`` exists for the cases
that genuinely must offload.

On a locally attached backend (PCIe ~10 GB/s, or XLA:CPU where device_get
is a no-op copy) the packing detour is cheap relative to the copy and the
helper remains a safe default.
"""

import jax
import jax.numpy as jnp
import numpy as np


def packed_device_get(tree):
    """``jax.device_get`` a pytree via one transfer per dtype group.

    Leaves are raveled and concatenated ON DEVICE (eager ops — no jit, so
    no tunnel compile), fetched as one buffer per distinct dtype, and
    unpacked on the host with zero-copy numpy slicing.  Returns a pytree of
    ``np.ndarray`` with the original shapes/dtypes.
    """
    leaves, treedef = jax.tree.flatten(tree)
    if not leaves:
        return jax.tree.unflatten(treedef, leaves)
    host = [None] * len(leaves)
    by_dtype = {}
    for i, leaf in enumerate(leaves):
        if not isinstance(leaf, jax.Array):
            host[i] = np.asarray(leaf)
            continue
        by_dtype.setdefault(jnp.dtype(leaf.dtype), []).append(i)
    for dtype, idxs in by_dtype.items():
        if len(idxs) == 1:
            i = idxs[0]
            host[i] = np.asarray(jax.device_get(leaves[i]))
            continue
        flat = jnp.concatenate([leaves[i].ravel() for i in idxs])
        buf = np.asarray(jax.device_get(flat))
        offset = 0
        for i in idxs:
            n = leaves[i].size
            host[i] = buf[offset:offset + n].reshape(leaves[i].shape)
            offset += n
    return jax.tree.unflatten(treedef, host)
