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


# Cap on each on-device concat buffer: packing is chosen precisely when the
# tree is too big to keep around, so one giant concat could transiently
# double device memory at the worst moment.  256 MB chunks keep the peak
# overhead bounded while still amortizing the per-transfer tunnel latency.
PACK_CHUNK_BYTES = 256 * 2**20


def packed_device_get(tree, chunk_bytes=PACK_CHUNK_BYTES):
    """``jax.device_get`` a pytree via a few large transfers.

    Leaves are raveled and concatenated ON DEVICE (eager ops — no jit, so
    no tunnel compile) into per-dtype buffers capped at ``chunk_bytes``
    each (the transient device copy is bounded — an offloaded snapshot
    generation can be most of HBM already), fetched, and unpacked on the
    host with zero-copy numpy slicing.  Returns a pytree of ``np.ndarray``
    with the original shapes/dtypes.
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
        # split the dtype group into chunks of <= chunk_bytes
        chunks, cur, cur_bytes = [], [], 0
        for i in idxs:
            nbytes = leaves[i].size * dtype.itemsize
            if cur and cur_bytes + nbytes > chunk_bytes:
                chunks.append(cur)
                cur, cur_bytes = [], 0
            cur.append(i)
            cur_bytes += nbytes
        if cur:
            chunks.append(cur)
        for chunk in chunks:
            if len(chunk) == 1:
                i = chunk[0]
                host[i] = np.asarray(jax.device_get(leaves[i]))
                continue
            flat = jnp.concatenate([leaves[i].ravel() for i in chunk])
            buf = np.asarray(jax.device_get(flat))
            del flat
            offset = 0
            for i in chunk:
                n = leaves[i].size
                host[i] = buf[offset:offset + n].reshape(leaves[i].shape)
                offset += n
    return jax.tree.unflatten(treedef, host)
