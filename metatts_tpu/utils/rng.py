"""Seeding / determinism utilities.

Reference counterparts: ``pl.seed_everything(43)`` + ``deterministic: True``
(``main.py:35,113``), the ``seed_all`` RNG-snapshot context manager
(``lightning/utils.py:32-47``), and the DDP recipe's "each GPU has its own
random seed" (``README.md:76-77``).

In JAX determinism is the default (pure functions + explicit keys); what
remains is (a) seeding the *host-side* samplers reproducibly and (b) giving
each mesh device an independent stream — done by folding the device index
into the key inside the SPMD program.
"""

import contextlib
import random

import numpy as np

GLOBAL_SEED = 43


def seed_everything(seed=GLOBAL_SEED):
    random.seed(seed)
    np.random.seed(seed)
    return seed


@contextlib.contextmanager
def seed_all(seed):
    """Temporarily fix python+numpy RNG state, restoring afterwards
    (reference ``lightning/utils.py:32-47``); used to freeze episode
    prefetching."""
    py_state = random.getstate()
    np_state = np.random.get_state()
    random.seed(seed)
    np.random.seed(seed)
    try:
        yield
    finally:
        random.setstate(py_state)
        np.random.set_state(np_state)


def per_device_key(key, axis_name="dp"):
    """Inside shard_map/pjit: fold the device's mesh position into the key
    so each chip draws an independent stream (the reference's per-GPU
    seeds), while params stay replicated."""
    import jax
    return jax.random.fold_in(key, jax.lax.axis_index(axis_name))
