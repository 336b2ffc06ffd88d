"""Probe: meta-step time + compile time vs model.layer_scan on the TPU.

    python tools/probe_scan.py <false|true|2|3|6>

Times the bench.py flagship program (5-shot/5-query, 5 second-order inner
steps, T=896) — used to pick the layer_scan default (see
transformer.resolve_layer_scan).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    val = sys.argv[1] if len(sys.argv) > 1 else "true"
    scan = {"false": False, "true": True}.get(val, None)
    if scan is None:
        scan = int(val)

    import jax
    from metatts_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    from metatts_tpu import config as C
    from metatts_tpu.algorithms.meta import MetaSystem
    from __graft_entry__ import _batch

    import copy
    pcfg = copy.deepcopy(C.PREPROCESS_DEFAULTS)
    mcfg = copy.deepcopy(C.MODEL_DEFAULTS)
    tcfg = copy.deepcopy(C.TRAIN_DEFAULTS)
    acfg = copy.deepcopy(C.ALGORITHM_DEFAULTS)
    acfg["type"] = "meta"
    mcfg["layer_scan"] = scan

    system = MetaSystem(pcfg, mcfg, tcfg, acfg, n_speakers=256)
    rng = np.random.RandomState(0)

    def stack(B):
        b = _batch(rng, B=B, L=128, T=896, n_mels=80, n_speakers=256)
        return jax.tree.map(lambda x: x[None], b)

    sup, qry = stack(5), stack(5)
    t0 = time.time()
    losses = system.train_step(sup, qry)
    jax.block_until_ready(losses.total)
    compile_s = time.time() - t0
    for _ in range(2):
        losses = system.train_step(sup, qry)
    jax.block_until_ready(losses.total)
    t0 = time.time()
    for _ in range(10):
        losses = system.train_step(sup, qry)
    jax.block_until_ready(losses.total)
    dt = (time.time() - t0) / 10
    print(json.dumps({"layer_scan": val, "step_ms": round(dt * 1e3, 2),
                      "compile_s": round(compile_s, 1),
                      "loss": float(losses.total)}))


if __name__ == "__main__":
    main()
