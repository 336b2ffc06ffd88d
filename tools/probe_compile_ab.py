"""Cold-compile vs step-time A/B of ``model.layer_scan`` unroll factors on
the real TPU (VERDICT r3 #4: recover cold compile toward round-1 ~100 s).

``layer_scan: False`` (the TPU "auto" resolution) unrolls all 4+6 FFT
blocks into the XLA program — fastest steps, biggest program, slowest cold
compile.  ``lax.scan`` with an integer unroll factor u shrinks the program
~N/u while still fusing across u consecutive layers
(``models/transformer.py:222-274``).  This probe spawns ONE FRESH PROCESS
PER VARIANT (clean jit cache, persistent compilation cache disabled so
every compile is genuinely cold) and reports compile seconds + meta-step
milliseconds for layer_scan in {False, 3, 2, True}.

Run:  nohup python -u tools/probe_compile_ab.py > /tmp/compile_ab.log 2>&1 &
"""

import json
import os
import subprocess
import sys

VARIANTS = ["false", "3", "2", "true"]

CHILD = r"""
import json, sys, time
import numpy as np
import jax
jax.config.update("jax_default_prng_impl", "rbg")
sys.path.insert(0, ".")
variant = sys.argv[1]
ls = {"false": False, "true": True}.get(variant, None)
if ls is None:
    ls = int(variant)
import copy
from metatts_tpu import config as C
from metatts_tpu.algorithms.meta import MetaSystem
from __graft_entry__ import _batch
pcfg = copy.deepcopy(C.PREPROCESS_DEFAULTS)
mcfg = copy.deepcopy(C.MODEL_DEFAULTS)
mcfg["layer_scan"] = ls
tcfg = copy.deepcopy(C.TRAIN_DEFAULTS)
acfg = copy.deepcopy(C.ALGORITHM_DEFAULTS)
acfg["type"] = "meta"
acfg["adapt"]["train"].update(shots=5, queries=5, steps=5)
system = MetaSystem(pcfg, mcfg, tcfg, acfg, n_speakers=256)
rng = np.random.RandomState(0)
import jax.numpy as jnp
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
    losses = system.train_step(sup, qry)   # donation chains the steps
jax.block_until_ready(losses.total)
dt = (time.time() - t0) / 10
print("RESULT " + json.dumps({"layer_scan": variant,
                              "compile_s": round(compile_s, 1),
                              "step_ms": round(dt * 1e3, 2),
                              "loss": float(losses.total)}), flush=True)
"""


def main():
    env = dict(os.environ)
    # genuinely cold: no persistent compilation cache for the children
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    env["METATTS_NO_COMPILE_CACHE"] = "1"
    results = []
    for v in VARIANTS:
        print(f"[probe] layer_scan={v} ...", flush=True)
        r = subprocess.run([sys.executable, "-u", "-c", CHILD, v],
                           env=env, capture_output=True, text=True,
                           timeout=1800)
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("RESULT ")), None)
        if line is None:
            print(f"[probe] variant {v} FAILED rc={r.returncode}\n"
                  f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}", flush=True)
            continue
        res = json.loads(line[len("RESULT "):])
        results.append(res)
        print(json.dumps(res), flush=True)
    print(json.dumps({"compile_ab": results}), flush=True)


if __name__ == "__main__":
    main()
