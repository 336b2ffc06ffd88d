"""Time the batched test stage on the real TPU: per-task wall for the full
100-step adaptation trajectory with snapshot evals, sequential
(System.test_adapt) vs 8-wide vmapped (System.test_adapt_batched) on one
chip.  Trimmed from tools/probe_attn_ab.py so it can run standalone after
bench.py has warmed the cache.

Run:  nohup python -u tools/probe_test_stage.py > /tmp/test_stage_ab.log 2>&1 &
"""

import copy
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

SHOTS, QUERIES, SRC_LEN, MEL_LEN = 5, 5, 128, 896


def main():
    import jax
    from metatts_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import jax.tree as jtree
    from metatts_tpu import config as C
    from metatts_tpu.algorithms.meta import MetaSystem
    from metatts_tpu.utils.backend import is_tpu
    from __graft_entry__ import _batch

    print(json.dumps({"backend": jax.default_backend(),
                      "is_tpu": is_tpu()}), flush=True)

    pcfg = copy.deepcopy(C.PREPROCESS_DEFAULTS)
    tcfg = copy.deepcopy(C.TRAIN_DEFAULTS)
    acfg = copy.deepcopy(C.ALGORITHM_DEFAULTS)
    acfg["type"] = "meta"
    rng = np.random.RandomState(0)
    sup1 = _batch(rng, B=SHOTS, L=SRC_LEN, T=MEL_LEN, n_mels=80,
                  n_speakers=256)
    qry1 = _batch(rng, B=QUERIES, L=SRC_LEN, T=MEL_LEN, n_mels=80,
                  n_speakers=256)

    system = MetaSystem(pcfg, copy.deepcopy(C.MODEL_DEFAULTS), tcfg, acfg,
                        n_speakers=256)

    def timed(fn, sup, reps=3):
        """Wall-time fn(sup') with proper sync through the axon tunnel:

        * fetch VALUES (device sum -> host scalar) of the last row's loss
          and a snapshot leaf — block_until_ready alone has under-reported
          here;
        * thread a VALUE-CHANGING data dependency from the loss into the
          next rep's support mels.  The scale must survive fp32 addition:
          ``mels + loss*1e-30`` underflows to bit-identical inputs, and
          bit-identical (executable, args) reps through the tunnel can be
          served without re-executing (measured 0.092 s/"task" for a
          100-step trajectory whose compute floor is ~1 s).
        """
        per_rep = []
        for r in range(reps):
            t0 = time.time()
            rows, snapshots = fn(sup)
            last_loss = rows[-1][1].total
            float(np.asarray(jnp.asarray(last_loss).sum()))
            float(np.asarray(jtree.leaves(snapshots[-1][1])[0].sum()))
            per_rep.append(time.time() - t0)
            eps = jnp.asarray(last_loss).mean() * 1e-9 + (r + 1) * 1e-6
            sup = sup._replace(mels=sup.mels + eps)
            # free this rep's snapshots BEFORE the next rep runs: 8-wide
            # device-resident trajectories are ~6.7 GB, and two generations
            # alive at once OOM the 16 GB chip (production consumes one
            # set and drops it — Trainer.run_batched)
            del rows, snapshots, last_loss
        return per_rep

    seq_compile = timed(lambda s: system.test_adapt(s, qry1), sup1,
                        reps=1)[0]
    seq_s = float(np.mean(timed(lambda s: system.test_adapt(s, qry1),
                                sup1)))
    print(json.dumps({"test_stage_seq_s_per_task": round(seq_s, 4),
                      "seq_compile_s": round(seq_compile, 1)}), flush=True)

    EB = 8
    supE = jtree.map(lambda x: jnp.broadcast_to(x[None], (EB,) + x.shape),
                     sup1)
    qryE = jtree.map(lambda x: jnp.broadcast_to(x[None], (EB,) + x.shape),
                     qry1)
    bat_compile = timed(lambda s: system.test_adapt_batched(s, qryE), supE,
                        reps=1)[0]
    bat_s = float(np.mean(timed(
        lambda s: system.test_adapt_batched(s, qryE), supE)))
    print(json.dumps({"test_stage_batched8_s_per_task": round(bat_s / EB, 4),
                      "test_stage_batched8_wall_s": round(bat_s, 4),
                      "test_stage_speedup": round(seq_s / (bat_s / EB), 2),
                      "batched_compile_s": round(bat_compile, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
