"""1000-step 1-shot adaptation trajectory smoke on the real TPU.

The 1-shot evaluation modes adapt out to step 1000
(``config/evaluation/*.yaml`` ft_step_list tail; reference
``evaluation/config.py`` mode_step_list), which is by far the longest
test-stage trajectory the framework runs: with the [0,5,10,20,50,100,200,
400,600,800,1000] schedule the gcd-chunked adapter dispatches ONE compiled
5-step program 200 times and materializes 11 full-param snapshot
generations.  This probe runs one real 1-shot task (K=5 sub-tasks, vmapped
— ``System.test_adapt_tasks`` batch_sub_tasks path) at flagship base
shapes on the chip and reports:

* wall time total / per chunk dispatch / per snapshot eval,
* peak HBM against the 10 GB snapshot budget (11 generations x K=5 x
  ~35 MB-per-module adapted subset must stay device-resident —
  ``System._snapshot_keep`` "auto"),
* per-sub-task query-loss rows at each saving step (sanity: finite,
  step0 == deterministic eval).

Run:  nohup python -u tools/probe_1shot_1000.py > /tmp/probe_1shot.log &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    if os.environ.get("METATTS_PLATFORM") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        from metatts_tpu.utils.jaxcache import enable_compilation_cache
        enable_compilation_cache()
    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as G
    from metatts_tpu.algorithms import get_system
    from metatts_tpu.utils.profiling import device_memory_stats

    tiny = os.environ.get("METATTS_1SHOT_TINY") == "1"
    pcfg, mcfg, tcfg, acfg = G._configs("tiny" if tiny else "full")
    acfg["adapt"]["test"].update({
        "steps": 1000 if not tiny else 20,
        "saving_steps": ([5, 10, 20, 50, 100, 200, 400, 600, 800, 1000]
                         if not tiny else [5, 10, 20]),
        "1-shot": True, "batch_sub_tasks": True,
        "shots": 5, "queries": 4,
    })
    stats = {"pitch": [-3.0, 10.0, 0.0, 1.0],
             "energy": [-2.0, 10.0, 0.0, 1.0]}
    system = get_system("meta")(pcfg, mcfg, tcfg, acfg, stats=stats,
                                n_speakers=32, seed=0)

    rng = np.random.RandomState(0)
    n_mels = pcfg["preprocessing"]["mel"]["n_mel_channels"]
    L, T = (128, 896) if not tiny else (32, 64)
    sup = G._batch(rng, B=5, L=L, T=T, n_mels=n_mels, n_speakers=32)
    qry = G._batch(rng, B=4, L=L, T=T, n_mels=n_mels, n_speakers=32)
    # 1-way episode: one speaker on both sides
    sup = sup._replace(speaker_args=sup.speaker_args * 0)
    qry = qry._replace(speaker_args=qry.speaker_args * 0)

    print(f"[1shot] backend {jax.default_backend()}  steps "
          f"{acfg['adapt']['test']['steps']}  saving "
          f"{acfg['adapt']['test']['saving_steps']}", flush=True)
    t0 = time.time()
    results = []
    for suffix, rows, snapshots in system.test_adapt_tasks(sup, qry):
        results.append((suffix, rows, len(snapshots)))
        print(f"[1shot] sub-task {suffix or '<full>'}: "
              + " ".join(f"ft{ft}={float(l.total):.3f}" for ft, l in rows),
              flush=True)
    wall = time.time() - t0

    mem = device_memory_stats()
    peak = max((m.get("peak_bytes_in_use") or 0 for m in mem.values()),
               default=0)
    n_chunks = sum((b - a) // 5 for a, b in zip(
        [0] + acfg["adapt"]["test"]["saving_steps"][:-1],
        acfg["adapt"]["test"]["saving_steps"])) if not tiny else 0
    summary = {
        "metric": "1shot_1000step_trajectory",
        "sub_tasks": len(results),
        "total_steps": acfg["adapt"]["test"]["steps"],
        "wall_s": round(wall, 1),
        "chunk_dispatches": n_chunks,
        "snapshot_generations": results[0][2] if results else 0,
        "peak_hbm_gib": round(peak / 2**30, 2) if peak else None,
        "all_finite": all(np.isfinite(float(l.total))
                          for _, rows, _ in results for _, l in rows),
    }
    print(json.dumps(summary), flush=True)
    out = os.environ.get("METATTS_1SHOT_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
