"""Benchmark: flagship MAML episode training throughput on one TPU chip.

Metric (BASELINE.json): mel-frames/sec/chip for the meta training step —
teacher-forced mel frames consumed per second (support frames x inner steps
+ query frames, per outer step).

vs_baseline compares against an ANALYTIC estimate of the PyTorch reference
on one V100 (no throughput was published; see BASELINE.md): ~70 GFLOPs
forward per 870-frame sample, 5-shot/5-query episode with 5 second-order
inner steps ≈ 11 TFLOPs/episode; at a realistic 20% fp32 V100 utilization
(3.1 TFLOP/s) one episode ≈ 3.6 s → ≈ 7.2k teacher-forced frames/s/GPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

REF_V100_FRAMES_PER_SEC = 7200.0  # analytic estimate, documented above

# flagship shapes (LibriTTS-like): 5-shot/5-query, 128 phones, 896 mel frames
SHOTS = 5
QUERIES = 5
SRC_LEN = 128
MEL_LEN = 896
INNER_STEPS = 5
EPISODES = 1  # one episode per chip = reference DDP recipe
WARMUP = 2
ITERS = 10


def main():
    import jax
    from metatts_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    # rbg is ~10% faster than threefry for in-graph dropout mask generation
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
    acfg["adapt"]["train"].update(shots=SHOTS, queries=QUERIES,
                                  steps=INNER_STEPS)

    system = MetaSystem(pcfg, mcfg, tcfg, acfg, n_speakers=256)

    rng = np.random.RandomState(0)

    def episode_stack(B):
        bs = [_batch(rng, B=B, L=SRC_LEN, T=MEL_LEN, n_mels=80,
                     n_speakers=256) for _ in range(EPISODES)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *bs)

    sup = episode_stack(SHOTS)
    qry = episode_stack(QUERIES)

    # compile
    t0 = time.time()
    losses = system.train_step(sup, qry)
    jax.block_until_ready(losses.total)
    compile_s = time.time() - t0

    for _ in range(WARMUP):
        losses = system.train_step(sup, qry)
    jax.block_until_ready(losses.total)

    t0 = time.time()
    for _ in range(ITERS):
        losses = system.train_step(sup, qry)
    jax.block_until_ready(losses.total)
    dt = (time.time() - t0) / ITERS

    sup_frames = int(np.asarray(sup.mel_lens).sum())
    qry_frames = int(np.asarray(qry.mel_lens).sum())
    frames_per_step = sup_frames * INNER_STEPS + qry_frames
    value = frames_per_step / dt

    # second metric (BASELINE.json): RTF of a test-time speaker-adaptation
    # episode — 100 first-order adapt steps on the support set + query
    # synthesis through the MelGAN vocoder, vs the audio duration produced.
    from metatts_tpu.models.vocoder import Vocoder
    import jax.tree as jtree
    sup1 = jtree.map(lambda x: x[0], sup)
    qry1 = jtree.map(lambda x: x[0], qry)
    vocoder = Vocoder({"vocoder": {"model": "MelGAN"}})

    # adaptation in 10-step jitted chunks (small programs compile fast and
    # the chunk is reused 10x)
    adapt_chunk = jax.jit(lambda p: system.adaptor.adapt(
        p, system.state, sup1, steps=10,
        lr=system.acfg["adapt"]["test"]["lr"],
        first_order=True, train=False, rng=None))
    # synthesis is pure inference -> fused FFT-block megakernel (the adapt
    # chunks differentiate, so they keep the regular path)
    from metatts_tpu.algorithms.adapt import Adaptor
    adaptor_inf = Adaptor(pcfg, dict(mcfg, _fused_infer=True), acfg)
    synth = jax.jit(lambda p: adaptor_inf.forward(
        p, system.state, qry1, train=False, average_spk_emb=True)[0])

    params = adapt_chunk(system.params)           # compile chunk
    out = synth(params)                           # compile synth
    jax.block_until_ready(out.postnet_mel)
    wavs = vocoder.infer(out.postnet_mel)         # compile vocoder
    t0 = time.time()
    params = system.params
    for _ in range(10):
        params = adapt_chunk(params)
    out = synth(params)
    mels, mel_lens = out.postnet_mel, out.mel_lens
    wavs = vocoder.infer(mels, lengths=np.asarray(mel_lens) * 256)
    adapt_synth_s = time.time() - t0
    audio_s = float(np.asarray(mel_lens).sum()) * 256 / 22050.0
    rtf = adapt_synth_s / max(audio_s, 1e-6)

    # chained acoustic-forward latency (serving): repeated same-input calls
    # through the axon tunnel under-report wall time unless each call
    # depends on the previous result, so thread a zero-scale data
    # dependency through the params pytree
    synth_b = jax.jit(lambda p, b: adaptor_inf.forward(
        p, system.state, b, train=False, average_spk_emb=True)[0])

    def chained_window(n=10):
        # block_until_ready alone does not serialize through the tunnel,
        # and the first window absorbs hidden compile time — so chain a
        # data dependency and discard the first window.  The dependency
        # must CHANGE the value: +mean*1e-30 underflows in fp32 to
        # bit-identical inputs, which the tunnel can serve without
        # re-executing.
        b = qry1
        t0 = time.time()
        for i in range(n):
            out = synth_b(params, b)
            eps = out.postnet_mel.mean() * 1e-9 + (i + 1) * 1e-6
            b = b._replace(p_targets=b.p_targets + eps)
        float(np.asarray(out.postnet_mel.mean()))    # hard host sync
        return (time.time() - t0) / n * 1e3

    chained_window()                                 # absorb compile
    synth_forward_ms = chained_window()

    # secondary metric: plain supervised (baseline) training step at the
    # reference recipe batch (80). Measured ~50% of v5e bf16 peak — the
    # training path is MXU-bound, not dispatch-bound, at batch scale.
    from metatts_tpu.algorithms.baseline import BaselineSystem
    bsys = BaselineSystem(pcfg, mcfg, tcfg,
                          {**acfg, "type": "baseline"}, n_speakers=256)
    bbatch = _batch(rng, B=80, L=SRC_LEN, T=MEL_LEN, n_mels=80,
                    n_speakers=256)
    bl = bsys.train_step(bbatch)
    for _ in range(3):
        bl = bsys.train_step(bbatch)
    jax.block_until_ready(bl.total)
    t0 = time.time()
    for _ in range(10):
        bl = bsys.train_step(bbatch)   # param donation chains the steps
    jax.block_until_ready(bl.total)
    b_dt = (time.time() - t0) / 10
    b_frames = int(np.asarray(bbatch.mel_lens).sum())

    # reference-parity 1-chip recipe (README.md:73-77): effective meta batch
    # 8 as meta_batch_size 1 x grad_acc_step 8 (optax.MultiSteps) — the
    # single-chip equivalent of the 8xV100 DDP recipe, timed as ONE
    # effective update (8 chained micro-steps; donation chains them).
    tcfg_acc = copy.deepcopy(tcfg)
    tcfg_acc["optimizer"]["grad_acc_step"] = 8
    accsys = MetaSystem(pcfg, mcfg, tcfg_acc, acfg, n_speakers=256)
    al = accsys.train_step(sup, qry)          # compile (E=1 episode stack)
    jax.block_until_ready(al.total)
    for _ in range(2):
        al = accsys.train_step(sup, qry)
    jax.block_until_ready(al.total)
    t0 = time.time()
    for _ in range(8):                         # one effective batch-8 step
        al = accsys.train_step(sup, qry)
    jax.block_until_ready(al.total)
    acc_dt = time.time() - t0

    # SPMD test stage (the reference distributes test episodes one-per-GPU
    # under DDP, base_adaptor.py:151): per-task wall for the full 100-step
    # snapshot trajectory, sequential System.test_adapt vs 8-wide vmapped
    # System.test_adapt_batched on this one chip.  Sync rules per
    # tools/probe_test_stage.py: block on the last loss AND a snapshot leaf,
    # and chain a zero-scale data dependency between reps (tunnel).
    def timed_test(fn, sup_in, reps):
        # sync by FETCHING values (block_until_ready alone has
        # under-reported here), and chain a dependency whose scale
        # survives fp32 addition — +loss*1e-30 underflows to bit-identical
        # inputs, which the tunnel can serve without re-executing
        per_rep = []
        for r in range(reps):
            t0 = time.time()
            rows_t, snaps_t = fn(sup_in)
            last_loss = rows_t[-1][1].total
            float(np.asarray(jnp.asarray(last_loss).sum()))
            float(np.asarray(jtree.leaves(snaps_t[-1][1])[0].sum()))
            per_rep.append(time.time() - t0)
            eps = jnp.asarray(last_loss).mean() * 1e-9 + (r + 1) * 1e-6
            sup_in = sup_in._replace(mels=sup_in.mels + eps)
            # free this rep's snapshots BEFORE the next rep: 8-wide
            # device-resident trajectories are ~6.7 GB; two generations
            # alive at once OOM the 16 GB chip (production consumes one
            # set and drops it — Trainer.run_batched)
            del rows_t, snaps_t, last_loss
        return per_rep

    import jax.numpy as jnp
    test_compile_s = timed_test(
        lambda s: system.test_adapt(s, qry1), sup1, reps=1)[0]
    seq_task_s = float(np.mean(timed_test(
        lambda s: system.test_adapt(s, qry1), sup1, reps=3)))
    EB = 8
    supE = jtree.map(lambda x: jnp.broadcast_to(x[None], (EB,) + x.shape),
                     sup1)
    qryE = jtree.map(lambda x: jnp.broadcast_to(x[None], (EB,) + x.shape),
                     qry1)
    test_compile_s += timed_test(
        lambda s: system.test_adapt_batched(s, qryE), supE, reps=1)[0]
    bat_wall_s = float(np.mean(timed_test(
        lambda s: system.test_adapt_batched(s, qryE), supE, reps=3)))
    # snapshot residency the auto policy actually engaged (byte math of
    # System._snapshot_keep; n_snapshots = len(saving_steps)+1)
    import os as _os
    from metatts_tpu.utils.backend import is_tpu
    param_bytes = sum(x.size * x.dtype.itemsize
                      for x in jax.tree.leaves(system.params))
    n_snap = len(acfg["adapt"]["test"]["saving_steps"]) + 1
    budget = float(_os.environ.get("METATTS_SNAPSHOT_HBM_BUDGET",
                                   10e9 if is_tpu() else 4e9))
    snap_mode = acfg["adapt"]["test"].get("snapshot_offload", "auto")
    if snap_mode == "auto":
        snap_mode = {
            "seq": "device" if n_snap * param_bytes <= budget else "host",
            "batched8": ("device" if n_snap * EB * param_bytes <= budget
                         else "host")}

    # XLA's own FLOP count for the compiled meta step — hardens the analytic
    # baseline (BASELINE.md documents the hand derivation; this is the
    # compiler's number for the same program)
    step_tflops = None
    try:
        fn = system._compiled.get("meta_train")
        cost = fn.lower(system.params, system.state, system.opt_state,
                        sup, qry, system.next_rng(),
                        None).compile().cost_analysis()
        if cost and "flops" in cost:
            step_tflops = round(float(cost["flops"]) / 1e12, 3)
    except Exception:
        pass

    print(json.dumps({
        "metric": "train_mel_frames_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "mel-frames/s/chip (MAML outer step, 5-shot/5-query, "
                "5 second-order inner steps)",
        # ANALYTIC baseline: the reference publishes no throughput; this is
        # value / 7.2k frames/s, an estimated single-V100 number (full FLOP
        # derivation + a measured same-host torch-CPU anchor in BASELINE.md)
        "vs_baseline": round(value / REF_V100_FRAMES_PER_SEC, 3),
        "baseline_kind": "analytic V100 estimate (see BASELINE.md)",
        # the only MEASURED cross-framework anchor: same-host single-core
        # CPU, this framework 389.2 s/episode vs the torch reference 644.7
        # (BASELINE.md "measured anchor") — the graph-level advantage; the
        # rest of vs_baseline is the TPU-port speedup itself
        "vs_torch_same_host_cpu_measured": 1.66,
        "step_time_ms": round(dt * 1e3, 2),
        "xla_step_tflops": step_tflops,
        "compile_s": round(compile_s, 1),
        "loss": float(losses.total),
        "adapt100_synth_rtf": round(rtf, 4),
        "adapt100_synth_s": round(adapt_synth_s, 3),
        "synth_forward_ms_chained": round(synth_forward_ms, 2),
        "baseline_step_ms_B80": round(b_dt * 1e3, 2),
        "baseline_mel_frames_per_sec": round(b_frames / b_dt, 1),
        # one EFFECTIVE meta update at the reference recipe (batch 8 via
        # grad_acc_step 8 on one chip; README.md:73-77 arithmetic)
        "gradacc8_effective_step_ms": round(acc_dt * 1e3, 2),
        "gradacc8_frames_per_sec": round(frames_per_step * 8 / acc_dt, 1),
        # SPMD test stage: tasks/s for the full 100-step snapshot
        # trajectory, sequential vs 8-wide vmapped (VERDICT r3 #3)
        "test_stage_tasks_per_sec_seq": round(1.0 / seq_task_s, 3),
        "test_stage_tasks_per_sec_batched8": round(EB / bat_wall_s, 3),
        "test_stage_speedup_batched8": round(seq_task_s * EB / bat_wall_s,
                                             2),
        "test_stage_snapshot_offload": snap_mode,
        "test_stage_compile_s": round(test_compile_s, 1),
    }))


if __name__ == "__main__":
    main()
