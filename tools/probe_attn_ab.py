"""A/B the custom-HVP fast-path attention impl and the fused-infer gate on
the real TPU.

Run:  nohup python -u tools/probe_attn_ab.py > /tmp/attn_ab.log 2>&1 &

Times the flagship meta train_step (bench.py shapes) with
``model.fast_attention_impl`` in {einsum_remat, einsum, flash}, and the
synthesis forward with/without the fused FFT-block megakernel, printing one
JSON line per variant.  Used to pick the measured defaults — see
models/transformer.py resolve_attn_impl and ROUND3.md.
"""

import copy
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

SHOTS, QUERIES, SRC_LEN, MEL_LEN, INNER_STEPS = 5, 5, 128, 896, 5


def main():
    import jax
    from metatts_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    from metatts_tpu import config as C
    from metatts_tpu.algorithms.meta import MetaSystem
    from metatts_tpu.utils.backend import is_tpu
    from __graft_entry__ import _batch

    print(json.dumps({"backend": jax.default_backend(),
                      "is_tpu": is_tpu()}), flush=True)

    # numerics: the native-conv branch (now engaged on the tunneled TPU)
    # must agree with the im2col branch the previous rounds benched
    from metatts_tpu.models import nn as mnn
    kp = jax.random.PRNGKey(0)
    cp = mnn.conv1d_init(kp, 256, 256, 9)
    cx = jnp.asarray(np.random.RandomState(1).randn(2, 64, 256), jnp.float32)
    y_native = jax.jit(
        lambda p, x: mnn.conv1d(p, x, dilation=2, impl="native"))(cp, cx)
    y_im2col = jax.jit(
        lambda p, x: mnn.conv1d(p, x, dilation=2, impl="im2col"))(cp, cx)
    err = float(jnp.abs(y_native - y_im2col).max())
    print(json.dumps({"conv_native_vs_im2col_maxerr": err}), flush=True)
    assert err < 1e-3, err

    pcfg = copy.deepcopy(C.PREPROCESS_DEFAULTS)
    tcfg = copy.deepcopy(C.TRAIN_DEFAULTS)
    acfg = copy.deepcopy(C.ALGORITHM_DEFAULTS)
    acfg["type"] = "meta"
    acfg["adapt"]["train"].update(shots=SHOTS, queries=QUERIES,
                                  steps=INNER_STEPS)
    rng = np.random.RandomState(0)

    def episode_stack(B):
        bs = [_batch(rng, B=B, L=SRC_LEN, T=MEL_LEN, n_mels=80,
                     n_speakers=256)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *bs)

    sup, qry = episode_stack(SHOTS), episode_stack(QUERIES)

    import os
    for conv_impl in ["im2col", "native"]:
        os.environ["METATTS_CONV_IMPL"] = conv_impl
        for fast_impl in ["einsum_remat", "einsum", "flash"]:
            mcfg = copy.deepcopy(C.MODEL_DEFAULTS)
            mcfg["fast_attention_impl"] = fast_impl
            system = MetaSystem(pcfg, mcfg, tcfg, acfg, n_speakers=256)
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
            print(json.dumps({"conv_impl": conv_impl,
                              "fast_attention_impl": fast_impl,
                              "step_ms": round(dt * 1e3, 2),
                              "compile_s": round(compile_s, 1),
                              "loss": float(losses.total)}), flush=True)
    del os.environ["METATTS_CONV_IMPL"]

    # fused-infer megakernel vs regular path on the synthesis forward
    from metatts_tpu.algorithms.adapt import Adaptor
    import jax.tree as jtree
    qry1 = jtree.map(lambda x: x[0], qry)
    base_m = copy.deepcopy(C.MODEL_DEFAULTS)
    system = MetaSystem(pcfg, base_m, tcfg, acfg, n_speakers=256)
    for fused in [False, True]:
        adaptor = Adaptor(pcfg, dict(base_m, _fused_infer=fused), acfg)
        synth_b = jax.jit(lambda p, b, a=adaptor: a.forward(
            p, system.state, b, train=False, average_spk_emb=True)[0])

        def window(n=10):
            b = qry1
            t0 = time.time()
            for _ in range(n):
                out = synth_b(system.params, b)
                eps = out.postnet_mel.mean() * 1e-30
                b = b._replace(p_targets=b.p_targets + eps)
            float(np.asarray(out.postnet_mel.mean()))
            return (time.time() - t0) / n * 1e3

        window()  # absorb compile
        print(json.dumps({"fused_infer": fused,
                          "synth_forward_ms_chained": round(window(), 2)}),
              flush=True)

    # batched test stage: per-task wall for the full 100-step adaptation
    # trajectory with snapshot evals, sequential vs 8-wide vmapped
    # (System.test_adapt_batched) on one chip
    import jax.tree as jtree
    sup1 = jtree.map(lambda x: x[0], sup)
    qry1b = jtree.map(lambda x: x[0], qry)
    sys8 = MetaSystem(pcfg, copy.deepcopy(C.MODEL_DEFAULTS), tcfg, acfg,
                      n_speakers=256)
    t0 = time.time()
    sys8.test_adapt(sup1, qry1b)        # compile
    seq_compile = time.time() - t0
    t0 = time.time()
    for _ in range(3):
        sys8.test_adapt(sup1, qry1b)
    seq_s = (time.time() - t0) / 3
    EB = 8
    supE = jtree.map(lambda x: jnp.broadcast_to(x[None], (EB,) + x.shape),
                     sup1)
    qryE = jtree.map(lambda x: jnp.broadcast_to(x[None], (EB,) + x.shape),
                     qry1b)
    t0 = time.time()
    sys8.test_adapt_batched(supE, qryE)  # compile
    bat_compile = time.time() - t0
    t0 = time.time()
    for _ in range(3):
        sys8.test_adapt_batched(supE, qryE)
    bat_s = (time.time() - t0) / 3
    print(json.dumps({"test_stage_seq_s_per_task": round(seq_s, 4),
                      "test_stage_batched8_s_per_task": round(bat_s / EB, 4),
                      "test_stage_speedup": round(seq_s / (bat_s / EB), 2),
                      "seq_compile_s": round(seq_compile, 1),
                      "batched_compile_s": round(bat_compile, 1)}),
          flush=True)

    # conv impl A/B on the supervised baseline step (B=80, the bench's
    # secondary metric): round <=3 TPU numbers were measured on the im2col
    # branch (the == "tpu" gate missed the axon platform)
    import os
    from metatts_tpu.algorithms.baseline import BaselineSystem
    bbatch = _batch(rng, B=80, L=SRC_LEN, T=MEL_LEN, n_mels=80,
                    n_speakers=256)
    for conv_impl in ["im2col", "native"]:
        os.environ["METATTS_CONV_IMPL"] = conv_impl
        bsys = BaselineSystem(pcfg, copy.deepcopy(C.MODEL_DEFAULTS), tcfg,
                              {**acfg, "type": "baseline"}, n_speakers=256)
        bl = bsys.train_step(bbatch)
        for _ in range(3):
            bl = bsys.train_step(bbatch)
        jax.block_until_ready(bl.total)
        t0 = time.time()
        for _ in range(10):
            bl = bsys.train_step(bbatch)
        jax.block_until_ready(bl.total)
        print(json.dumps({"conv_impl": conv_impl,
                          "baseline_step_ms_B80":
                          round((time.time() - t0) / 10 * 1e3, 2)}),
              flush=True)
    del os.environ["METATTS_CONV_IMPL"]


if __name__ == "__main__":
    main()
