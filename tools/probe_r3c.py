"""Follow-up TPU A/Bs after the is_tpu() gate fix (see ROUND3.md).

Covers the two comparisons tools/probe_attn_ab.py did not get to before the
tunnel dropped: the fused FFT-block megakernel vs the regular path on the
synthesis forward, and the ``flash`` custom-HVP fast-path variant of the
flagship meta step (einsum_remat/einsum were measured at 159.3/157.9 ms).

Run:  nohup python -u tools/probe_r3c.py > /tmp/probe_r3c.log 2>&1 &
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
    import jax.tree as jtree
    from metatts_tpu import config as C
    from metatts_tpu.algorithms.meta import MetaSystem
    from metatts_tpu.algorithms.adapt import Adaptor
    from metatts_tpu.utils.backend import is_tpu
    from __graft_entry__ import _batch

    print(json.dumps({"backend": jax.default_backend(),
                      "is_tpu": is_tpu()}), flush=True)

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
    qry1 = jtree.map(lambda x: x[0], qry)

    # 1) fused-infer megakernel vs regular path on the synthesis forward
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

    # 2) flash custom-HVP fast path on the flagship meta step
    mcfg = copy.deepcopy(C.MODEL_DEFAULTS)
    mcfg["fast_attention_impl"] = "flash"
    fsys = MetaSystem(pcfg, mcfg, tcfg, acfg, n_speakers=256)
    t0 = time.time()
    losses = fsys.train_step(sup, qry)
    jax.block_until_ready(losses.total)
    compile_s = time.time() - t0
    for _ in range(2):
        losses = fsys.train_step(sup, qry)
    jax.block_until_ready(losses.total)
    t0 = time.time()
    for _ in range(10):
        losses = fsys.train_step(sup, qry)
    jax.block_until_ready(losses.total)
    print(json.dumps({"fast_attention_impl": "flash",
                      "step_ms": round((time.time() - t0) / 10 * 1e3, 2),
                      "compile_s": round(compile_s, 1),
                      "loss": float(losses.total)}), flush=True)


if __name__ == "__main__":
    main()
