"""Probe: does the scratch GE2E trainer learn at all, and do Griffin-Lim
partials of the synthetic corpus carry speaker signal?

Round-5 smoke run symptom: ge2e loss pinned at exactly ln(8)=2.0794 over
40 steps.  Hypotheses:
  (a) cold-start plateau — untrained LSTM + relu + L2-norm maps every
      input to a near-identical positive-orthant embedding, so all
      similarities equal w+b, softmax is uniform, gradients nearly cancel;
  (b) the inputs themselves carry no speaker signal (VAD/mel frontend
      degenerates on Griffin-Lim audio of the 8-mel synthetic corpus).

Probe A trains on OBVIOUSLY separable synthetic partials (per-speaker mean
offset + noise): if loss stays at ln(8), the trainer/loss is broken; if it
drops, (a) was the story and more steps / a better schedule fix it.
Probe B builds real GL partials for a few synthetic-corpus speakers and
reports between- vs within-speaker feature distances.
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np


def probe_a(steps=400):
    from metatts_tpu.evaluation.ge2e_scratch import train_ge2e
    rng = np.random.RandomState(0)
    partials = {}
    for s in range(16):
        mean = rng.randn(1, 1, 40) * 2.0
        partials[s] = (mean + 0.3 * rng.randn(8, 160, 40)).astype(np.float32)
    t0 = time.time()
    params, trace = train_ge2e(partials, hidden=128, embed=128, steps=steps,
                               seed=0, verbose=False)
    print(f"[A] separable-input GE2E: loss {trace[0]:.4f} -> "
          f"min {min(trace):.4f} -> final {trace[-1]:.4f}  "
          f"({time.time()-t0:.0f}s, {steps} steps)")
    print("[A] trace every 25:",
          [round(v, 3) for v in trace[::25]])
    return trace


def probe_b():
    from metatts_tpu.data.synthetic import SyntheticVoices, SyntheticMelVocoder
    from metatts_tpu.evaluation.ge2e_scratch import utterance_partial
    corpus = SyntheticVoices(n_speakers=6, n_mels=8, seed=0)
    voc = SyntheticMelVocoder(n_mels=8, n_iters=24, seed=0)
    rng = np.random.RandomState(1)
    feats = {}
    for s in range(4):
        batch = corpus.batch([s] * 4, rng)
        wavs = voc(np.asarray(batch.mels), np.asarray(batch.mel_lens))
        P = np.stack([utterance_partial(w, voc.sr) for w in wavs])
        feats[s] = P
        print(f"[B] spk {s}: partial stats mean {P.mean():.4f} std "
              f"{P.std():.4f} max {P.max():.4f} frac-zero "
              f"{(P == 0).mean():.3f}")
    means = {s: feats[s].reshape(4, -1).mean(0) for s in feats}
    within = np.mean([np.linalg.norm(feats[s].reshape(4, -1) - means[s],
                                     axis=1).mean() for s in feats])
    pairs = [(a, b) for a in feats for b in feats if a < b]
    between = np.mean([np.linalg.norm(means[a] - means[b]) for a, b in pairs])
    print(f"[B] within-speaker dist {within:.3f} vs between-speaker "
          f"mean-dist {between:.3f} (ratio {between/max(within,1e-9):.3f})")


def probe_c(steps=300, n_spk=16, n_utt=10):
    """Real GL partials + input normalization: does GE2E learn speaker
    structure, and does the norm-folding keep raw-feature inference
    bit-compatible?"""
    import jax.numpy as jnp
    from metatts_tpu.data.synthetic import (SyntheticVoices,
                                            SyntheticMelVocoder)
    from metatts_tpu.evaluation.ge2e_scratch import (
        train_ge2e, utterance_partial, _input_norm_stats, fold_input_norm,
        ge2e_init)
    from metatts_tpu.models.speaker_encoder import ge2e_embed

    corpus = SyntheticVoices(n_speakers=n_spk + 4, n_mels=8, seed=0)
    voc = SyntheticMelVocoder(n_mels=8, n_iters=24, seed=0)
    rng = np.random.RandomState(1)
    partials = {}
    t0 = time.time()
    for s in range(n_spk):
        batch = corpus.batch([s] * n_utt, rng)
        wavs = voc(np.asarray(batch.mels), np.asarray(batch.mel_lens))
        partials[s] = np.stack([utterance_partial(w, voc.sr) for w in wavs])
    print(f"[C] built {n_spk}x{n_utt} GL partials ({time.time()-t0:.0f}s)")

    # fold correctness on an untrained net
    mu, scale = _input_norm_stats(partials)
    p0 = ge2e_init(jax.random.PRNGKey(3), hidden=64, embed=64, layers=3)
    raw = jnp.asarray(partials[0][:4])
    normed = (raw - mu) * scale
    e_norm = ge2e_embed(p0["net"], normed)
    e_fold = ge2e_embed(fold_input_norm(p0, mu, scale)["net"], raw)
    err = float(jnp.abs(e_norm - e_fold).max())
    print(f"[C] fold max-abs err {err:.2e}")
    assert err < 1e-4, err

    t0 = time.time()
    params, trace = train_ge2e(partials, hidden=128, embed=128, steps=steps,
                               seed=0, verbose=False)
    print(f"[C] GL-partial GE2E: loss {trace[0]:.4f} -> min {min(trace):.4f}"
          f" -> final {trace[-1]:.4f}  ({time.time()-t0:.0f}s)")
    print("[C] trace every 25:", [round(v, 3) for v in trace[::25]])

    # holdout check: embed fresh utterances of 8 train speakers with the
    # FOLDED params on RAW features; same/diff cosine separation
    embs = {}
    for s in range(8):
        batch = corpus.batch([s] * 6, np.random.RandomState(900 + s))
        wavs = voc(np.asarray(batch.mels), np.asarray(batch.mel_lens))
        P = np.stack([utterance_partial(w, voc.sr) for w in wavs])
        embs[s] = np.asarray(ge2e_embed(params["net"], jnp.asarray(P)))
    same, diff = [], []
    for a in embs:
        for b in embs:
            sims = embs[a] @ embs[b].T
            if a == b:
                iu = np.triu_indices(len(sims), 1)
                same.extend(sims[iu].tolist())
            elif a < b:
                diff.extend(sims.ravel().tolist())
    print(f"[C] holdout-utterance cos: same {np.mean(same):.3f}+-"
          f"{np.std(same):.3f} vs diff {np.mean(diff):.3f}+-"
          f"{np.std(diff):.3f}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "abc"
    if "b" in which:
        probe_b()
    if "a" in which:
        probe_a(steps=400)
    if "c" in which:
        probe_c(steps=int(sys.argv[2]) if len(sys.argv) > 2 else 300)
