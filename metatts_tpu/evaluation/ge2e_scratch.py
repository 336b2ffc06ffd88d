"""Scratch-trained GE2E speaker verifier.

The reference never trains its verifier — it loads resemblyzer's pretrained
GE2E VoiceEncoder (``evaluation/wavs_to_dvector.py:18``).  Pretrained
weights are environment-blocked here, so this module trains the SAME
architecture (``models.speaker_encoder``: stacked LSTM -> linear -> relu ->
L2 norm) from scratch with the GE2E softmax contrastive loss (Wan et al.
2018, the loss resemblyzer's weights were trained with), producing a
self-consistent verifier for EER-space evaluation — the missing link that
lets ``tools/exp_meta_eer.py`` reproduce the reference's
EER-vs-adaptation-steps headline without external downloads.

The trained weights export to the resemblyzer npz layout, so
``evaluation.dvector.DVectorEncoder`` (and therefore ``evaluate.py``) loads
them exactly like converted official weights — the whole evaluation stack
downstream of the verifier is byte-identical between scratch and pretrained
weights.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models import nn
from ..models.speaker_encoder import ge2e_embed
from ..preprocess.refmel import (preprocess_ref_wav, wav_to_mel40,
                                 tile_to_min_length,
                                 PARTIALS_N_FRAMES, MEL_N_CHANNELS)


def ge2e_init(rng, mel_channels=MEL_N_CHANNELS, hidden=256, embed=256,
              layers=3):
    """GE2E net + the loss's learned similarity scale (w, b); resemblyzer
    initializes w=10, b=-5 (Wan et al. §2.1)."""
    k1, k2 = jax.random.split(rng)
    return {
        "net": {"lstm": nn.lstm_init(k1, mel_channels, hidden, layers),
                "linear": nn.linear_init(k2, hidden, embed)},
        "sim_w": jnp.asarray(10.0),
        "sim_b": jnp.asarray(-5.0),
    }


def ge2e_softmax_loss(params, batch):
    """GE2E softmax loss over a (N speakers, M utterances, T, C) mel batch.

    sim[j, i, k] = w * cos(e_ji, c_k) + b, with the own-speaker entry using
    the leave-one-out centroid (Wan et al. eq. 8-9); loss = mean over (j, i)
    of -log softmax_k sim[j, i, :] at k = j.
    """
    N, M, T, C = batch.shape
    e = ge2e_embed(params["net"], batch.reshape(N * M, T, C))
    e = e.reshape(N, M, -1)                              # unit-norm vectors
    # sqrt(sum+eps) normalization (not linalg.norm/maximum): norm's VJP at
    # an exact-zero vector is NaN — see ge2e_embed
    unit = lambda v: v / jnp.sqrt(
        jnp.sum(v * v, axis=-1, keepdims=True) + 1e-12)
    cent = unit(e.mean(axis=1))                          # (N, D) inclusive
    # leave-one-out centroid for the own-speaker similarity
    excl = unit((e.sum(axis=1, keepdims=True) - e) / (M - 1))  # (N, M, D)
    w = jnp.maximum(params["sim_w"], 1e-6)               # keep scale positive
    sim = w * jnp.einsum("jid,kd->jik", e, cent) + params["sim_b"]
    own = w * jnp.einsum("jid,jid->ji", e, excl) + params["sim_b"]
    eye = jnp.eye(N)[:, None, :]                         # (N, 1, N)
    sim = sim * (1 - eye) + own[..., None] * eye
    logp = jax.nn.log_softmax(sim, axis=-1)
    own_logp = jnp.sum(logp * jnp.eye(N)[:, None, :], axis=-1)   # (N, M)
    return -jnp.mean(own_logp)


def utterance_partial(wav, sr, frames=PARTIALS_N_FRAMES):
    """One (frames, 40) mel partial per utterance: resemblyzer frontend
    (resample/normalize/VAD-trim, LOOP short audio to one full partial ->
    40-mel), leading ``frames`` frames — train-time features match what
    ``DVectorEncoder.embed_utterance`` feeds the net at eval time.  Looping
    replaces zero-padding because a silent tail collapses the LSTM's
    final-hidden readout to an input-independent fixed point
    (``refmel.tile_to_min_length``)."""
    wav = preprocess_ref_wav(np.asarray(wav, np.float32), sr)
    wav = tile_to_min_length(wav)
    mel = wav_to_mel40(wav)
    if mel.shape[0] >= frames:
        start = (mel.shape[0] - frames) // 2
        return mel[start:start + frames].astype(np.float32)
    return np.pad(mel, ((0, frames - mel.shape[0]), (0, 0))).astype(
        np.float32)


def _input_norm_stats(partials_by_speaker):
    """Per-channel (mean, scale) standardizing the training features.

    Raw resemblyzer-convention features are LINEAR mel magnitudes of
    -30 dBFS audio — std ~1e-2, which parks a fresh GE2E net on the
    uniform-softmax plateau (all embeddings identical, loss pinned at
    ln(N), gradients cancel; measured in tools/probe_ge2e_training.py:
    O(1)-scale inputs train to ~0 loss in 25 steps, raw-scale inputs do
    not move in 40).  Per-channel scales are floored at 10% of the median
    channel std so near-silent high-mel channels don't amplify noise.
    """
    flat = np.concatenate([p.reshape(-1, p.shape[-1])
                           for p in partials_by_speaker.values()])
    mu = flat.mean(axis=0)
    std = flat.std(axis=0)
    floor = max(1e-4, 0.1 * float(np.median(std)))
    return mu.astype(np.float32), (1.0 / np.maximum(std, floor)).astype(
        np.float32)


def fold_input_norm(params, mu, scale):
    """Fold ``x -> (x - mu) * scale`` into the layer-0 LSTM weights, so the
    returned params compute the trained function directly on RAW features:
    gates = ((x-mu)*s) @ W + b  ==  x @ (s[:,None]*W) + (b - (mu*s) @ W).
    This keeps the npz export loadable by ``evaluation.dvector
    .DVectorEncoder`` with zero eval-path changes."""
    l0 = params["net"]["lstm"]["layers"][0]
    w = np.asarray(l0["w_ih"])
    folded = dict(l0)
    folded["w_ih"] = jnp.asarray(scale[:, None] * w)
    folded["b_ih"] = l0["b_ih"] - jnp.asarray((mu * scale) @ w)
    out = jax.tree.map(lambda x: x, params)  # shallow-ish copy
    out["net"]["lstm"]["layers"] = (
        [folded] + list(params["net"]["lstm"]["layers"][1:]))
    return out


def train_ge2e(partials_by_speaker, *, hidden=256, embed=256, layers=3,
               steps=300, lr=1e-3, n_speakers_per_batch=8,
               m_utts_per_speaker=4, seed=0, log_every=50, verbose=False,
               normalize=True):
    """Train a scratch GE2E verifier.

    partials_by_speaker: dict speaker -> (n_utt, frames, 40) float32 — use
    :func:`utterance_partial` to build it from wavs.  Returns
    ``(params, trace)`` where trace is the per-step loss list.  With
    ``normalize`` (default) training runs on standardized features and the
    normalization is FOLDED into the returned layer-0 weights
    (:func:`fold_input_norm`), so the returned/exported net consumes raw
    resemblyzer-convention features bit-compatibly.
    """
    speakers = sorted(partials_by_speaker)
    assert len(speakers) >= n_speakers_per_batch, (
        f"need >= {n_speakers_per_batch} speakers, got {len(speakers)}")
    mel_c = next(iter(partials_by_speaker.values())).shape[-1]
    if normalize:
        mu, scale = _input_norm_stats(partials_by_speaker)
        partials_by_speaker = {
            s: ((p - mu) * scale).astype(np.float32)
            for s, p in partials_by_speaker.items()}
    params = ge2e_init(jax.random.PRNGKey(seed), mel_channels=mel_c,
                       hidden=hidden, embed=embed, layers=layers)
    tx = optax.chain(optax.clip_by_global_norm(3.0), optax.adam(lr))
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, batch):
        loss, grads = jax.value_and_grad(ge2e_softmax_loss)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(seed + 1)
    trace = []
    # return the best-loss params, not the last: a VERIFIER wants the
    # best contrastive optimum, and late GE2E training wobbles (loss
    # 0.006 -> 0.13 over 10 steps measured at this scale); also stop if
    # the loss ever goes non-finite instead of training on garbage
    best_loss, best_params = np.inf, params
    for it in range(steps):
        spk = rng.choice(len(speakers), size=n_speakers_per_batch,
                         replace=False)
        batch = np.stack([
            partials_by_speaker[speakers[j]][
                rng.choice(len(partials_by_speaker[speakers[j]]),
                           size=m_utts_per_speaker,
                           replace=len(partials_by_speaker[speakers[j]])
                           < m_utts_per_speaker)]
            for j in spk])
        params, opt_state, loss = step_fn(params, opt_state,
                                          jnp.asarray(batch))
        trace.append(float(loss))
        if not np.isfinite(trace[-1]):
            import warnings
            warnings.warn(f"GE2E loss went non-finite at step {it}; "
                          "stopping and returning the best params so far")
            break
        if trace[-1] < best_loss:
            best_loss = trace[-1]
            best_params = jax.tree.map(lambda x: x, params)
        if verbose and (it % log_every == 0 or it == steps - 1):
            print(f"[ge2e] step {it:4d} loss {trace[-1]:.4f}", flush=True)
    params = best_params
    if normalize:
        params = fold_input_norm(params, mu, scale)
    return params, trace


def save_ge2e_npz(params, path):
    """Export to the resemblyzer state-dict npz layout
    (``evaluation.dvector.DVectorEncoder._from_npz`` keys: torch-shaped
    ``lstm.weight_ih_l{k}`` (4H, in) etc.), so the standard evaluation
    stack loads scratch weights exactly like converted official ones."""
    from ..models.speaker_encoder import GE2E_LAYERS
    assert len(params["net"]["lstm"]["layers"]) == GE2E_LAYERS, (
        "DVectorEncoder loads exactly GE2E_LAYERS stacked LSTMs "
        f"({GE2E_LAYERS}); train with layers={GE2E_LAYERS}")
    arrs = {}
    for k, layer in enumerate(params["net"]["lstm"]["layers"]):
        arrs[f"lstm.weight_ih_l{k}"] = np.asarray(layer["w_ih"]).T
        arrs[f"lstm.weight_hh_l{k}"] = np.asarray(layer["w_hh"]).T
        arrs[f"lstm.bias_ih_l{k}"] = np.asarray(layer["b_ih"])
        arrs[f"lstm.bias_hh_l{k}"] = np.asarray(layer["b_hh"])
    arrs["linear.weight"] = np.asarray(params["net"]["linear"]["w"]).T
    arrs["linear.bias"] = np.asarray(params["net"]["linear"]["b"])
    np.savez(path, **arrs)
    return path
