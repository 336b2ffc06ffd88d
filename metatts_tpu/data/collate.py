"""Collate: sample dicts -> static-shape Batch pytrees.

Replaces the reference 12-tuple collate (``lightning/collate.py``) with the
typed ``models.fastspeech2.Batch``.  Shapes are bucketed (text and mel
lengths rounded up to fixed multiples) so XLA compiles one program per
bucket instead of per raw length.
"""

import numpy as np
import jax.numpy as jnp

from ..models.fastspeech2 import Batch
from ..utils.tools import pad_1d, pad_2d, bucket_length

TEXT_BUCKET = 32
MEL_BUCKET = 128

# Wire dtype for mel TARGETS (train.transfer_mel_dtype).  Mels dominate the
# per-step host->device bytes (a 5-shot/5-query base episode ships ~3 MB of
# fp32 mels); through the remote-TPU tunnel (~12-16 MB/s) that H2D is ~214
# ms against a 151 ms compute step — the measured sustained-fit gap
# (tools/bench_sustained_fit.py, p50 207 ms).  "auto" transfers bf16 on TPU
# (halves the bytes so the prefetched transfer hides under compute; the
# loss upcasts targets to fp32 — models/loss.py — and the model already
# computes bf16 activations by default) and fp32 elsewhere; set "float32"
# for exact-precision targets (parity work).
_MEL_TRANSFER_DTYPE = "auto"


def set_mel_transfer_dtype(spec):
    """Set the process-wide mel wire dtype: "auto" | "float32" | "bfloat16".

    Called by ``Trainer.__init__`` from ``train.transfer_mel_dtype``."""
    global _MEL_TRANSFER_DTYPE
    _MEL_TRANSFER_DTYPE = spec or "auto"


def _mel_transfer_dtype():
    if _MEL_TRANSFER_DTYPE == "auto":
        from ..utils.backend import is_tpu
        return jnp.bfloat16 if is_tpu() else jnp.float32
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
            "bf16": jnp.bfloat16}[str(_MEL_TRANSFER_DTYPE)]


class CollateMeta:
    """Host-side companion of a Batch (ids / raw text, not traced)."""

    def __init__(self, ids, raw_texts, speakers):
        self.ids = ids
        self.raw_texts = raw_texts
        self.speakers = speakers


def collate_batch(samples, max_seq_len=1000, with_mels=True,
                  text_bucket=TEXT_BUCKET, mel_bucket=MEL_BUCKET,
                  fixed_text_len=None, fixed_mel_len=None,
                  fixed_slices=None):
    """List of dataset sample dicts -> (Batch, CollateMeta)."""
    src_lens = np.array([len(s["text"]) for s in samples], np.int32)
    L = fixed_text_len or bucket_length(int(src_lens.max()), text_bucket)
    texts = pad_1d([s["text"] for s in samples], L).astype(np.int32)

    speaker_ids = np.array([s["speaker"] for s in samples], np.int32)
    if "spk_ref_mel_slices" in samples[0]:
        max_slices = fixed_slices or max(
            s["spk_ref_mel_slices"].shape[0] for s in samples)
        S, T40, C40 = (max_slices,) + samples[0]["spk_ref_mel_slices"].shape[1:]
        ref = np.zeros((len(samples), S, T40, C40), np.float32)
        valid = np.zeros((len(samples), S), bool)
        for i, s in enumerate(samples):
            k = s["spk_ref_mel_slices"].shape[0]
            ref[i, :k] = s["spk_ref_mel_slices"]
            valid[i, :k] = True
        speaker_args = (jnp.asarray(ref), jnp.asarray(valid))
    else:
        speaker_args = jnp.asarray(speaker_ids)

    meta = CollateMeta([s["id"] for s in samples],
                       [s["raw_text"] for s in samples], speaker_ids)

    if not with_mels or "mel" not in samples[0]:
        return Batch(speaker_args=speaker_args,
                     texts=jnp.asarray(texts),
                     src_lens=jnp.asarray(src_lens)), meta

    mel_lens = np.array([s["mel"].shape[0] for s in samples], np.int32)
    T = fixed_mel_len or bucket_length(int(mel_lens.max()), mel_bucket,
                                       max_seq_len)
    mel_lens = np.minimum(mel_lens, T)
    mels = pad_2d([s["mel"] for s in samples], T)
    pitches = pad_1d([s["pitch"] for s in samples],
                     L if samples[0]["pitch"].shape[0] == len(samples[0]["text"])
                     else T)
    energies = pad_1d([s["energy"] for s in samples],
                      L if samples[0]["energy"].shape[0] == len(samples[0]["text"])
                      else T)
    durations = pad_1d([s["duration"] for s in samples], L).astype(np.int32)
    # clamp durations so cumulative length fits the mel bucket
    durations = _clamp_durations(durations, mel_lens)

    return Batch(
        speaker_args=speaker_args,
        texts=jnp.asarray(texts),
        src_lens=jnp.asarray(src_lens),
        mels=jnp.asarray(mels, dtype=_mel_transfer_dtype()),
        mel_lens=jnp.asarray(mel_lens),
        p_targets=jnp.asarray(pitches),
        e_targets=jnp.asarray(energies),
        d_targets=jnp.asarray(durations),
    ), meta


def _clamp_durations(durations, mel_lens):
    """Ensure sum(d) == mel_len per sample (mel may be truncated to bucket)."""
    out = durations.copy()
    for i in range(out.shape[0]):
        cum = np.cumsum(out[i])
        over = cum > mel_lens[i]
        if over.any():
            j = int(np.argmax(over))
            prev = cum[j] - out[i, j]
            out[i, j] = mel_lens[i] - prev
            out[i, j + 1:] = 0
    return out


def collate_episode(sup_samples_list, qry_samples_list, max_seq_len=1000):
    """Lists of per-episode sample lists -> (sup Batch[E,...], qry Batch[E,...]).

    All episodes share one shape bucket (max over the meta-batch) so the
    meta step compiles once per bucket.
    """
    import jax

    all_samples = [s for ep in sup_samples_list for s in ep] + \
                  [s for ep in qry_samples_list for s in ep]
    L = bucket_length(max(len(s["text"]) for s in all_samples), TEXT_BUCKET)
    T = bucket_length(max(s["mel"].shape[0] for s in all_samples),
                      MEL_BUCKET, max_seq_len)
    # dvec/encoder modes: slice counts are ragged per utterance; share the
    # max across the whole meta-batch or the per-episode stacks disagree
    S = (max(s["spk_ref_mel_slices"].shape[0] for s in all_samples)
         if "spk_ref_mel_slices" in all_samples[0] else None)

    def stack(eps):
        batches, metas = [], []
        for ep in eps:
            b, m = collate_batch(ep, max_seq_len, fixed_text_len=L,
                                 fixed_mel_len=T, fixed_slices=S)
            batches.append(b)
            metas.append(m)
        return jax.tree.map(lambda *xs: jnp.stack(xs), *batches), metas

    sup, sup_meta = stack(sup_samples_list)
    qry, qry_meta = stack(qry_samples_list)
    return sup, qry, sup_meta, qry_meta


def split_batch(batch, indices):
    """Re-slice a collated Batch by sample indices (reference
    ``split_reprocess``, ``lightning/collate.py:63-126``) — used for
    inner-loop minibatching over a support set."""
    import jax

    idx = jnp.asarray(indices)
    return jax.tree.map(lambda x: x[idx], batch)
