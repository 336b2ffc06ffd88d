"""Cross-lingual episode extras (reference ``LanguageTaskCollate``,
``lightning/collate.py:199-300``).

For ``adapt.type == "lang"`` episodes the support set provides SSL phoneme
representations; the collate builds a per-episode (vocab, d_feat) matrix by
averaging each phoneme's representation over its occurrences in the support
utterances.  The codebook PhonemeEmbedding turns that matrix into a fresh
``src_word_emb`` table before the inner loop (``meta.py:24-33``).

Datasets provide per-utterance representations as
``representation/<spk>-representation-<base>.npy`` with shape (L, d_feat)
aligned to the phone sequence (the reference precomputes these offline from
an SSL model).
"""

import os

import numpy as np

from ..text.symbols import symbols


def load_representation(preprocessed_path, speaker, basename):
    p = os.path.join(preprocessed_path, "representation",
                     f"{speaker}-representation-{basename}.npy")
    return np.load(p) if os.path.exists(p) else None


def episode_phoneme_representation(samples, d_feat=None):
    """Average SSL representations per phoneme ID over the episode's
    support samples -> (vocab, d_feat) with zero rows for absent phonemes."""
    vocab = len(symbols) + 1
    if d_feat is None:
        for s in samples:
            if s.get("representation") is not None:
                d_feat = s["representation"].shape[-1]
                break
        if d_feat is None:
            raise ValueError(
                "adapt.type=lang needs per-phoneme representations, but no "
                "episode sample carries one. Re-run preprocessing with "
                "`preprocessing: {representation: {enabled: true}}` or drop "
                "SSL features into <preprocessed_path>/representation/ as "
                "<spk>-representation-<base>.npy (L, d_feat).")
    acc = np.zeros((vocab, d_feat), np.float64)
    cnt = np.zeros((vocab,), np.int64)
    for s in samples:
        rep = s.get("representation")
        if rep is None:
            continue
        ids = s["text"][: rep.shape[0]]
        for i, pid in enumerate(ids):
            acc[pid] += rep[i]
            cnt[pid] += 1
    out = np.zeros((vocab, d_feat), np.float32)
    nz = cnt > 0
    out[nz] = (acc[nz] / cnt[nz, None]).astype(np.float32)
    out[0] = 0.0  # PAD
    return out


def split_disjoint_phonemes(sup_samples, qry_samples, rng=None):
    """The reference splits episode phonemes so support and query use
    disjoint phoneme subsets (``collate.py:199-300``): returns boolean
    keep-masks over each sample's phone sequence."""
    rng = rng or np.random.RandomState(0)
    sup_phones = set()
    for s in sup_samples:
        sup_phones.update(int(p) for p in s["text"])
    qry_phones = set()
    for s in qry_samples:
        qry_phones.update(int(p) for p in s["text"])
    shared = sorted(sup_phones & qry_phones)
    to_sup = set()
    for p in shared:
        if rng.rand() < 0.5:
            to_sup.add(p)
    sup_keep = sup_phones - (set(shared) - to_sup)
    qry_keep = qry_phones - to_sup
    sup_masks = [np.isin(s["text"], sorted(sup_keep)) for s in sup_samples]
    qry_masks = [np.isin(s["text"], sorted(qry_keep)) for s in qry_samples]
    return sup_masks, qry_masks
