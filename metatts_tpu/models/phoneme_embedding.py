"""Codebook phoneme embedding for cross-lingual adaptation
(reference ``lightning/model/phoneme_embedding.py:18-141``).

For ``adapt.type == "lang"`` episodes, the encoder's phoneme embedding table
is regenerated per episode from support-set SSL phoneme representations:

  hard attention: cosine-nearest att_bank row -> one-hot pick of emb_bank;
  soft attention: scaled-dot attention with Q=W_q(ref), K=W_k(att_banks),
                  V=emb_banks.

``get_new_embedding`` returns a fresh (vocab, d) table to substitute for
``params["encoder"]["src_word_emb"]["table"]`` before the inner loop
(the reference's ``on_after_batch_transfer`` refresh, ``meta.py:24-33``).
"""

import jax
import jax.numpy as jnp
import numpy as np

from . import nn
from ..text.symbols import symbols


def phoneme_embedding_init(rng, model_cfg, algorithm_cfg):
    pe = algorithm_cfg["adapt"]["phoneme_emb"]
    if pe["type"] != "codebook":
        return None
    d = model_cfg["transformer"]["encoder_hidden"]
    size = pe["size"]
    att = pe.get("attention", {"type": "hard"})
    d_feat = pe.get("representation_dim", d)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    params = {"emb_banks": jax.random.normal(k1, (size, d), jnp.float32)}
    if att["type"] == "hard":
        params["att_banks"] = jax.random.normal(k2, (size, d_feat),
                                                jnp.float32)
    else:
        params["att_banks"] = jax.random.normal(k2, (size, d), jnp.float32)
        params["w_qs"] = nn.linear_init(k3, d_feat, d)
        params["w_ks"] = nn.linear_init(k4, d, d)
    return params


def get_new_embedding(params, ref, attention_type="hard"):
    """ref: (vocab, d_feat) SSL phoneme representations (zero rows for
    phonemes absent from the support set) -> (vocab, d) embedding table."""
    if attention_type == "hard":
        ref_norm = jnp.linalg.norm(ref, axis=1, keepdims=True)
        has = (ref_norm[:, 0] > 0)
        normed_ref = ref / jnp.maximum(ref_norm, 1e-8)
        banks = params["att_banks"]
        normed_banks = banks / jnp.maximum(
            jnp.linalg.norm(banks, axis=1, keepdims=True), 1e-8)
        sim = normed_ref @ normed_banks.T                  # (vocab, size)
        pick = jnp.argmax(sim, axis=1)
        table = jax.lax.stop_gradient(
            jax.nn.one_hot(pick, banks.shape[0])) @ params["emb_banks"]
        table = jnp.where(has[:, None], table, 0.0)
        return table.at[0].set(0.0)                        # PAD row
    # soft attention
    d = params["emb_banks"].shape[1]
    q = nn.linear(params["w_qs"], ref)                     # (vocab, d)
    k = nn.linear(params["w_ks"], params["att_banks"])     # (size, d)
    scores = (q @ k.T) / np.sqrt(d)
    attn = jax.nn.softmax(scores, axis=-1)
    table = attn @ params["emb_banks"]
    return table.at[0].set(0.0)


def vocab_size():
    return len(symbols) + 1
