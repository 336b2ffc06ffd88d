"""Cross-lingual (adapt.type=lang) codebook path: per-episode phoneme table
regeneration + meta-gradients into the codebook banks."""

import numpy as np
import jax
import jax.numpy as jnp

from metatts_tpu.algorithms import get_system
from metatts_tpu.models.phoneme_embedding import (phoneme_embedding_init,
                                                  get_new_embedding)
from metatts_tpu.text.symbols import symbols
from helpers import (tiny_model_cfg, tiny_preprocess_cfg, tiny_train_cfg,
                     algorithm_cfg, synth_batch, STATS)


def lang_acfg():
    cfg = algorithm_cfg("meta")
    cfg["adapt"]["type"] = "lang"
    cfg["adapt"]["phoneme_emb"] = {
        "type": "codebook", "size": 16, "representation_dim": 12,
        "attention": {"type": "hard"}, "refresh": True,
    }
    return cfg


def test_codebook_hard_attention_table():
    mcfg = tiny_model_cfg()
    acfg = lang_acfg()
    p = phoneme_embedding_init(jax.random.PRNGKey(0), mcfg, acfg)
    vocab = len(symbols) + 1
    ref = np.zeros((vocab, 12), np.float32)
    ref[5] = np.random.RandomState(0).randn(12)
    ref[9] = np.random.RandomState(1).randn(12)
    table = get_new_embedding(p, jnp.asarray(ref), "hard")
    t = np.asarray(table)
    assert t.shape == (vocab, mcfg["transformer"]["encoder_hidden"])
    # rows with representations pick codebook entries; others are zero
    assert np.abs(t[5]).sum() > 0 and np.abs(t[9]).sum() > 0
    assert np.abs(t[4]).sum() == 0 and np.abs(t[0]).sum() == 0
    # picked rows come from emb_banks
    banks = np.asarray(p["emb_banks"])
    assert any(np.allclose(t[5], b) for b in banks)


def test_lang_meta_learn_grads_reach_codebook():
    sys = get_system("meta")(tiny_preprocess_cfg(), tiny_model_cfg(),
                             tiny_train_cfg(), lang_acfg(), stats=STATS,
                             n_speakers=4)
    assert "phn_emb_generator" in sys.params
    rng = np.random.RandomState(0)
    sup = synth_batch(rng, B=2)
    qry = synth_batch(rng, B=2)
    vocab = len(symbols) + 1
    ref = np.zeros((vocab, 12), np.float32)
    for pid in np.unique(np.asarray(sup.texts)):
        ref[pid] = rng.randn(12)
    ref = jnp.asarray(ref)

    def meta_loss(params):
        losses, _, _ = sys.adaptor.meta_learn(
            params, sys.state, sup, qry, steps=1, lr=1e-3, train=True,
            rng=jax.random.PRNGKey(0), phn_ref=ref)
        return losses.total

    g = jax.jit(jax.grad(meta_loss))(sys.params)
    gnorm = float(jnp.abs(g["phn_emb_generator"]["emb_banks"]).sum())
    assert np.isfinite(gnorm) and gnorm > 0


def test_lang_end_to_end_data_path(tmp_path):
    """Full cross-lingual pipeline: preprocess with representation emission
    -> dataset loads (L, d_feat) features -> datamodule builds per-episode
    phn_ref -> MetaSystem trains with per-episode table regeneration and
    the codebook banks move."""
    import sys
    sys.path.insert(0, "tests")
    from test_preprocess import _write_textgrid
    from metatts_tpu import config as C
    from metatts_tpu.preprocess.preprocessor import Preprocessor
    from metatts_tpu.preprocess.audio_io import save_wav
    from metatts_tpu.data import get_datamodule

    # tiny 2-speaker corpus with representations enabled
    SR = 22050
    raw = str(tmp_path / "raw")
    out = str(tmp_path / "pre")
    phones = ["HH", "AH0", "L", "OW1"]
    rng = np.random.RandomState(0)
    import os
    for spk, f0 in [("sa", 120.0), ("sb", 220.0)]:
        for u in range(5):
            t = np.arange(int(SR * 0.45)) / SR
            wav = 0.4 * np.sin(2 * np.pi * f0 * t) + 0.01 * rng.randn(len(t))
            d = os.path.join(raw, "train", spk)
            os.makedirs(d, exist_ok=True)
            save_wav(os.path.join(d, f"{spk}_u{u}.wav"),
                     wav.astype(np.float32), SR)
            open(os.path.join(d, f"{spk}_u{u}.lab"), "w").write("x")
            _write_textgrid(os.path.join(out, "TextGrid", spk,
                                         f"{spk}_u{u}.TextGrid"), phones)
    pcfg = C.deep_merge(C.PREPROCESS_DEFAULTS, {
        "dataset": "langsynth",
        "path": {"raw_path": raw, "preprocessed_path": out},
        "subsets": {"train": "train", "val": "train", "test": "train"},
        "preprocessing": {"representation": {"enabled": True},
                          "mel": {"n_mel_channels": 8}},
    })
    Preprocessor(pcfg).build_from_path()

    # dataset exposes representations aligned to phones
    from metatts_tpu.data import TTSDataset
    ds = TTSDataset("train.txt", pcfg)
    s = ds[0]
    assert "representation" in s
    assert s["representation"].shape == (len(s["text"]), 8)

    # lang meta system end-to-end
    acfg = lang_acfg()
    acfg["adapt"]["phoneme_emb"]["representation_dim"] = 8
    acfg["adapt"]["train"].update(shots=2, queries=2, steps=1,
                                  meta_batch_size=2)
    acfg["adapt"]["test"].update(shots=2, queries=2)
    mcfg = tiny_model_cfg()
    tcfg = tiny_train_cfg()
    sys_ = get_system("meta")(pcfg, mcfg, tcfg, acfg, stats=STATS,
                              n_speakers=2)
    dm = get_datamodule("meta")([pcfg], tcfg, acfg,
                                log_dir=str(tmp_path))
    dm.setup()
    gen = dm.train_episode_batches(2)
    banks0 = np.asarray(sys_.params["phn_emb_generator"]["emb_banks"]).copy()
    for _ in range(3):
        sup, qry, _, _, phn_ref = next(gen)
        assert phn_ref.shape[0] == 2            # episodes
        losses = sys_.train_step(sup, qry, phn_ref=phn_ref)
    assert np.isfinite(float(losses.total))
    banks1 = np.asarray(sys_.params["phn_emb_generator"]["emb_banks"])
    assert not np.allclose(banks0, banks1), "codebook banks did not train"
