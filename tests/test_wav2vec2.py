"""JAX-native wav2vec2 vs a transformers build of the official layout.

The reference's SSL pseudo-MOS scorer family builds on wav2vec2-base
(reference ``evaluation/compute_mos.py:205,320``; published rows in
``evaluation/txt/LibriTTS/wav2vec2.txt``).  Real weights are
environment-blocked, so this test (a) builds a small ``Wav2Vec2Model`` with
the official HuggingFace layout (random init — the architecture contract is
what's under test), (b) converts it with ``tools/convert_torch_weights.py
convert_wav2vec2_pt``, and (c) asserts the JAX forward matches transformers
— so the real checkpoint (and any MOS-head finetune of it) is a file drop,
exactly the ``tests/test_mbnet.py`` pattern."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64, conv_dim=(12, 12, 16),
            conv_stride=(5, 2, 2), conv_kernel=(10, 3, 3),
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
            feat_extract_norm="group", do_stable_layer_norm=False,
            hidden_act="gelu", feat_extract_activation="gelu",
            hidden_dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0, feat_proj_dropout=0.0, layerdrop=0.0,
            apply_spec_augment=False)


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(11)
    cfg = transformers.Wav2Vec2Config(**TINY)
    return transformers.Wav2Vec2Model(cfg).eval()


@pytest.fixture(scope="module")
def converted(hf_model, tmp_path_factory):
    d = tmp_path_factory.mktemp("w2v2")
    torch.save(hf_model.state_dict(), str(d / "pytorch_model.bin"))
    hf_model.config.to_json_file(str(d / "config.json"))
    from convert_torch_weights import convert_wav2vec2_pt
    npz = str(d / "w2v2.npz")
    convert_wav2vec2_pt(str(d), npz)
    return npz


def test_converter_layout(converted):
    z = np.load(converted)
    cfg = json.loads(str(z["config"]))
    assert cfg["conv_stride"] == [5, 2, 2]
    assert cfg["num_hidden_layers"] == 2
    # conv kernels are WIO
    assert z["conv0.kernel"].shape == (10, 1, 12)
    assert z["conv0.gn.scale"].shape == (12,)
    # grouped positional conv: (k, in/groups, out)
    assert z["pos_conv.kernel"].shape == (16, 32 // 4, 32)
    # linear kernels are (in, out)
    assert z["proj.kernel"].shape == (16, 32)
    assert z["layer0.ff_in.kernel"].shape == (32, 64)
    assert "head.kernel" not in z.files


def test_encode_matches_transformers(hf_model, converted):
    from metatts_tpu.evaluation.wav2vec2 import load_params, encode

    rng = np.random.default_rng(5)
    wav = rng.standard_normal((2, 2000), np.float32) * 0.1
    with torch.no_grad():
        want = hf_model(torch.tensor(wav)).last_hidden_state.numpy()
    got = np.asarray(encode(load_params(converted), wav))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_head_export_and_calibrated_score(hf_model, tmp_path):
    """A finetuned SSL-MOS checkpoint = base weights + a (1, H) regression
    head; the converter must export it and the scorer must use it."""
    from convert_torch_weights import convert_wav2vec2_pt
    from metatts_tpu.evaluation.wav2vec2 import (Wav2Vec2Scorer, encode,
                                                 load_params)

    sd = dict(hf_model.state_dict())
    torch.manual_seed(3)
    sd["head.weight"] = torch.randn(1, TINY["hidden_size"]) * 0.1
    sd["head.bias"] = torch.tensor([3.0])
    pt = str(tmp_path / "mos_ft.pt")
    cfg_json = str(tmp_path / "config.json")
    hf_model.config.to_json_file(cfg_json)
    torch.save(sd, pt)
    npz = str(tmp_path / "w2v2_mos.npz")
    convert_wav2vec2_pt(pt, npz, config_json=cfg_json)

    scorer = Wav2Vec2Scorer(npz, bucket=False)
    assert scorer.calibrated
    rng = np.random.default_rng(1)
    wav = rng.standard_normal(3200).astype(np.float32) * 0.1
    s = scorer.score(wav, 16000)
    # manual check: normalized wav -> encode -> mean pool -> head
    wn = (wav - wav.mean()) / (wav.std() + 1e-7)
    p = load_params(npz)
    pooled = np.asarray(encode(p, wn[None])).mean(axis=1)
    want = float((pooled @ np.asarray(p["head"]["kernel"])
                  + np.asarray(p["head"]["bias"])).item())
    assert abs(s - want) < 1e-3


def test_bucketed_scorer_compile_sharing(hf_model, converted):
    """Default (bucketed) scorer: distinct wav lengths inside one bucket
    share a single padded shape — the whole corpus traces a handful of
    programs — and the valid-frame-masked score stays close to the exact
    unbucketed one (exactness is impossible: the zero-pad still enters the
    conv GroupNorm and the unmasked attention by architecture)."""
    from metatts_tpu.evaluation.wav2vec2 import Wav2Vec2Scorer

    bucketed = Wav2Vec2Scorer(converted)
    exact = Wav2Vec2Scorer(converted, bucket=False)
    rng = np.random.default_rng(2)
    lens = [3200, 4000, 5000, 17000]
    shapes = set()
    for n in lens:
        wav = rng.standard_normal(n).astype(np.float32) * 0.1
        sb = bucketed.score(wav, 16000)
        se = exact.score(wav, 16000)
        assert 1.0 <= sb <= 5.0 and abs(sb - se) < 0.5, (n, sb, se)
        shapes.add(bucketed._bucket_len(n))
    # 3200/4000/5000 all land in the 1 s floor bucket; 17000 in the next
    assert len(shapes) == 2, shapes


def test_scorer_registration_and_resample(converted):
    from metatts_tpu.evaluation import mos

    assert mos.try_register_wav2vec2_native(converted)
    assert "wav2vec2" in mos.available_scorers()
    sr = 22050
    t = np.arange(sr // 4) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    s = mos.score("wav2vec2", wav, sr)   # exercises the resample path
    assert np.isfinite(s) and 1.0 <= s <= 5.0
