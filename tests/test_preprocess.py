import json
import os

import numpy as np
import pytest

from metatts_tpu.preprocess.textgrid import read_textgrid
from metatts_tpu.preprocess.preprocessor import Preprocessor
from metatts_tpu.preprocess.pitch import yin_f0
from metatts_tpu.preprocess.audio_io import save_wav, load_wav
from metatts_tpu.data import TTSDataset, EpisodeSampler, get_datamodule
from metatts_tpu.data.collate import collate_batch, collate_episode
from metatts_tpu import config as C

REF_TG = ("/root/reference/preprocessed_data/example_corpus/TextGrid/"
          "speaker1/speaker1_utterance1.TextGrid")

SR = 22050
HOP = 256


def _write_textgrid(path, phones, sec_per_phone=0.12):
    """Emit a long-form TextGrid with a phones tier."""
    t = 0.0
    items = []
    for p in phones:
        items.append((t, t + sec_per_phone, p))
        t += sec_per_phone
    xmax = t
    lines = [
        'File type = "ooTextFile"', 'Object class = "TextGrid"', "",
        "xmin = 0.0", f"xmax = {xmax}", "tiers? <exists>", "size = 1",
        "item []:", "\titem [1]:", '\t\tclass = "IntervalTier"',
        '\t\tname = "phones"', "\t\txmin = 0.0", f"\t\txmax = {xmax}",
        f"\t\tintervals: size = {len(items)}",
    ]
    for i, (s, e, p) in enumerate(items):
        lines += [f"\t\tintervals [{i+1}]:", f"\t\t\txmin = {s}",
                  f"\t\t\txmax = {e}", f'\t\t\ttext = "{p}"']
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Synthetic 2-speaker corpus: harmonic tones with per-speaker f0."""
    root = tmp_path_factory.mktemp("corpus")
    raw = root / "raw_data"
    out = root / "preprocessed"
    phones = ["HH", "AH0", "sp", "L", "OW1"]
    rng = np.random.RandomState(0)
    for spk, f0 in [("spk_a", 120.0), ("spk_b", 220.0)]:
        for u in range(6):
            base = f"{spk}_utt{u}"
            dur = 0.12 * len(phones) + 0.1
            t = np.arange(int(SR * dur)) / SR
            f = f0 * (1 + 0.05 * np.sin(2 * np.pi * (u + 1) * t))
            wav = 0.4 * np.sin(2 * np.pi * np.cumsum(f) / SR)
            wav += 0.1 * np.sin(2 * np.pi * 2 * np.cumsum(f) / SR)
            wav += 0.01 * rng.randn(len(t))
            d = raw / "train" / spk
            os.makedirs(d, exist_ok=True)
            save_wav(str(d / f"{base}.wav"), wav.astype(np.float32), SR)
            (d / f"{base}.lab").write_text("hello")
            _write_textgrid(str(out / "TextGrid" / spk /
                                f"{base}.TextGrid"), phones)
    cfg = C.deep_merge(C.PREPROCESS_DEFAULTS, {
        "dataset": "synth",
        "path": {"raw_path": str(raw), "preprocessed_path": str(out)},
        "subsets": {"train": "train", "val": "train", "test": "train"},
    })
    pre = Preprocessor(cfg)
    outs = pre.build_from_path()
    return cfg, outs


def test_reference_textgrid_parses():
    tg = read_textgrid(REF_TG)
    phones = tg.get_tier_by_name("phones")
    assert len(phones.intervals) == 15
    words = tg.get_tier_by_name("words")
    assert words.intervals[0].text == "tom"
    assert abs(words.intervals[0].end_time - 0.36) < 1e-9


def test_preprocessor_artifacts(corpus):
    cfg, outs = corpus
    out = cfg["path"]["preprocessed_path"]
    assert len(outs["train"]) == 12
    stats = json.load(open(os.path.join(out, "stats.json")))
    assert len(stats["pitch"]) == 4 and len(stats["energy"]) == 4
    speakers = json.load(open(os.path.join(out, "speakers.json")))
    assert set(speakers) == {"spk_a", "spk_b"}
    # per-utterance artifacts exist and are aligned
    line = outs["train"][0]
    base, spk, text, raw = line.split("|")
    dur = np.load(os.path.join(out, "duration", f"{spk}-duration-{base}.npy"))
    pitch = np.load(os.path.join(out, "pitch", f"{spk}-pitch-{base}.npy"))
    mel = np.load(os.path.join(out, "mel", f"{spk}-mel-{base}.npy"))
    assert len(pitch) == len(dur)           # phoneme-level averaging
    assert mel.shape == (dur.sum(), 80)
    assert text.startswith("{") and "sp" in text
    # normalized pitch ~ zero-mean across corpus
    assert abs(stats["pitch"][2]) > 0       # raw mean saved
    slices = np.load(os.path.join(out, "spk_ref_mel_slices",
                                  f"{spk}-mel-{base}.npy"))
    assert slices.ndim == 3 and slices.shape[1:] == (160, 40)


def test_pitch_separates_speakers(corpus):
    cfg, outs = corpus
    out = cfg["path"]["preprocessed_path"]
    stats = json.load(open(os.path.join(out, "stats.json")))
    mean, std = stats["pitch"][2], stats["pitch"][3]
    by_spk = {}
    for line in outs["train"]:
        base, spk, _, _ = line.split("|")
        p = np.load(os.path.join(out, "pitch", f"{spk}-pitch-{base}.npy"))
        by_spk.setdefault(spk, []).append((p * std + mean).mean())
    assert np.mean(by_spk["spk_a"]) < np.mean(by_spk["spk_b"])
    assert 100 < np.mean(by_spk["spk_a"]) < 140
    assert 190 < np.mean(by_spk["spk_b"]) < 250


def _voiced_test_signal(sr=22050):
    """Harmonic 150 Hz tone (2% vibrato) between two noise segments."""
    t = np.arange(int(sr * 1.2)) / sr
    f0 = 150 * (1 + 0.02 * np.sin(2 * np.pi * 3 * t))
    phase = 2 * np.pi * np.cumsum(f0) / sr
    sig = (0.6 * np.sin(phase) + 0.3 * np.sin(2 * phase)
           + 0.15 * np.sin(3 * phase))
    noise = 0.1 * np.random.RandomState(0).randn(int(sr * 0.5))
    return np.concatenate([noise, sig, noise]), len(noise), len(sig)


def test_native_f0_is_built_and_required():
    """The native C++ extractor (csrc/world.cpp, replacing the reference's
    pyworld C++ at preprocessor.py:215-220) must BE the path that runs:
    use_native='require' raises rather than silently falling back to the
    numpy YIN stand-in, and the auto-build makes it available from a clean
    checkout (no .so committed)."""
    from metatts_tpu.preprocess import pitch
    # simulate a clean checkout: drop the .so and the module's cached handle
    so = os.path.join(pitch._CSRC_DIR, "libworld.so")
    if os.path.exists(so):
        os.remove(so)
    pitch._lib = None
    pitch._build_attempted = False
    sr = 22050
    x, _, _ = _voiced_test_signal(sr)
    f = pitch.extract_f0(x, sr, 256 / sr * 1000, use_native="require")
    assert pitch.f0_backend() == "native-dio"
    assert os.path.exists(so)
    assert np.isfinite(f).all() and (f > 0).any()


def test_native_f0_parity_with_yin():
    """Native DIO+StoneMask vs the numpy YIN cross-check on a synthetic
    voiced/unvoiced signal: voiced frames agree to <2% median relative
    error, unvoiced segments stay (mostly) unvoiced."""
    from metatts_tpu.preprocess.pitch import extract_f0
    sr = 22050
    per = 256 / sr * 1000
    x, n_noise, n_sig = _voiced_test_signal(sr)
    fn = extract_f0(x, sr, per, use_native="require")
    fy = extract_f0(x, sr, per, use_native=False)
    hop = sr * per / 1000
    v0 = int(n_noise / hop) + 3
    v1 = int((n_noise + n_sig) / hop) - 3
    vn, vy = fn[v0:v1], fy[v0:v1]
    assert np.mean(vn > 0) > 0.9          # voiced region detected
    assert abs(np.median(vn[vn > 0]) - 150) < 8
    both = (vn > 0) & (vy > 0)
    assert both.sum() > 50
    rel = np.abs(vn[both] - vy[both]) / vy[both]
    assert np.median(rel) < 0.02
    unvoiced = np.concatenate([fn[2:v0 - 3], fn[v1 + 3:-2]])
    assert np.mean(unvoiced > 0) < 0.1    # noise stays unvoiced


def test_native_flac_decoder_lossless():
    """csrc/flac.cpp round-trips FLAC streams bit-exactly (verbatim and
    fixed-predictor/Rice frames, mono + stereo mid-channel downmix) — the
    native replacement for the soundfile/librosa FLAC read the reference
    uses on VCTK mic2 (preprocessor/vctk.py:11-46)."""
    from flac_encoder import encode_flac
    from metatts_tpu.preprocess.audio_io import load_flac
    rng = np.random.RandomState(0)
    t = np.arange(24000) / 48000
    sig = np.clip(6000 * np.sin(2 * np.pi * 220 * t)
                  + 800 * rng.randn(len(t)), -32768, 32767).astype(np.int32)
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        for mode in ("verbatim", "fixed2"):
            p = os.path.join(d, f"{mode}.flac")
            open(p, "wb").write(encode_flac(sig, 48000, mode=mode))
            x, sr = load_flac(p)
            assert sr == 48000
            np.testing.assert_array_equal(
                x, sig.astype(np.float32) / 32768.0)
        st = os.path.join(d, "st.flac")
        stereo = np.stack([sig, sig // 2], axis=1)
        open(st, "wb").write(encode_flac(stereo, 48000))
        x, sr = load_flac(st)
        np.testing.assert_allclose(
            x, stereo.astype(np.float32).mean(axis=1) / 32768.0, atol=1e-7)
        # load_wav dispatches on extension and resamples
        from metatts_tpu.preprocess.audio_io import load_wav
        x, sr = load_wav(os.path.join(d, "fixed2.flac"), target_sr=22050)
        assert sr == 22050 and len(x) == 11025


def test_native_flac_decoder_unknown_total(tmp_path):
    """STREAMINFO may mark total_samples unknown (0) — real encoders emit
    that for piped streams.  ``flac_decode`` silently truncates at the
    caller's buffer bound, and a well-compressed stream decodes to MORE
    samples than the compression-free estimate len*8/bps, so ``load_flac``
    must grow the buffer and retry rather than return truncated audio."""
    from flac_encoder import encode_flac
    from metatts_tpu.preprocess.audio_io import load_flac
    n = 220_000                       # > 65536-slack + len*8/bps for a
    sig = np.full(n, 1234, np.int32)  # highly compressible constant signal
    p = tmp_path / "unknown_total.flac"
    p.write_bytes(encode_flac(sig, 48000, write_total=False))
    assert p.stat().st_size * 8 // 16 + 65536 < n  # bound would truncate
    x, sr = load_flac(str(p))
    assert sr == 48000 and len(x) == n
    np.testing.assert_array_equal(x, np.float32(1234 / 32768.0))


def test_prepare_align_vctk_flac(tmp_path):
    """VCTK mic2 flac corpus -> raw_data wav+lab with zero external deps
    (reference preprocessor/vctk.py:11-46)."""
    from flac_encoder import encode_flac
    from metatts_tpu.preprocess.prepare_align import prepare_align
    corpus = tmp_path / "VCTK"
    wavs = corpus / "wav48_silence_trimmed" / "p225"
    txts = corpus / "txt" / "p225"
    wavs.mkdir(parents=True)
    txts.mkdir(parents=True)
    t = np.arange(48000) / 48000
    sig = np.clip(8000 * np.sin(2 * np.pi * 180 * t), -32768,
                  32767).astype(np.int32)
    (wavs / "p225_001_mic2.flac").write_bytes(encode_flac(sig, 48000))
    (wavs / "p225_001_mic1.flac").write_bytes(encode_flac(sig // 3, 48000))
    (txts / "p225_001.txt").write_text("Please call Stella.\n")
    cfg = {
        "dataset": "VCTK",
        "path": {"corpus_path": str(corpus),
                 "raw_path": str(tmp_path / "raw")},
        "preprocessing": {
            "audio": {"sampling_rate": 22050},
            "text": {"text_cleaners": ["english_cleaners"]},
        },
    }
    n = prepare_align(cfg)
    assert n == 1                       # mic1 skipped, mic2 converted
    out_wav = tmp_path / "raw" / "all" / "p225" / "p225_001.wav"
    out_lab = tmp_path / "raw" / "all" / "p225" / "p225_001.lab"
    assert out_wav.exists() and out_lab.exists()
    from metatts_tpu.preprocess.audio_io import load_wav
    x, sr = load_wav(str(out_wav))
    assert sr == 22050 and len(x) == 22050
    assert np.abs(x).max() > 0.9        # peak-normalized
    assert out_lab.read_text() == "please call stella."


def test_dataset_and_collate(corpus):
    cfg, _ = corpus
    ds = TTSDataset("train.txt", cfg)
    assert len(ds) == 12
    s = ds[0]
    assert s["text"].ndim == 1 and s["mel"].shape[1] == 80
    assert len(s["duration"]) == len(s["text"])
    batch, meta = collate_batch([ds[0], ds[1], ds[6]])
    assert batch.texts.shape[0] == 3
    assert batch.texts.shape[1] % 32 == 0
    assert batch.mels.shape[1] % 128 == 0
    assert int(batch.d_targets.sum(1)[0]) == int(batch.mel_lens[0])


def test_episode_sampler_and_persistence(corpus, tmp_path):
    cfg, _ = corpus
    ds = TTSDataset("train.txt", cfg)
    sampler = EpisodeSampler(ds, shots=2, queries=2, seed=7)
    sup, qry = sampler.sample_episode()
    assert len(sup) == 2 and len(qry) == 2
    # 1-way: all samples same speaker
    assert len({s["speaker"] for s in sup + qry}) == 1
    descs = sampler.tasks_or_prefetch(2, str(tmp_path), "val")
    descs2 = EpisodeSampler.load_tasks(str(tmp_path), "val")
    assert descs == descs2
    assert len(descs) == 4  # 2 speakers x 2 tasks
    sup2, qry2 = sampler.episode_from_description(descs[0])
    assert len(sup2) == 2


def test_meta_datamodule_episode_batches(corpus):
    cfg, _ = corpus
    from metatts_tpu import config as C2
    import copy
    acfg = copy.deepcopy(C2.ALGORITHM_DEFAULTS)
    acfg["type"] = "meta"
    acfg["adapt"]["train"].update(shots=2, queries=2)
    dm = get_datamodule("meta")([cfg], C2.TRAIN_DEFAULTS, acfg)
    dm.setup()
    sup, qry, sup_meta, qry_meta = next(dm.train_episode_batches(2))
    assert sup.texts.shape[0] == 2           # episodes
    assert sup.texts.shape[1] == 2           # shots
    assert qry.texts.shape[:2] == (2, 2)
    assert sup.texts.shape[2] == qry.texts.shape[2]  # shared bucket


def test_prepare_align_vctk_mic2_flac(tmp_path):
    """End-to-end VCTK drive (reference ``preprocessor/vctk.py:11-46``):
    a wav48_silence_trimmed mic2-FLAC corpus is decoded natively
    (csrc/flac.cpp), resampled 48k->22050, peak-normalized, and labelled —
    with the mic1 feed skipped."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from flac_encoder import encode_flac
    from metatts_tpu.preprocess.prepare_align import prepare_align

    corpus = tmp_path / "corpus" / "VCTK"
    raw = tmp_path / "raw_data" / "VCTK"
    sr_in = 48000
    t = np.arange(sr_in // 2) / sr_in
    tone = (0.3 * 32767 * np.sin(2 * np.pi * 220 * t)).astype(np.int32)
    for spk in ("p225", "p226"):
        wdir = corpus / "wav48_silence_trimmed" / spk
        tdir = corpus / "txt" / spk
        wdir.mkdir(parents=True)
        tdir.mkdir(parents=True)
        for utt in ("001", "002"):
            for mic in ("mic1", "mic2"):
                (wdir / f"{spk}_{utt}_{mic}.flac").write_bytes(
                    encode_flac(tone, sr_in))
            (tdir / f"{spk}_{utt}.txt").write_text("Please call Stella.\n")
        # mic2-less utterance (only mic1): must be skipped entirely
        (wdir / f"{spk}_003_mic1.flac").write_bytes(encode_flac(tone, sr_in))
        (tdir / f"{spk}_003.txt").write_text("Ask her to bring 2 things.\n")

    cfg = {
        "dataset": "VCTK",
        "path": {"corpus_path": str(corpus), "raw_path": str(raw)},
        "preprocessing": {
            "audio": {"sampling_rate": SR},
            "text": {"text_cleaners": ["english_cleaners"]},
        },
    }
    n = prepare_align(cfg)
    assert n == 4                      # 2 speakers x 2 mic2 utterances
    for spk in ("p225", "p226"):
        for utt in ("001", "002"):
            wav_path = raw / "all" / spk / f"{spk}_{utt}.wav"
            x, sr = load_wav(str(wav_path))
            assert sr == SR
            assert 0.9 < np.abs(x).max() <= 1.0    # peak-normalized
            lab = (raw / "all" / spk / f"{spk}_{utt}.lab").read_text()
            assert lab == "please call stella."
        assert not (raw / "all" / spk / f"{spk}_003.wav").exists()
