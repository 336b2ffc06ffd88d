"""Corpus normalization to ``raw_data/`` (reference ``prepare_align.py`` +
``preprocessor/{libritts,vctk}.py``): resample to the configured rate,
peak-normalize to int16, clean transcripts to ``.lab`` files.

LibriTTS layout: <corpus>/<subset>/<speaker>/<chapter>/<base>.wav with
``<base>.normalized.txt`` transcripts.  VCTK: wav48_silence_trimmed mic2
flacs, decoded with the native FLAC decoder (csrc/flac.cpp) — a real VCTK
drop needs zero code (reference ``preprocessor/vctk.py:11-46``).
"""

import os

import numpy as np

from .audio_io import load_wav, save_wav

SUBSET_GROUPS = {
    "train-clean": ["train-clean-100", "train-clean-360"],
    "train-all": ["train-clean-100", "train-clean-360", "train-other-500"],
}


def expand_subsets(subsets):
    """train-clean -> [train-clean-100, train-clean-360] etc.
    (reference ``prepare_align.py:8-35``)."""
    out = []
    for s in subsets if isinstance(subsets, list) else [subsets]:
        out += SUBSET_GROUPS.get(s, [s])
    return out


def _clean(text, cleaner_names):
    from ..text import _clean_text
    return _clean_text(text, cleaner_names)


def prepare_align_libritts(config, subset):
    in_dir = os.path.join(config["path"]["corpus_path"], subset)
    out_dir = os.path.join(config["path"]["raw_path"], subset)
    sr = config["preprocessing"]["audio"]["sampling_rate"]
    cleaners = config["preprocessing"]["text"]["text_cleaners"]
    if not os.path.isdir(in_dir):
        return 0
    n = 0
    for speaker in sorted(os.listdir(in_dir)):
        spk_dir = os.path.join(in_dir, speaker)
        if not os.path.isdir(spk_dir):
            continue
        for chapter in sorted(os.listdir(spk_dir)):
            ch_dir = os.path.join(spk_dir, chapter)
            if not os.path.isdir(ch_dir):
                continue
            for fname in sorted(os.listdir(ch_dir)):
                if not fname.endswith(".wav"):
                    continue
                base = fname[:-4]
                text_path = os.path.join(ch_dir, f"{base}.normalized.txt")
                if not os.path.exists(text_path):
                    continue
                with open(text_path) as f:
                    text = _clean(f.readline().strip("\n"), cleaners)
                wav, _ = load_wav(os.path.join(ch_dir, fname), target_sr=sr)
                peak = max(np.abs(wav).max(), 1e-9)
                wav = wav / peak
                os.makedirs(os.path.join(out_dir, speaker), exist_ok=True)
                save_wav(os.path.join(out_dir, speaker, f"{base}.wav"),
                         wav, sr)
                with open(os.path.join(out_dir, speaker, f"{base}.lab"),
                          "w") as f:
                    f.write(text)
                n += 1
    return n


def prepare_align_vctk(config):
    """VCTK: <corpus>/wav48[_silence_trimmed]/<spk>/*.wav + txt/<spk>/*.txt."""
    corpus = config["path"]["corpus_path"]
    out_root = os.path.join(config["path"]["raw_path"], "all")
    sr = config["preprocessing"]["audio"]["sampling_rate"]
    cleaners = config["preprocessing"]["text"]["text_cleaners"]
    wav_root = None
    for cand in ("wav48_silence_trimmed", "wav48", "wav"):
        if os.path.isdir(os.path.join(corpus, cand)):
            wav_root = os.path.join(corpus, cand)
            break
    if wav_root is None:
        return 0
    txt_root = os.path.join(corpus, "txt")
    n = 0
    for speaker in sorted(os.listdir(wav_root)):
        spk_dir = os.path.join(wav_root, speaker)
        if not os.path.isdir(spk_dir):
            continue
        for fname in sorted(os.listdir(spk_dir)):
            # mic2 FLAC is the reference input (vctk.py:11-46, decoded
            # natively via csrc/flac.cpp); pre-converted wavs also accepted
            if fname.endswith(".wav"):
                base = fname[:-4]
            elif fname.endswith(".flac"):
                base = fname[:-5]
                if "_mic1" in base:
                    continue  # reference uses the mic2 feed only
            else:
                continue
            base = base.replace("_mic2", "")
            txt = os.path.join(txt_root, speaker, f"{base}.txt")
            if not os.path.exists(txt):
                continue
            with open(txt) as f:
                text = _clean(f.readline().strip("\n"), cleaners)
            wav, _ = load_wav(os.path.join(spk_dir, fname), target_sr=sr)
            peak = max(np.abs(wav).max(), 1e-9)
            wav = wav / peak
            os.makedirs(os.path.join(out_root, speaker), exist_ok=True)
            save_wav(os.path.join(out_root, speaker, f"{base}.wav"), wav, sr)
            with open(os.path.join(out_root, speaker, f"{base}.lab"),
                      "w") as f:
                f.write(text)
            n += 1
    return n


def prepare_align(config):
    dataset = config["dataset"]
    if "VCTK" in dataset:
        return prepare_align_vctk(config)
    subsets = set()
    for key in ("train", "val", "test"):
        v = config["subsets"].get(key)
        if v:
            subsets.update(expand_subsets(v))
    total = 0
    for s in sorted(subsets):
        total += prepare_align_libritts(config, s)
    return total
