"""End-to-end single-speaker demo (BASELINE.json config 1):

  synthetic corpus -> offline preprocessing -> baseline FastSpeech2
  training -> teacher-forced reconstruction -> Griffin-Lim -> wav.

Runs on CPU in a few minutes (`METATTS_PLATFORM=cpu python
examples/demo_single_speaker.py [workdir]`); no external data or weights.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("METATTS_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["METATTS_PLATFORM"])

import numpy as np


def build_corpus(root, sr=22050):
    from metatts_tpu.preprocess.audio_io import save_wav

    phones = ["HH", "AH0", "L", "OW1", "sp", "W", "ER1", "L", "D"]
    raw = os.path.join(root, "raw_data")
    out = os.path.join(root, "preprocessed")
    rng = np.random.RandomState(0)
    for u in range(8):
        dur = 0.1 * len(phones) + 0.08
        t = np.arange(int(sr * dur)) / sr
        f = 140.0 * (1 + 0.06 * np.sin(2 * np.pi * (1 + u % 3) * t))
        ph = 2 * np.pi * np.cumsum(f) / sr
        wav = (0.35 * np.sin(ph) + 0.15 * np.sin(2 * ph)
               + 0.01 * rng.randn(len(t)))
        d = os.path.join(raw, "train", "speaker1")
        os.makedirs(d, exist_ok=True)
        save_wav(os.path.join(d, f"utt{u}.wav"), wav.astype(np.float32), sr)
        with open(os.path.join(d, f"utt{u}.lab"), "w") as fh:
            fh.write("hello world")
        _write_tg(os.path.join(out, "TextGrid", "speaker1",
                               f"utt{u}.TextGrid"), phones)
    return raw, out


def _write_tg(path, phones, spp=0.1):
    t, items = 0.0, []
    for p in phones:
        items.append((t, t + spp, p))
        t += spp
    lines = ['File type = "ooTextFile"', 'Object class = "TextGrid"', "",
             "xmin = 0.0", f"xmax = {t}", "tiers? <exists>", "size = 1",
             "item []:", "\titem [1]:", '\t\tclass = "IntervalTier"',
             '\t\tname = "phones"', "\t\txmin = 0.0", f"\t\txmax = {t}",
             f"\t\tintervals: size = {len(items)}"]
    for i, (s, e, p) in enumerate(items):
        lines += [f"\t\tintervals [{i+1}]:", f"\t\t\txmin = {s}",
                  f"\t\t\txmax = {e}", f'\t\t\ttext = "{p}"']
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines))


def main(root="demo_out", steps=40):
    from metatts_tpu import config as C
    from metatts_tpu.preprocess import Preprocessor
    from metatts_tpu.algorithms import get_system
    from metatts_tpu.data import get_datamodule
    from metatts_tpu.ops.stft import TacotronSTFT
    from metatts_tpu.preprocess.audio_io import save_wav
    import jax.numpy as jnp

    raw, out = build_corpus(root)
    pcfg = C.deep_merge(C.PREPROCESS_DEFAULTS, {
        "dataset": "demo",
        "path": {"raw_path": raw, "preprocessed_path": out},
        "subsets": {"train": "train", "val": "train", "test": "train"},
    })
    Preprocessor(pcfg).build_from_path()
    print("preprocessed demo corpus")

    mcfg = C.deep_merge(C.MODEL_DEFAULTS, {
        "transformer": {"encoder_layer": 1, "decoder_layer": 1},
        "multi_speaker": False, "compute_dtype": "float32"})
    tcfg = C.deep_merge(C.TRAIN_DEFAULTS, {
        "optimizer": {"batch_size": 8, "warm_up_step": 20},
        "step": {"total_step": steps, "log_step": 10, "val_step": 10 ** 9,
                 "synth_step": 10 ** 9, "save_step": 10 ** 9}})
    acfg = C.deep_merge(C.ALGORITHM_DEFAULTS, {"type": "baseline"})

    import json
    stats = json.load(open(os.path.join(out, "stats.json")))
    dm = get_datamodule("base")([pcfg], tcfg, acfg)
    dm.setup()
    system = get_system("baseline")([pcfg], mcfg, tcfg, acfg, stats=stats,
                                    n_speakers=1)
    gen = dm.train_batches(8)
    for i in range(steps):
        batch, _ = next(gen)
        losses = system.train_step(batch)
        if i % 10 == 0:
            print(f"step {i}: total {float(losses.total):.3f} "
                  f"mel {float(losses.mel):.3f}")

    # teacher-forced reconstruction -> Griffin-Lim
    batch, meta = next(gen)
    out_fs2, _ = system.adaptor.forward(system.params, system.state, batch,
                                        train=False)
    mel_len = int(np.asarray(out_fs2.mel_lens)[0])
    mel = np.asarray(out_fs2.postnet_mel)[0, :mel_len]   # (T, 80) log-mel

    stft = TacotronSTFT()
    # invert mel -> linear magnitude via the filterbank pseudo-inverse
    mel_basis = stft.mel_basis                            # (80, 513)
    pinv = np.linalg.pinv(mel_basis)
    mag = np.maximum(pinv @ np.exp(mel.T), 1e-8)          # (513, T)
    wav = np.asarray(stft.griffin_lim(jnp.asarray(mag[None]), n_iters=30))[0]
    path = os.path.join(root, "reconstructed.wav")
    save_wav(path, np.clip(wav / max(abs(wav).max(), 1e-6), -1, 1), 22050)
    print(f"wrote {path} ({len(wav)/22050:.2f}s)")
    return path


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["demo_out"]))
