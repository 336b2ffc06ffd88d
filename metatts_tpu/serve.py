"""Serving: batched text -> waveform synthesis with pre-compiled buckets.

Productionized analogue of the reference's predict stage: a
``SynthesisEngine`` owns frozen params, jit-compiles one synthesis program
per (text-bucket, mel-cap) and runs text batches through the acoustic model
+ vocoder.  The flash-attention path is used on TPU (single differentiation
-- none -- required).

Few-shot serving: ``adapt_speaker`` runs the test-time first-order
adaptation on reference utterances and returns a new engine bound to the
adapted params (the reference's -s test flow, packaged for deployment).
"""

import numpy as np
import jax
import jax.numpy as jnp

from .algorithms.adapt import Adaptor
from .data.collate import collate_batch
from .models.vocoder import Vocoder
from .text import text_to_sequence


class SynthesisEngine:
    def __init__(self, params, state, preprocess_cfg, model_cfg,
                 algorithm_cfg, vocoder=None, vocoder_params=None):
        self.params = params
        self.state = state
        self.pcfg = preprocess_cfg
        self.mcfg = model_cfg
        # pure-inference jits opt into the fused FFT-block megakernel
        # (ops/pallas/fftblock.py) — adapt_speaker keeps the base mcfg
        # because it differentiates through the forward
        self.mcfg_infer = dict(model_cfg, _fused_infer=True)
        self.acfg = algorithm_cfg
        self.adaptor = Adaptor(preprocess_cfg, model_cfg, algorithm_cfg)
        self.vocoder = vocoder or Vocoder(
            model_cfg,
            n_mels=preprocess_cfg["preprocessing"]["mel"]["n_mel_channels"])
        if vocoder_params is not None:
            self.vocoder.params = vocoder_params
        self.hop = preprocess_cfg["preprocessing"]["stft"]["hop_length"]
        self.sr = preprocess_cfg["preprocessing"]["audio"]["sampling_rate"]
        self._compiled = {}

    def _synth_fn(self, text_bucket, mel_cap):
        key = (text_bucket, mel_cap)
        if key not in self._compiled:
            # controls are traced scalars so one program serves any value
            def fn(params, state, batch, p_control, e_control, d_control):
                from .models.fastspeech2 import fastspeech2_apply
                out, _ = fastspeech2_apply(
                    params, state, batch, self.mcfg_infer, self.pcfg,
                    self.acfg,
                    train=False, teacher_forced=False, max_mel_len=mel_cap,
                    p_control=p_control, e_control=e_control,
                    d_control=d_control)
                return out.postnet_mel, out.mel_lens
            self._compiled[key] = jax.jit(fn)
        return self._compiled[key]

    def synthesize(self, texts, speakers=None, mel_cap=1000,
                   p_control=1.0, e_control=1.0, d_control=1.0):
        """texts: list of strings or pre-tokenized id arrays ->
        list of (int16 wav, mel np.ndarray)."""
        cleaners = self.pcfg["preprocessing"]["text"]["text_cleaners"]
        samples = []
        for i, t in enumerate(texts):
            ids = (np.asarray(t, np.int32) if not isinstance(t, str)
                   else np.asarray(text_to_sequence(t, cleaners), np.int32))
            samples.append({
                "id": f"synth_{i}",
                "speaker": 0 if speakers is None else speakers[i],
                "text": ids,
                "raw_text": t if isinstance(t, str) else "",
            })
        batch, meta = collate_batch(samples, with_mels=False)
        fn = self._synth_fn(int(batch.texts.shape[1]), mel_cap)
        mels, mel_lens = fn(self.params, self.state, batch,
                            jnp.float32(p_control), jnp.float32(e_control),
                            jnp.float32(d_control))
        mel_lens = np.asarray(mel_lens)
        wavs = self.vocoder.infer(mels, lengths=mel_lens * self.hop)
        out = []
        for i in range(len(texts)):
            out.append((wavs[i], np.asarray(mels[i, : mel_lens[i]])))
        return out

    # ---------------------------------------------------- few-shot serving

    def adapt_speaker(self, sup_batch, steps=None, lr=None):
        """First-order adaptation on a support Batch -> adapted engine."""
        test_cfg = self.acfg["adapt"]["test"]
        steps = steps or test_cfg["steps"]
        lr = lr or test_cfg["lr"]
        adapted = jax.jit(lambda p: self.adaptor.adapt(
            p, self.state, sup_batch, steps=steps, lr=lr,
            first_order=True, train=False, rng=None))(self.params)
        eng = SynthesisEngine(adapted, self.state, self.pcfg, self.mcfg,
                              self.acfg, vocoder=self.vocoder)
        return eng

    @classmethod
    def from_checkpoint(cls, ckpt_path, preprocess_cfg, model_cfg,
                        algorithm_cfg, stats=None, n_speakers=8):
        from .models.fastspeech2 import fastspeech2_init
        from .train.checkpoint import load_checkpoint
        params, state = fastspeech2_init(
            jax.random.PRNGKey(0), preprocess_cfg, model_cfg, algorithm_cfg,
            stats or {"pitch": [-3, 10, 0, 1], "energy": [-2, 10, 0, 1]},
            n_speakers)
        params, state, _, _, report = load_checkpoint(
            ckpt_path, params, state, {})
        for r in report:
            print(f"[ckpt surgery] {r}")
        return cls(params, state, preprocess_cfg, model_cfg, algorithm_cfg)
