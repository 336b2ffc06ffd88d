"""Fused mel-spectrogram Pallas kernel.

One pass over HBM: frame + window + real-DFT (two MXU matmuls against the
cos/sin bases) + magnitude + mel filterbank matmul + log compression, all in
VMEM.  Replaces the three separate XLA ops (conv STFT -> magnitude -> mel
matmul) of ``ops/stft.py`` with a single kernel — the reference ran this
path as a CUDA conv1d + two GEMMs (``audio/stft.py:67-72, 159-178``).

Frame blocks overlap in the audio (hop < n_fft), which BlockSpec cannot
express, so the audio stays in HBM (`memory_space=ANY`) and each program
DMAs its strided span into a VMEM scratch buffer explicitly.

Numerics match ``TacotronSTFT.mel_spectrogram`` to ~1e-3 (fp32 MXU passes).
Energy (L2 of the spectrum) is emitted alongside for the preprocessor.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..stft import mel_filterbank, _hann_window


def _round_up(x, m):
    return (x + m - 1) // m * m


def _make_constants(n_fft, win_length, sr, n_mels, fmin, fmax):
    fourier = np.fft.fft(np.eye(n_fft))
    cutoff = n_fft // 2 + 1
    window = _hann_window(win_length)
    if n_fft > win_length:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    cos_b = (np.real(fourier[:cutoff]) * window[None, :]).T  # (n_fft, cutoff)
    sin_b = (np.imag(fourier[:cutoff]) * window[None, :]).T
    mel = mel_filterbank(sr, n_fft, n_mels, fmin, fmax).T     # (cutoff, n_mels)

    cpad = _round_up(cutoff, 128)
    mpad = _round_up(n_mels, 128)
    cos_b = np.pad(cos_b, ((0, 0), (0, cpad - cutoff))).astype(np.float32)
    sin_b = np.pad(sin_b, ((0, 0), (0, cpad - cutoff))).astype(np.float32)
    mel = np.pad(mel, ((0, cpad - cutoff), (0, mpad - n_mels))) \
        .astype(np.float32)
    return cos_b, sin_b, mel, cutoff


def _kernel(audio_hbm, cos_ref, sin_ref, mel_ref, out_mel_ref, out_en_ref,
            audio_vmem, frames_scratch, sem, *, frames_blk, hop, n_fft,
            span, clip_val):
    b = pl.program_id(0)
    i = pl.program_id(1)
    start = i * frames_blk * hop
    dma = pltpu.make_async_copy(
        audio_hbm.at[b, pl.ds(start, span)], audio_vmem, sem)
    dma.start()
    dma.wait()

    def fill(j, _):
        frames_scratch[j, :] = audio_vmem[pl.ds(j * hop, n_fft)]
        return 0

    jax.lax.fori_loop(0, frames_blk, fill, 0)
    f = frames_scratch[:]                                     # (FB, n_fft)
    real = jnp.dot(f, cos_ref[:], preferred_element_type=jnp.float32)
    imag = jnp.dot(f, sin_ref[:], preferred_element_type=jnp.float32)
    power = real * real + imag * imag                         # (FB, cpad)
    mag = jnp.sqrt(power)
    mel = jnp.dot(mag, mel_ref[:], preferred_element_type=jnp.float32)
    out_mel_ref[0] = jnp.log(jnp.maximum(mel, clip_val))
    out_en_ref[0] = jnp.sqrt(jnp.sum(power, axis=-1, keepdims=True))


@functools.partial(jax.jit, static_argnames=(
    "n_fft", "hop", "win_length", "sr", "n_mels", "fmin", "fmax",
    "frames_blk", "interpret"))
def fused_mel_spectrogram(y, *, n_fft=1024, hop=256, win_length=1024,
                          sr=22050, n_mels=80, fmin=0.0, fmax=None,
                          frames_blk=128, interpret=False):
    """(B, T) wav in [-1,1] -> (log-mel (B, n_mels, frames), energy (B, frames)).

    Same conventions as ``TacotronSTFT.mel_spectrogram`` (reflect pad,
    n_frames = T//hop + 1, Slaney mel, log clamp 1e-5).
    """
    B, T = y.shape
    n_frames = T // hop + 1
    cos_b, sin_b, mel_b, cutoff = _make_constants(
        n_fft, win_length, sr, n_mels, fmin, fmax)
    mpad = mel_b.shape[1]

    pad = n_fft // 2
    x = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    blocks = _round_up(n_frames, frames_blk) // frames_blk
    span = (frames_blk - 1) * hop + n_fft
    need = (blocks * frames_blk - 1) * hop + n_fft
    x = jnp.pad(x, ((0, 0), (0, max(0, need - x.shape[1]))))

    out_mel, out_en = pl.pallas_call(
        functools.partial(_kernel, frames_blk=frames_blk, hop=hop,
                          n_fft=n_fft, span=span, clip_val=1e-5),
        grid=(B, blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # audio stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, frames_blk, mpad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, frames_blk, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, blocks * frames_blk, mpad), jnp.float32),
            jax.ShapeDtypeStruct((B, blocks * frames_blk, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((span,), jnp.float32),
            pltpu.VMEM((frames_blk, n_fft), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x, jnp.asarray(cos_b), jnp.asarray(sin_b), jnp.asarray(mel_b))

    mel = out_mel[:, :n_frames, :n_mels].transpose(0, 2, 1)
    energy = out_en[:, :n_frames, 0]
    return mel, energy
