"""Cross-framework golden tests: our JAX DSP vs a torch implementation of
the reference's exact formulas (torch CPU is available in the image).

The torch code below re-states the reference math (conv1d against a
windowed DFT basis, ``audio/stft.py:20-82``; log-compressed Slaney mel,
``audio/stft.py:159-178``) purely as a test oracle.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from metatts_tpu.ops.stft import TacotronSTFT, mel_filterbank, _hann_window


def _torch_stft_magnitude(y, n_fft=1024, hop=256):
    """Reference conv1d-STFT magnitudes, in torch."""
    fourier = np.fft.fft(np.eye(n_fft))
    cutoff = n_fft // 2 + 1
    basis = np.vstack([np.real(fourier[:cutoff]), np.imag(fourier[:cutoff])])
    window = _hann_window(n_fft)
    fwd = torch.tensor((basis * window[None, :])[:, None, :],
                       dtype=torch.float32)
    x = torch.tensor(y, dtype=torch.float32)[:, None, :]
    x = torch.nn.functional.pad(x[:, None], (n_fft // 2, n_fft // 2, 0, 0),
                                mode="reflect")[:, 0]
    out = torch.nn.functional.conv1d(x, fwd, stride=hop)
    real, imag = out[:, :cutoff], out[:, cutoff:]
    return torch.sqrt(real ** 2 + imag ** 2)


def test_stft_matches_torch_conv_reference():
    rng = np.random.RandomState(0)
    y = rng.uniform(-0.95, 0.95, size=(2, 22050)).astype(np.float32)
    ours, _ = TacotronSTFT().transform(y)
    theirs = _torch_stft_magnitude(y).numpy()
    assert np.abs(np.asarray(ours) - theirs).max() < 2e-3
    # relative error on non-tiny bins
    mask = theirs > 1e-2
    rel = np.abs(np.asarray(ours)[mask] - theirs[mask]) / theirs[mask]
    assert rel.max() < 1e-2


def test_mel_matches_torch_pipeline():
    """Full mel path: our (mel, energy) vs torch conv-STFT + torch matmul
    with OUR Slaney bank (librosa itself is unavailable; the bank is
    validated structurally in test_stft.py)."""
    rng = np.random.RandomState(1)
    y = rng.uniform(-0.8, 0.8, size=(1, 11025)).astype(np.float32)
    mel_ours, energy_ours = TacotronSTFT().mel_spectrogram(y)

    mag = _torch_stft_magnitude(y)
    fb = torch.tensor(mel_filterbank(22050, 1024, 80, 0.0, None))
    mel_torch = torch.log(torch.clamp(fb @ mag[0], min=1e-5)).numpy()
    energy_torch = torch.norm(mag[0], dim=0).numpy()

    # north-star criterion: <= 1e-3 mel L1 divergence
    l1 = np.abs(np.asarray(mel_ours[0]) - mel_torch).mean()
    assert l1 < 1e-3, f"mel L1 divergence {l1}"
    np.testing.assert_allclose(np.asarray(energy_ours[0]), energy_torch,
                               rtol=1e-3, atol=1e-3)


def test_conv1d_matches_torch():
    """Model conv (im2col matmul) vs torch.nn.functional.conv1d."""
    import jax.numpy as jnp
    from metatts_tpu.models import nn as jnn
    rng = np.random.RandomState(2)
    for k, dil in [(3, 1), (9, 1), (5, 2)]:
        w = rng.randn(7, 5, k).astype(np.float32)
        b = rng.randn(7).astype(np.float32)
        x = rng.randn(2, 16, 5).astype(np.float32)
        ours = np.asarray(jnn.conv1d(
            {"w": jnp.asarray(w), "b": jnp.asarray(b)}, jnp.asarray(x),
            dilation=dil))
        theirs = torch.nn.functional.conv1d(
            torch.tensor(x).transpose(1, 2), torch.tensor(w),
            torch.tensor(b), padding=dil * (k - 1) // 2,
            dilation=dil).transpose(1, 2).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-5,
                                   err_msg=f"k={k} dil={dil}")


def test_conv1d_native_branch_matches_torch():
    """The lax-conv branch (auto-selected on TPU — the tunneled platform
    included, via utils.backend.is_tpu) vs torch, at small channel counts
    where the XLA-CPU conv lowering is still cheap to compile."""
    import jax.numpy as jnp
    from metatts_tpu.models import nn as jnn
    rng = np.random.RandomState(3)
    for k, dil in [(3, 1), (9, 1), (5, 2)]:
        w = rng.randn(7, 5, k).astype(np.float32)
        b = rng.randn(7).astype(np.float32)
        x = rng.randn(2, 16, 5).astype(np.float32)
        ours = np.asarray(jnn.conv1d(
            {"w": jnp.asarray(w), "b": jnp.asarray(b)}, jnp.asarray(x),
            dilation=dil, impl="native"))
        theirs = torch.nn.functional.conv1d(
            torch.tensor(x).transpose(1, 2), torch.tensor(w),
            torch.tensor(b), padding=dil * (k - 1) // 2,
            dilation=dil).transpose(1, 2).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-5,
                                   err_msg=f"native k={k} dil={dil}")


def test_lstm_matches_torch():
    """GE2E LSTM vs torch.nn.LSTM with identical weights (complements the
    converted-weights parity shown in the round log)."""
    import jax
    import jax.numpy as jnp
    from metatts_tpu.models import nn as jnn
    p = jnn.lstm_init(jax.random.PRNGKey(0), 8, 16, 2)
    t_lstm = torch.nn.LSTM(8, 16, 2, batch_first=True)
    with torch.no_grad():
        for i, lp in enumerate(p["layers"]):
            getattr(t_lstm, f"weight_ih_l{i}").copy_(
                torch.tensor(np.asarray(lp["w_ih"]).T))
            getattr(t_lstm, f"weight_hh_l{i}").copy_(
                torch.tensor(np.asarray(lp["w_hh"]).T))
            getattr(t_lstm, f"bias_ih_l{i}").copy_(
                torch.tensor(np.asarray(lp["b_ih"])))
            getattr(t_lstm, f"bias_hh_l{i}").copy_(
                torch.tensor(np.asarray(lp["b_hh"])))
    x = np.random.RandomState(3).randn(2, 6, 8).astype(np.float32)
    ours, finals = jnn.lstm(p, jnp.asarray(x))
    with torch.no_grad():
        theirs, (h, _) = t_lstm(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(finals), h.numpy(), atol=2e-5)
