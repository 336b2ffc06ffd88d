from .melspec import fused_mel_spectrogram  # noqa: F401
