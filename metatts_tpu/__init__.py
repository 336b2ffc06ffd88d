"""metatts_tpu — a TPU-native (JAX / XLA / Pallas / pjit) re-implementation of the
capabilities of Meta-TTS (SungFeng-Huang/Meta-TTS).

The framework is pure-functional: models are (init, apply) pairs over params
pytrees, meta-learning is grad-of-grad under ``lax.scan``, and distribution is
SPMD over a ``jax.sharding.Mesh``.

Layer map (mirrors SURVEY.md §1):
  text/        L1 text frontend (symbols, cleaners, text_to_sequence)
  ops/         L0 DSP kernels (STFT/mel, Griffin-Lim, length regulator, Pallas)
  preprocess/  L2 offline preprocessing (TextGrid, pitch, features)
  data/        L3 datasets / collate / episodes
  models/      L4 acoustic model (FastSpeech2) + vocoders + loss
  algorithms/  L5 training systems (baseline / MAML / iMAML)
  parallel/    L6 mesh / sharding / collectives
  train/       L6-L7 train loop, optimizer, checkpointing, savers
  evaluation/  L9 offline evaluation (d-vector similarity, EER, MOS hooks)
"""

__version__ = "0.1.0"
