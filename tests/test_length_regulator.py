import numpy as np
import jax.numpy as jnp

from metatts_tpu.ops.length_regulator import length_regulate, gather_phoneme_level


def _python_expand(x, d, max_len):
    """The reference's ragged loop (modules.py:167-190), as ground truth."""
    rows = []
    for vec, n in zip(x, d):
        for _ in range(int(n)):
            rows.append(vec)
    out = np.zeros((max_len, x.shape[1]), x.dtype)
    rows = np.array(rows) if rows else np.zeros((0, x.shape[1]), x.dtype)
    out[: min(len(rows), max_len)] = rows[:max_len]
    return out, len(rows)


def test_matches_python_loop():
    rng = np.random.RandomState(0)
    B, L, H, T = 3, 7, 4, 24
    x = rng.randn(B, L, H).astype(np.float32)
    d = rng.randint(0, 5, size=(B, L)).astype(np.int32)
    out, mel_len = length_regulate(jnp.asarray(x), jnp.asarray(d), T)
    for b in range(B):
        ref, n = _python_expand(x[b], d[b], T)
        np.testing.assert_allclose(np.asarray(out[b]), ref, atol=1e-5)
        assert int(mel_len[b]) == min(n, T)


def test_zero_durations_and_overflow():
    x = np.ones((1, 3, 2), np.float32)
    d = np.array([[0, 10, 0]], np.int32)
    out, mel_len = length_regulate(jnp.asarray(x), jnp.asarray(d), 6)
    assert int(mel_len[0]) == 6  # clamped to max_mel_len
    np.testing.assert_allclose(np.asarray(out[0]), np.ones((6, 2)), atol=1e-6)


def test_gather_phoneme_level_inverts_expand():
    rng = np.random.RandomState(1)
    B, L, T = 2, 5, 32
    d = rng.randint(1, 5, size=(B, L)).astype(np.int32)
    phoneme_vals = rng.randn(B, L).astype(np.float32)
    # expand each phoneme value over its frames, then re-average
    frames, _ = length_regulate(
        jnp.asarray(phoneme_vals[..., None]), jnp.asarray(d), T)
    back = gather_phoneme_level(frames[..., 0], jnp.asarray(d), L)
    np.testing.assert_allclose(np.asarray(back), phoneme_vals, atol=1e-5)
