"""Length regulator: expand phoneme-level features by integer durations.

The reference materializes ragged per-sample expansions in a Python loop
(``lightning/model/modules.py:161-194``) — impossible under XLA tracing.
Here each output frame computes its source phoneme index in closed form and
the expansion is a single batched gather with static shapes:

    cum[l]  = cumsum(d)[l]
    idx[t]  = #{ l : cum[l] <= t }        (searchsorted, as a masked sum)
    out[t]  = x[idx[t]]  if t < sum(d) else 0

Frames beyond sum(d) are zeroed — the reference's padding value.  The gather
is exact (no matmul rounding), differentiable (scatter-add backward), and
O(T·L) bool work + O(T·H) copy instead of the reference's host loop.
"""

import jax.numpy as jnp


def _frame_to_phone_idx(durations, max_mel_len):
    """(B, L) int durations -> ((B, T) source index, (B, T) valid mask)."""
    cum = jnp.cumsum(durations, axis=-1)                      # (B, L)
    t = jnp.arange(max_mel_len, dtype=cum.dtype)              # (T,)
    # idx[t] = number of phonemes that end at or before frame t
    idx = jnp.sum(t[None, :, None] >= cum[:, None, :], axis=-1)
    total = cum[:, -1]
    valid = t[None, :] < total[:, None]
    idx = jnp.clip(idx, 0, durations.shape[-1] - 1)
    return idx, valid


def length_regulate(x, durations, max_mel_len):
    """Expand (B, L, H) by (B, L) int durations -> ((B, T, H), (B,) mel_len).

    Equivalent to the reference LengthRegulator + pad-to-max_len.
    """
    idx, valid = _frame_to_phone_idx(durations, max_mel_len)
    out = jnp.take_along_axis(x, idx[..., None], axis=1)      # (B, T, H)
    out = jnp.where(valid[..., None], out, 0)
    cum_total = jnp.sum(durations, axis=-1)
    mel_len = jnp.minimum(cum_total, max_mel_len).astype(jnp.int32)
    return out, mel_len


def gather_phoneme_level(frame_feat, durations, src_len):
    """Average frame-level (B, T) features to phoneme level (B, L) by durations.

    Transpose of ``length_regulate``: used when pitch / energy are
    phoneme-averaged (reference ``preprocessor.py:231-261``).
    """
    del src_len  # implied by durations.shape[-1]
    cum = jnp.cumsum(durations, axis=-1)
    starts = cum - durations
    t = jnp.arange(frame_feat.shape[-1], dtype=cum.dtype)
    assign = (t[None, :, None] >= starts[:, None, :]) & (
        t[None, :, None] < cum[:, None, :])
    p = assign.astype(jnp.float32)                            # (B, T, L)
    sums = jnp.einsum("btl,bt->bl", p, frame_feat.astype(jnp.float32))
    counts = jnp.maximum(durations.astype(jnp.float32), 1.0)
    return sums / counts
