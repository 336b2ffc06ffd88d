"""Checkpointing with explicit pytree surgery rules.

Saves msgpack checkpoints (flax.serialization) of
{params, state, opt_state, step}.  Load-time surgery reproduces the
reference's state-dict repairs (``lightning/systems/system.py:115-192``):

  * speaker-table row-count mismatch across corpora: copy the overlapping
    rows, keep the new init for the rest (LibriTTS 326 -> 2390 case);
  * ``avg_train_spk_emb``: overwrite target rows with the mean of the
    loaded table's rows (test-time unseen-speaker init,
    ``system.py:195-213``);
  * any other shape mismatch: keep the freshly initialized value and
    report it (the reference drops mismatched keys);
  * optimizer state is discarded whenever surgery changed anything.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def save_checkpoint(path, params, state, opt_state, step):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # Fetch device arrays through ONE packed transfer per dtype chunk
    # before serializing: flax.to_bytes would device_get leaf-by-leaf,
    # which through the remote-TPU tunnel costs ~0.7 s PER LEAF (~158 s
    # for the 218-leaf base params pytree vs ~9 s packed — see
    # utils/transfer.py).  Checkpoint saves sit on the training loop's
    # critical path at save_step cadence.
    from ..utils.transfer import packed_device_get
    tree = packed_device_get({
        "params": params, "state": state, "opt_state": opt_state})
    blob = serialization.to_bytes({
        "params": tree["params"], "state": tree["state"],
        "opt_state": tree["opt_state"],
        "step": np.asarray(step, np.int64),
    })
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path, like_params, like_state, like_opt_state):
    """Returns (params, state, opt_state_or_None, step, report).

    opt_state is None (caller re-inits) when surgery changed any leaf.
    """
    with open(path, "rb") as f:
        blob = f.read()
    # Restore untyped, then merge leaf-by-leaf with shape validation —
    # flax.from_bytes restores mismatched shapes silently, which would
    # defeat the surgery rules.
    raw = serialization.msgpack_restore(blob)
    params, report = _merge_with_surgery(like_params, raw.get("params", {}))
    state, srep = _merge_with_surgery(like_state, raw.get("state", {}))
    report += srep
    step = int(np.asarray(raw.get("step", 0)))
    if report:
        return params, state, None, step, report
    opt_state = serialization.from_state_dict(
        like_opt_state, raw.get("opt_state", {}))
    return params, state, opt_state, step, report


def _merge_with_surgery(like, raw, prefix=""):
    report = []
    if isinstance(like, dict):
        out = {}
        raw = raw if isinstance(raw, dict) else {}
        # flax serializes lists as dicts with stringified indices
        for k, v in like.items():
            rk = raw.get(k, raw.get(str(k)))
            merged, rep = _merge_with_surgery(v, rk, f"{prefix}/{k}")
            out[k] = merged
            report += rep
        return out, report
    if isinstance(like, (list, tuple)):
        out = []
        for i, v in enumerate(like):
            rk = None
            if isinstance(raw, (list, tuple)) and i < len(raw):
                rk = raw[i]
            elif isinstance(raw, dict):
                rk = raw.get(str(i), raw.get(i))
            merged, rep = _merge_with_surgery(v, rk, f"{prefix}/{i}")
            out.append(merged)
            report += rep
        return type(like)(out) if not isinstance(like, tuple) else tuple(out), report
    # leaf
    if raw is None:
        report.append(f"missing {prefix}: kept init")
        return like, report
    raw = np.asarray(raw)
    like_arr = np.asarray(like)
    if raw.shape == like_arr.shape:
        return jnp.asarray(raw, like_arr.dtype), report
    if raw.ndim == like_arr.ndim == 2 and raw.shape[1] == like_arr.shape[1]:
        # speaker-table style row mismatch: copy overlap
        out = np.array(like_arr)
        n = min(raw.shape[0], like_arr.shape[0])
        out[:n] = raw[:n]
        report.append(
            f"resized {prefix}: {raw.shape} -> {like_arr.shape} "
            f"(copied {n} rows)")
        return jnp.asarray(out), report
    report.append(f"shape mismatch {prefix}: {raw.shape} vs "
                  f"{like_arr.shape}, kept init")
    return like, report


def average_speaker_rows(params, train_rows):
    """avg_train_spk_emb: overwrite all speaker rows with the mean of the
    training-speaker rows (reference ``system.py:195-213``)."""
    table = params["speaker_emb"]["table"]
    mean = jnp.mean(table[jnp.asarray(train_rows)], axis=0, keepdims=True)
    new = jnp.broadcast_to(mean, table.shape)
    out = dict(params)
    out["speaker_emb"] = dict(params["speaker_emb"], table=new)
    return out
