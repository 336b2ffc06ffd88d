"""Map a reference Meta-TTS FastSpeech2 state dict into our params pytree.

The reference checkpoints (PyTorch Lightning, ``lightning/systems/system.py``)
store ``model.<name>`` keys over the module tree in
``lightning/model/fastspeech2.py``.  This maps every parameter/buffer into
the functional pytree of ``metatts_tpu.models.fastspeech2``:

  torch name                                     -> pytree path
  encoder.src_word_emb.weight                    -> encoder.src_word_emb.table
  encoder.layer_stack.{i}.slf_attn.w_qs.weight   -> encoder.layers[i].attn.w_q.w (T)
  ...slf_attn.layer_norm.{weight,bias}           -> ...attn.ln.{scale,bias}
  ...pos_ffn.w_1.weight (conv OIH)               -> ...ffn.w1.w
  variance_adaptor.duration_predictor.conv_layer.conv1d_1.conv.weight
                                                 -> variance_adaptor.duration_predictor.conv1.w
  variance_adaptor.pitch_embedding.weight        -> variance_adaptor.pitch_embedding.table
  variance_adaptor.{pitch,energy}_bins           -> variance_adaptor.{pitch,energy}_bins
  mel_linear.weight                              -> mel_linear.w (T)
  postnet.convolutions.{i}.0.conv.weight         -> postnet.convs[i].conv.w
  postnet.convolutions.{i}.1.{weight,bias}       -> postnet.convs[i].bn.{scale,bias}
  postnet.convolutions.{i}.1.running_{mean,var}  -> state.postnet.convs[i].{mean,var}
  speaker_emb.model.weight                       -> speaker_emb.table

Linear weights are transposed (torch stores (out, in); we store (in, out));
conv kernels keep torch's OIH layout.  Usage: first export the torch ckpt
with ``convert_torch_weights.py fastspeech2 ckpt out.npz``, then::

    params, state, report = load_reference_fs2("out.npz", params, state)
"""

import re

import numpy as np
import jax.numpy as jnp


def _strip_prefix(name):
    for pre in ("model.", "module."):
        if name.startswith(pre):
            name = name[len(pre):]
    return name


def _set(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node[k]
    old = node[path[-1]]
    old_shape = tuple(np.asarray(old).shape)
    if tuple(value.shape) != old_shape:
        return f"shape mismatch at {'.'.join(map(str, path))}: " \
               f"{value.shape} vs {old_shape}"
    node[path[-1]] = jnp.asarray(value, jnp.asarray(old).dtype)
    return None


def _mha_paths(base, i):
    return {
        f"{base}.layer_stack.{i}.slf_attn.w_qs.weight":
            (["layers", i, "attn", "w_q", "w"], True),
        f"{base}.layer_stack.{i}.slf_attn.w_qs.bias":
            (["layers", i, "attn", "w_q", "b"], False),
        f"{base}.layer_stack.{i}.slf_attn.w_ks.weight":
            (["layers", i, "attn", "w_k", "w"], True),
        f"{base}.layer_stack.{i}.slf_attn.w_ks.bias":
            (["layers", i, "attn", "w_k", "b"], False),
        f"{base}.layer_stack.{i}.slf_attn.w_vs.weight":
            (["layers", i, "attn", "w_v", "w"], True),
        f"{base}.layer_stack.{i}.slf_attn.w_vs.bias":
            (["layers", i, "attn", "w_v", "b"], False),
        f"{base}.layer_stack.{i}.slf_attn.fc.weight":
            (["layers", i, "attn", "fc", "w"], True),
        f"{base}.layer_stack.{i}.slf_attn.fc.bias":
            (["layers", i, "attn", "fc", "b"], False),
        f"{base}.layer_stack.{i}.slf_attn.layer_norm.weight":
            (["layers", i, "attn", "ln", "scale"], False),
        f"{base}.layer_stack.{i}.slf_attn.layer_norm.bias":
            (["layers", i, "attn", "ln", "bias"], False),
        f"{base}.layer_stack.{i}.pos_ffn.w_1.weight":
            (["layers", i, "ffn", "w1", "w"], False),
        f"{base}.layer_stack.{i}.pos_ffn.w_1.bias":
            (["layers", i, "ffn", "w1", "b"], False),
        f"{base}.layer_stack.{i}.pos_ffn.w_2.weight":
            (["layers", i, "ffn", "w2", "w"], False),
        f"{base}.layer_stack.{i}.pos_ffn.w_2.bias":
            (["layers", i, "ffn", "w2", "b"], False),
        f"{base}.layer_stack.{i}.pos_ffn.layer_norm.weight":
            (["layers", i, "ffn", "ln", "scale"], False),
        f"{base}.layer_stack.{i}.pos_ffn.layer_norm.bias":
            (["layers", i, "ffn", "ln", "bias"], False),
    }


def _vp_paths(name):
    return {
        f"variance_adaptor.{name}.conv_layer.conv1d_1.conv.weight":
            ([name, "conv1", "w"], False),
        f"variance_adaptor.{name}.conv_layer.conv1d_1.conv.bias":
            ([name, "conv1", "b"], False),
        f"variance_adaptor.{name}.conv_layer.layer_norm_1.weight":
            ([name, "ln1", "scale"], False),
        f"variance_adaptor.{name}.conv_layer.layer_norm_1.bias":
            ([name, "ln1", "bias"], False),
        f"variance_adaptor.{name}.conv_layer.conv1d_2.conv.weight":
            ([name, "conv2", "w"], False),
        f"variance_adaptor.{name}.conv_layer.conv1d_2.conv.bias":
            ([name, "conv2", "b"], False),
        f"variance_adaptor.{name}.conv_layer.layer_norm_2.weight":
            ([name, "ln2", "scale"], False),
        f"variance_adaptor.{name}.conv_layer.layer_norm_2.bias":
            ([name, "ln2", "bias"], False),
        f"variance_adaptor.{name}.linear_layer.weight":
            ([name, "linear", "w"], True),
        f"variance_adaptor.{name}.linear_layer.bias":
            ([name, "linear", "b"], False),
    }


def build_mapping(params):
    """torch name -> (("params"|"state"), path list, transpose?)."""
    m = {}
    m["encoder.src_word_emb.weight"] = \
        ("params", ["encoder", "src_word_emb", "table"], False)
    for i in range(len(params["encoder"]["layers"])):
        for k, (path, t) in _mha_paths("encoder", i).items():
            m[k] = ("params", ["encoder"] + path, t)
    for i in range(len(params["decoder"]["layers"])):
        for k, (path, t) in _mha_paths("decoder", i).items():
            m[k] = ("params", ["decoder"] + path, t)
    for name in ("duration_predictor", "pitch_predictor",
                 "energy_predictor"):
        for k, (path, t) in _vp_paths(name).items():
            m[k] = ("params", ["variance_adaptor"] + path, t)
    for name in ("pitch", "energy"):
        m[f"variance_adaptor.{name}_embedding.weight"] = \
            ("params", ["variance_adaptor", f"{name}_embedding", "table"],
             False)
        m[f"variance_adaptor.{name}_bins"] = \
            ("params", ["variance_adaptor", f"{name}_bins"], False)
    m["mel_linear.weight"] = ("params", ["mel_linear", "w"], True)
    m["mel_linear.bias"] = ("params", ["mel_linear", "b"], False)
    for i in range(len(params["postnet"]["convs"])):
        m[f"postnet.convolutions.{i}.0.conv.weight"] = \
            ("params", ["postnet", "convs", i, "conv", "w"], False)
        m[f"postnet.convolutions.{i}.0.conv.bias"] = \
            ("params", ["postnet", "convs", i, "conv", "b"], False)
        m[f"postnet.convolutions.{i}.1.weight"] = \
            ("params", ["postnet", "convs", i, "bn", "scale"], False)
        m[f"postnet.convolutions.{i}.1.bias"] = \
            ("params", ["postnet", "convs", i, "bn", "bias"], False)
        m[f"postnet.convolutions.{i}.1.running_mean"] = \
            ("state", ["postnet", "convs", i, "mean"], False)
        m[f"postnet.convolutions.{i}.1.running_var"] = \
            ("state", ["postnet", "convs", i, "var"], False)
    if "speaker_emb" in params and "table" in params["speaker_emb"]:
        m["speaker_emb.model.weight"] = \
            ("params", ["speaker_emb", "table"], False)
    return m


def load_reference_fs2(npz_path, params, state):
    """Returns (params, state, report). Unknown keys and shape mismatches
    are reported, not fatal (reference ckpt-surgery spirit)."""
    import copy
    params = copy.deepcopy(
        {k: v for k, v in params.items()})  # shallow-ish; _set mutates dicts
    import jax
    params = jax.tree.map(lambda x: x, params)  # fresh container structure
    state = jax.tree.map(lambda x: x, state)
    sd = dict(np.load(npz_path))
    mapping = build_mapping(params)
    report, loaded = [], 0
    for raw_name, value in sd.items():
        name = _strip_prefix(raw_name)
        if name not in mapping:
            report.append(f"unmapped key: {name}")
            continue
        which, path, transpose = mapping[name]
        v = value.T if transpose else value
        err = _set(params if which == "params" else state, path, v)
        if err:
            report.append(err)
        else:
            loaded += 1
    report.insert(0, f"loaded {loaded}/{len(sd)} tensors")
    return params, state, report


def export_reference_shaped_npz(params, state, out_path):
    """Inverse mapping: write OUR pytree as a reference-shaped npz (used by
    the round-trip test; also handy for comparing against torch runs)."""
    mapping = build_mapping(params)
    out = {}
    for name, (which, path, transpose) in mapping.items():
        node = params if which == "params" else state
        for k in path:
            node = node[k]
        v = np.asarray(node)
        out[name] = v.T if transpose else v
    np.savez(out_path, **out)
    return out_path
