"""Convert pretrained torch checkpoints into this framework's param pytrees.

Supported sources (the external weights the reference relies on):
  * resemblyzer VoiceEncoder (GE2E d-vector LSTM)  -> evaluation/dvector npz
  * descriptinc MelGAN generator (torch.hub ckpt)  -> models/vocoder MelGAN
  * jik876 HiFi-GAN generator (config v1)          -> models/vocoder HiFi-GAN
  * the reference FastSpeech2 Lightning checkpoint -> full acoustic params

Weight-norm is folded (w = g * v / ||v||).  torch (CPU) is used only here,
offline — never in the compute path.

Usage:
  python tools/convert_torch_weights.py ge2e   encoder.pt  out/ge2e.npz
  python tools/convert_torch_weights.py melgan melgan.pt   out/melgan.npz
  python tools/convert_torch_weights.py hifigan g_02500000 out/hifigan.npz
  python tools/convert_torch_weights.py fastspeech2 meta.ckpt out/fs2.npz
  python tools/convert_torch_weights.py mosnet cnn_blstm.h5 out/mosnet.npz
  python tools/convert_torch_weights.py mbnet model-50000.pt out/mbnet.npz
  python tools/convert_torch_weights.py wav2vec2 <hf_model_dir> out/w2v2.npz
"""

import sys

import numpy as np


def _load_torch(path):
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict):
        for key in ("state_dict", "generator", "model"):
            if key in blob and isinstance(blob[key], dict):
                blob = blob[key]
                break
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in blob.items() if hasattr(v, "shape")}


def _fold_weight_norm(sd, base):
    """torch weight_norm stores <base>.weight_g / .weight_v."""
    g, v = sd.get(f"{base}.weight_g"), sd.get(f"{base}.weight_v")
    if g is None:
        return sd.get(f"{base}.weight")
    norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def convert_ge2e(src, dst):
    sd = _load_torch(src)
    out = {}
    for k in range(3):
        for part in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            out[f"lstm.{part}_l{k}"] = sd[f"lstm.{part}_l{k}"]
    out["linear.weight"] = sd["linear.weight"]
    out["linear.bias"] = sd["linear.bias"]
    np.savez(dst, **out)
    print(f"wrote {dst}: {len(out)} arrays")


def convert_melgan(src, dst):
    """descriptinc melgan generator: sequential indices
    model.{i} ... with weight-norm convs."""
    sd = _load_torch(src)
    out = {}
    for k in sorted(sd):
        if k.endswith(".weight_v"):
            base = k[: -len(".weight_v")]
            out[base + ".weight"] = _fold_weight_norm(sd, base)
        elif k.endswith((".bias",)):
            out[k] = sd[k]
        elif k.endswith(".weight") and k[:-7] + ".weight_v" not in sd:
            out[k] = sd[k]
    np.savez(dst, **out)
    print(f"wrote {dst}: {len(out)} arrays (weight-norm folded)")


convert_hifigan = convert_melgan  # same folding logic, different key layout


def convert_mosnet_h5(src, dst):
    """Official MOSNet CNN-BLSTM Keras checkpoint (``cnn_blstm.h5``, the
    artifact speechmetrics loads — reference ``evaluation/compute_mos.py:25``)
    -> npz for ``metatts_tpu/evaluation/mosnet.py``.

    Walks the legacy Keras HDF5 weight layout (``layer_names`` /
    ``weight_names`` attrs preserve creation order) and classifies layers by
    shape: 12 Conv2D (4-dim kernels, channels 16/32/64/128), one
    Bidirectional LSTM (6 arrays), two TimeDistributed Dense (2-dim
    kernels 512->128 and 128->1)."""
    import h5py

    def _names(attrs, key):
        return [n.decode() if isinstance(n, bytes) else n
                for n in attrs[key]]

    out = {}
    conv_i = 0
    with h5py.File(src, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        for lname in _names(root.attrs, "layer_names"):
            g = root[lname]
            wnames = _names(g.attrs, "weight_names")
            arrays = [(w, np.array(g[w])) for w in wnames]
            if not arrays:
                continue
            kernels = [a for _, a in arrays if a.ndim == 4]
            if kernels:                                   # Conv2D
                bias = next(a for _, a in arrays if a.ndim == 1)
                out[f"conv{conv_i}.kernel"] = kernels[0]
                out[f"conv{conv_i}.bias"] = bias
                conv_i += 1
            elif len(arrays) == 6:                        # Bidirectional LSTM
                for direction, tag in (("forward", "fwd"), ("backward", "bwd")):
                    sub = [(w, a) for w, a in arrays if direction in w]
                    assert len(sub) == 3, (lname, wnames)
                    by = {2: {}, 1: {}}
                    for w, a in sub:
                        if a.ndim == 1:
                            by[1]["bias"] = a
                        elif "recurrent" in w or a.shape[0] == a.shape[1] // 4:
                            by[2].setdefault("recurrent", a)
                        else:
                            by[2].setdefault("kernel", a)
                    out[f"blstm.{tag}.kernel"] = by[2]["kernel"]
                    out[f"blstm.{tag}.recurrent"] = by[2]["recurrent"]
                    out[f"blstm.{tag}.bias"] = by[1]["bias"]
            else:                                         # Dense
                kern = next(a for _, a in arrays if a.ndim == 2)
                bias = next(a for _, a in arrays if a.ndim == 1)
                name = "frame" if kern.shape[1] == 1 else "dense1"
                out[f"{name}.kernel"] = kern
                out[f"{name}.bias"] = bias
    assert conv_i == 12, f"expected 12 conv layers, found {conv_i}"
    assert "frame.kernel" in out and "dense1.kernel" in out
    np.savez(dst, **out)
    print(f"wrote {dst}: {len(out)} arrays")


def convert_mbnet_pt(src, dst):
    """Pytorch_MBNet pretrained checkpoint (``model-50000.pt``, the file the
    reference loads at ``evaluation/compute_mos.py:148``) -> npz for
    ``metatts_tpu/evaluation/mbnet.py``.

    Only the MEAN subnet is exported — ``only_mean_inference`` (the call the
    reference makes) never touches the bias net or judge embedding.  Keys
    are discovered by pattern so exact Sequential spacing (interleaved
    ReLU/Dropout indices) doesn't matter:

      mean-net convs   : 4-dim weights under a ``mean*conv`` prefix,
                         sorted by Sequential index (12 expected,
                         channels 16/32/64/128), OIHW -> HWIO
      mean-net BLSTM   : ``weight_ih_l0[_reverse]`` etc. under a
                         ``mean*(rnn|lstm)`` prefix; torch gate order
                         (i,f,g,o) already matches the runtime's scan;
                         bias = bias_ih + bias_hh
      mean-net linears : 2-dim weights under a ``mean*(dnn|linear|fc)``
                         prefix -> dense1 (256->128) + frame (128->1),
                         transposed to (in, out)
    """
    import re

    sd = _load_torch(src)
    out = {}

    convs = []
    for k, v in sd.items():
        if ("mean" in k and "conv" in k and k.endswith(".weight")
                and v.ndim == 4):
            m = re.search(r"\.(\d+)\.weight$", k)
            convs.append((int(m.group(1)) if m else len(convs), k, v))
    convs.sort()
    assert len(convs) == 12, \
        f"expected 12 mean-net convs, found {len(convs)}: {[k for _, k, _ in convs]}"
    for i, (_, k, w) in enumerate(convs):
        out[f"conv{i}.kernel"] = w.transpose(2, 3, 1, 0)      # OIHW -> HWIO
        out[f"conv{i}.bias"] = sd[k[:-len(".weight")] + ".bias"]
    chans = [out[f"conv{i}.kernel"].shape[3] for i in (2, 5, 8, 11)]
    assert chans == [16, 32, 64, 128], chans

    lstm_keys = [k for k in sd
                 if "mean" in k and ("rnn" in k or "lstm" in k)
                 and "weight_ih_l0" in k]
    assert lstm_keys, "mean-net LSTM weights not found"
    prefix = lstm_keys[0][:lstm_keys[0].index("weight_ih_l0")]
    for suffix, tag in (("", "fwd"), ("_reverse", "bwd")):
        out[f"blstm.{tag}.kernel"] = sd[f"{prefix}weight_ih_l0{suffix}"].T
        out[f"blstm.{tag}.recurrent"] = sd[f"{prefix}weight_hh_l0{suffix}"].T
        out[f"blstm.{tag}.bias"] = (sd[f"{prefix}bias_ih_l0{suffix}"]
                                    + sd[f"{prefix}bias_hh_l0{suffix}"])

    linears = []
    for k, v in sd.items():
        if ("mean" in k and any(t in k for t in ("dnn", "linear", "fc"))
                and k.endswith(".weight") and v.ndim == 2):
            m = re.search(r"\.(\d+)\.weight$", k)
            linears.append((int(m.group(1)) if m else len(linears), k, v))
    linears.sort()
    assert len(linears) == 2, \
        f"expected 2 mean-net linears, found {[k for _, k, _ in linears]}"
    for (_, k, w), name in zip(linears, ("dense1", "frame")):
        out[f"{name}.kernel"] = w.T                            # (in, out)
        out[f"{name}.bias"] = sd[k[:-len(".weight")] + ".bias"]
    assert out["frame.kernel"].shape[1] == 1, out["frame.kernel"].shape

    np.savez(dst, **out)
    print(f"wrote {dst}: {len(out)} arrays")


def convert_wav2vec2_pt(src, dst, config_json=None):
    """HuggingFace ``Wav2Vec2Model`` checkpoint (the ``facebook/wav2vec2-base``
    layout the reference's SSL pseudo-MOS scorer family builds on —
    reference ``evaluation/compute_mos.py:205,320``) -> npz for
    ``metatts_tpu/evaluation/wav2vec2.py``.

    ``src`` is either a transformers model directory (``config.json`` +
    ``pytorch_model.bin``) or a bare state-dict file; ``config_json`` may
    point at the config explicitly, else wav2vec2-base constants apply.
    A ``wav2vec2.`` key prefix (ForCTC/ForSequenceClassification wrappers)
    is stripped; an optional MOS regression head is exported when a
    ``head.weight`` / ``projector+classifier``-style 2-dim leaf maps the
    hidden size to 1 (finetuned SSL-MOS checkpoints).  Linear kernels are
    transposed to (in, out); conv kernels to WIO; the weight-normed
    positional conv is folded."""
    import json as _json
    import os as _os

    cfg_path = config_json
    if _os.path.isdir(src):
        cfg_path = cfg_path or _os.path.join(src, "config.json")
        for cand in ("pytorch_model.bin", "model.pt", "model.safetensors"):
            p = _os.path.join(src, cand)
            if _os.path.exists(p):
                src = p
                break
    if src.endswith(".safetensors"):
        from safetensors.numpy import load_file
        sd = load_file(src)
    else:
        sd = _load_torch(src)
    # strip wrapper prefix
    if any(k.startswith("wav2vec2.") for k in sd):
        sd = {k[len("wav2vec2."):] if k.startswith("wav2vec2.") else k: v
              for k, v in sd.items()}

    defaults = dict(conv_stride=[5, 2, 2, 2, 2, 2, 2],
                    num_conv_pos_embeddings=128,
                    num_conv_pos_embedding_groups=16,
                    num_attention_heads=12, num_hidden_layers=12)
    cfg = dict(defaults)
    if cfg_path and _os.path.exists(cfg_path):
        with open(cfg_path) as f:
            loaded = _json.load(f)
        cfg.update({k: loaded[k] for k in defaults if k in loaded})

    out = {"config": np.asarray(_json.dumps(cfg))}
    fe = "feature_extractor.conv_layers"
    for i in range(len(cfg["conv_stride"])):
        w = sd[f"{fe}.{i}.conv.weight"]            # (out, in, k)
        out[f"conv{i}.kernel"] = w.transpose(2, 1, 0)          # -> WIO
        if f"{fe}.{i}.conv.bias" in sd:
            out[f"conv{i}.bias"] = sd[f"{fe}.{i}.conv.bias"]
        if i == 0 and f"{fe}.0.layer_norm.weight" in sd:       # GroupNorm
            out["conv0.gn.scale"] = sd[f"{fe}.0.layer_norm.weight"]
            out["conv0.gn.bias"] = sd[f"{fe}.0.layer_norm.bias"]
    out["fp_ln.scale"] = sd["feature_projection.layer_norm.weight"]
    out["fp_ln.bias"] = sd["feature_projection.layer_norm.bias"]
    out["proj.kernel"] = sd["feature_projection.projection.weight"].T
    out["proj.bias"] = sd["feature_projection.projection.bias"]
    # the positional conv is weight-normed with dim=2 (torch weight_norm
    # over the KERNEL axis, unlike the dim=0 vocoder convs): fold with the
    # norm over dims (0, 1).  Legacy checkpoints store weight_g/weight_v;
    # newer torch stores parametrizations.weight.original{0,1}.
    pc = "encoder.pos_conv_embed.conv"
    if f"{pc}.weight_g" in sd:
        g, v = sd[f"{pc}.weight_g"], sd[f"{pc}.weight_v"]
    elif f"{pc}.parametrizations.weight.original0" in sd:
        g = sd[f"{pc}.parametrizations.weight.original0"]
        v = sd[f"{pc}.parametrizations.weight.original1"]
    else:
        g, v = None, sd[f"{pc}.weight"]
    if g is None:
        pos = v
    else:
        norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
        pos = g * v / np.maximum(norm, 1e-12)
    out["pos_conv.kernel"] = pos.transpose(2, 1, 0)            # -> WIO
    out["pos_conv.bias"] = sd["encoder.pos_conv_embed.conv.bias"]
    out["enc_ln.scale"] = sd["encoder.layer_norm.weight"]
    out["enc_ln.bias"] = sd["encoder.layer_norm.bias"]
    for i in range(cfg["num_hidden_layers"]):
        L = f"encoder.layers.{i}"
        for nm, t in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                      ("out", "out_proj")):
            out[f"layer{i}.attn.{nm}.kernel"] = sd[
                f"{L}.attention.{t}.weight"].T
            out[f"layer{i}.attn.{nm}.bias"] = sd[f"{L}.attention.{t}.bias"]
        out[f"layer{i}.ln.scale"] = sd[f"{L}.layer_norm.weight"]
        out[f"layer{i}.ln.bias"] = sd[f"{L}.layer_norm.bias"]
        out[f"layer{i}.ff_in.kernel"] = sd[
            f"{L}.feed_forward.intermediate_dense.weight"].T
        out[f"layer{i}.ff_in.bias"] = sd[
            f"{L}.feed_forward.intermediate_dense.bias"]
        out[f"layer{i}.ff_out.kernel"] = sd[
            f"{L}.feed_forward.output_dense.weight"].T
        out[f"layer{i}.ff_out.bias"] = sd[
            f"{L}.feed_forward.output_dense.bias"]
        out[f"layer{i}.final_ln.scale"] = sd[f"{L}.final_layer_norm.weight"]
        out[f"layer{i}.final_ln.bias"] = sd[f"{L}.final_layer_norm.bias"]
    # optional utterance-MOS regression head (finetuned SSL-MOS layouts).
    # The scorer applies the head to the MEAN-POOLED hidden states (H ==
    # cfg hidden_size), so only a direct (1, H) linear head is convertible:
    # a projector(768->256)+classifier(256->1) stack would need the
    # projector fused in and a dim-mismatched head would shape-error (or,
    # worse, silently miscalibrate if dims coincide) at score time.
    hidden = int(sd["encoder.layer_norm.weight"].shape[0])
    for hk in ("head.weight", "classifier.weight", "regression.weight"):
        if hk not in sd or sd[hk].ndim != 2 or sd[hk].shape[0] != 1:
            continue
        bk = hk[:-len(".weight")] + ".bias"
        if sd[hk].shape[1] != hidden:
            raise SystemExit(
                f"MOS head {hk} has input dim {sd[hk].shape[1]} != "
                f"hidden_size {hidden}: this is a projector-style SSL-MOS "
                "head (e.g. projector 768->256 + classifier 256->1), which "
                "this converter does not fuse — export a checkpoint with a "
                "direct (1, hidden) regression head instead")
        if bk not in sd:
            raise SystemExit(
                f"MOS head {hk} has no matching bias {bk}; bias-free heads "
                "are not supported (add a zero bias before converting)")
        out["head.kernel"] = sd[hk].T
        out["head.bias"] = sd[bk]
        break
    np.savez(dst, **out)
    print(f"wrote {dst}: {len(out)} arrays "
          f"({'with' if 'head.kernel' in out else 'no'} regression head)")


def convert_fastspeech2(src, dst):
    """Reference Lightning checkpoint -> npz of raw arrays; mapping into our
    pytree happens at load via tools/load_reference_fs2.py naming rules."""
    sd = _load_torch(src)
    np.savez(dst, **{k: v for k, v in sd.items()})
    print(f"wrote {dst}: {len(sd)} arrays")


if __name__ == "__main__":
    if len(sys.argv) != 4:
        raise SystemExit(__doc__)
    kind, src, dst = sys.argv[1:]
    {"ge2e": convert_ge2e, "melgan": convert_melgan,
     "hifigan": convert_hifigan, "mosnet": convert_mosnet_h5,
     "mbnet": convert_mbnet_pt, "wav2vec2": convert_wav2vec2_pt,
     "fastspeech2": convert_fastspeech2}[kind](src, dst)
