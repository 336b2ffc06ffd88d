"""FFT-block transformer encoder/decoder (FastSpeech2 backbone).

Functional re-design of the reference ``transformer/`` stack
(``Models.py``, ``Layers.py``, ``SubLayers.py``, ``Modules.py``):
  * FFTBlock = post-LN multi-head self-attention + conv1d(k=9,1) FFN,
    outputs zeroed at padded positions;
  * sinusoid positional table added to embeddings (table is a constant,
    not a parameter);
  * encoder embeds phoneme IDs (vocab = len(symbols)+1, PAD=0).

TPU notes: attention is a fused einsum chain (XLA maps QK^T / AV onto the
MXU and fuses the masked softmax); sequences are statically padded so there
is one compiled program per shape bucket.  Head-folding bmm tricks from the
reference are unnecessary — batched einsum is native here.
"""

import jax
import jax.numpy as jnp
import numpy as np

from . import nn
from ..text.symbols import symbols


def sinusoid_table(n_position, d_hid):
    """Reference ``Models.py:10-30``."""
    pos = np.arange(n_position)[:, None]
    dim = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (dim // 2) / d_hid)
    table = np.zeros((n_position, d_hid), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


# ------------------------------------------------------------ attention

def mha_init(rng, d_model, n_head, d_k, d_v):
    k1, k2, k3, k4, rng = jax.random.split(rng, 5)
    return {
        "w_q": nn.linear_init(k1, d_model, n_head * d_k),
        "w_k": nn.linear_init(k2, d_model, n_head * d_k),
        "w_v": nn.linear_init(k3, d_model, n_head * d_v),
        "fc": nn.linear_init(k4, n_head * d_v, d_model),
        "ln": nn.layer_norm_init(d_model),
    }


def mha(p, x, key_valid, n_head, *, cdtype, drop_rate, train, rng,
        attn_impl="einsum", scores_dtype=jnp.float32, adtype=jnp.float32):
    """Self-attention, post-LN residual. key_valid: (B, T) bool.

    attn_impl:
      * "einsum" — materialized scores; supports double backward (required
        inside the second-order MAML inner loop);
      * "flash"  — Pallas flash kernel (ops/pallas/attention.py): no (T, T)
        HBM residuals, used on every once-differentiated path.
    """
    B, T, D = x.shape
    d_k = p["w_q"]["w"].shape[1] // n_head
    q = nn.linear(p["w_q"], x, cdtype, adtype).reshape(B, T, n_head, d_k)
    k = nn.linear(p["w_k"], x, cdtype, adtype).reshape(B, T, n_head, d_k)
    v = nn.linear(p["w_v"], x, cdtype, adtype).reshape(B, T, n_head, d_k)
    if attn_impl == "flash":
        from ..ops.pallas.attention import flash_attention
        # feed the kernel in the compute dtype (bf16 on TPU): contractions
        # run at double MXU rate, softmax stats stay fp32 inside the kernel
        fold = lambda t: t.transpose(0, 2, 1, 3).reshape(
            B * n_head, T, d_k).astype(cdtype)
        mask = jnp.repeat(key_valid.astype(jnp.float32), n_head, axis=0)
        o = flash_attention(fold(q), fold(k), fold(v), mask)
        out = o.reshape(B, n_head, T, d_k).transpose(0, 2, 1, 3)
    else:
        def attn_core(q_, k_, v_, valid_):
            # scale folded into q: a bare `scores / np.sqrt(d_k)` would
            # promote bf16 scores to f32 (numpy f64 scalar promotion) and
            # silently defeat the scores_dtype knob
            scale = jnp.asarray(1.0 / np.sqrt(d_k), cdtype)
            scores = jnp.einsum("bqhd,bkhd->bhqk",
                                q_.astype(cdtype) * scale,
                                k_.astype(cdtype),
                                preferred_element_type=scores_dtype)
            scores = jnp.where(valid_[:, None, None, :], scores,
                               jnp.asarray(-1e9, scores_dtype))
            # softmax max-subtraction keeps bf16 scores numerically safe;
            # the (B,h,T,T) residuals halve when scores_dtype is bfloat16
            attn = jax.nn.softmax(scores, axis=-1)
            # use the parameter v_, not the closed-over v: a captured array
            # would be a residual that bypasses the nothing_saveable remat
            # policy below (and would silently ignore a different caller arg)
            return jnp.einsum("bhqk,bkhd->bqhd", attn.astype(cdtype),
                              v_.astype(cdtype),
                              preferred_element_type=jnp.float32)

        if attn_impl == "einsum_remat":
            # save only q/k/v (B,T,h,d); recompute the (B,h,T,T) scores in
            # every backward pass — bounds second-order residual memory
            attn_core = jax.checkpoint(
                attn_core, policy=jax.checkpoint_policies.nothing_saveable)
        out = attn_core(q, k, v, key_valid)
    out = nn.linear(p["fc"], out.reshape(B, T, n_head * d_k), cdtype, adtype)
    out = nn.dropout(rng, out, drop_rate, train)
    return nn.layer_norm(p["ln"], out + x, out_dtype=adtype)


# ------------------------------------------------------------------- ffn

def ffn_init(rng, d_model, d_inner, kernel_sizes):
    k1, k2, rng = jax.random.split(rng, 3)
    return {
        "w1": nn.conv1d_init(k1, d_model, d_inner, kernel_sizes[0]),
        "w2": nn.conv1d_init(k2, d_inner, d_model, kernel_sizes[1]),
        "ln": nn.layer_norm_init(d_model),
    }


def ffn(p, x, *, cdtype, drop_rate, train, rng, adtype=jnp.float32):
    h = nn.conv1d(p["w1"], x, cdtype, out_dtype=adtype)
    h = jax.nn.relu(h)
    h = nn.conv1d(p["w2"], h, cdtype, out_dtype=adtype)
    h = nn.dropout(rng, h, drop_rate, train)
    return nn.layer_norm(p["ln"], h + x, out_dtype=adtype)


# ------------------------------------------------------------- fft block

def fft_block_init(rng, d_model, n_head, d_k, d_v, d_inner, kernel_sizes):
    k1, k2 = jax.random.split(rng)
    return {"attn": mha_init(k1, d_model, n_head, d_k, d_v),
            "ffn": ffn_init(k2, d_model, d_inner, kernel_sizes)}


def fft_block(p, x, valid, n_head, *, cdtype, drop_rate, train, rng,
              attn_impl="einsum", scores_dtype=jnp.float32,
              adtype=jnp.float32):
    r1, r2 = jax.random.split(rng) if rng is not None else (None, None)
    x = mha(p["attn"], x, valid, n_head,
            cdtype=cdtype, drop_rate=drop_rate, train=train, rng=r1,
            attn_impl=attn_impl, scores_dtype=scores_dtype, adtype=adtype)
    x = jnp.where(valid[..., None], x, jnp.zeros((), x.dtype))
    x = ffn(p["ffn"], x, cdtype=cdtype, drop_rate=drop_rate, train=train,
            rng=r2, adtype=adtype)
    return jnp.where(valid[..., None], x, jnp.zeros((), x.dtype))


# --------------------------------------------------------------- encoder

def encoder_init(rng, cfg):
    t = cfg["transformer"]
    d = t["encoder_hidden"]
    d_k = d // t["encoder_head"]
    keys = jax.random.split(rng, t["encoder_layer"] + 1)
    return {
        "src_word_emb": nn.embedding_init(keys[0], len(symbols) + 1, d,
                                          padding_idx=0),
        "layers": [
            fft_block_init(keys[i + 1], d, t["encoder_head"], d_k, d_k,
                           t["conv_filter_size"], t["conv_kernel_size"])
            for i in range(t["encoder_layer"])
        ],
    }


def encoder_apply(p, texts, src_valid, cfg, *, train, rng, pos_table):
    """texts: (B, L) int32 -> (B, L, H)."""
    t = cfg["transformer"]
    cdtype = jnp.dtype(cfg.get("compute_dtype", "float32"))
    L = texts.shape[1]
    adtype = jnp.dtype(cfg.get("activation_dtype", "float32"))
    x = (nn.embedding(p["src_word_emb"], texts)
         + pos_table[None, :L]).astype(adtype)
    if _use_fused_infer(cfg, train, t["encoder_hidden"], t["encoder_head"]):
        from ..ops.pallas.fftblock import fused_fft_block
        for lp in p["layers"]:
            x = fused_fft_block(lp, x, src_valid,
                                t["encoder_head"]).astype(adtype)
        return x
    blk = _make_block(t["encoder_head"], cdtype, t["encoder_dropout"], train,
                      cfg.get("remat", False), resolve_attn_impl(cfg),
                      jnp.dtype(cfg.get("attention_scores_dtype",
                                        "float32")), adtype)
    return _run_layers(p["layers"], blk, x, src_valid, rng, cfg)


def _use_fused_infer(cfg, train, d_model, n_head):
    """Fused FFT-block megakernel gate: explicitly opted in (serve.py sets
    the private _fused_infer flag on its jitted synthesis configs), eval
    mode, TPU, and MXU-tileable dims.  Never reached by differentiated
    paths — the kernel has no VJP by design (test-time adaptation
    differentiates eval-mode forwards through the regular path)."""
    if not cfg.get("_fused_infer") or train:
        return False
    from ..utils.backend import is_tpu
    if not is_tpu() and not cfg.get("_fused_interpret"):
        return False
    from ..ops.pallas.fftblock import fused_block_supported
    return fused_block_supported(d_model, d_model // n_head)


def resolve_attn_impl(cfg):
    """cfg["attention_impl"]: "flash" | "einsum" | "auto" (default).
    auto -> flash on TPU, einsum elsewhere (the Pallas interpreter is slow
    on CPU).  The meta-learning inner loop overrides to einsum because
    custom_vjp kernels are not twice-differentiable."""
    impl = cfg.get("attention_impl", "auto")
    if impl == "auto":
        from ..utils.backend import is_tpu
        impl = "flash" if is_tpu() else "einsum"
    return impl


def _make_block(n_head, cdtype, drop_rate, train, remat, attn_impl,
                scores_dtype=jnp.float32, adtype=jnp.float32):
    def run(lp, x, valid, lrng):
        return fft_block(lp, x, valid, n_head, cdtype=cdtype,
                         drop_rate=drop_rate, train=train, rng=lrng,
                         attn_impl=attn_impl, scores_dtype=scores_dtype,
                         adtype=adtype)
    return jax.checkpoint(run) if remat else run


def resolve_layer_scan(cfg):
    """``model.layer_scan``: False (unroll) | True (scan) | int >= 2 (scan
    with that unroll factor) | "auto" (backend default).

    "auto" resolves to scan on the CPU backend — the unrolled full-depth
    second-order program is a pathological single-core LLVM compile
    (>45 min; scanned: ~2 min) — and to unrolled layers everywhere else
    (TPU, incl. the tunneled "axon" platform, whose backend name is NOT
    "tpu" — testing ``!= "tpu"`` silently put TPU runs on the scanned
    path and cost 20% meta-step time: 193 ms vs 159 ms on v5e; scan
    bodies block cross-layer fusion).  The ~4x TPU compile saving scan
    would buy is covered by the persistent compilation cache instead.
    """
    v = cfg.get("layer_scan", "auto")
    if v == "auto":
        return jax.default_backend() == "cpu"
    return v


def _run_layers(layers, blk, x, valid, rng, cfg):
    """Apply the FFT-block stack.

    With layer_scan on (see ``resolve_layer_scan``), the (structurally
    identical) per-layer param pytrees are stacked and run under ONE
    ``lax.scan`` instead of unrolling N layers into the XLA program — the
    program is ~N× smaller, which cuts compile time correspondingly.  Math
    is identical; per-layer dropout rngs are pre-split and scanned
    alongside.  An integer value scans with that unroll factor (program
    size ~N/u, fusion across u consecutive layers).
    """
    scan = resolve_layer_scan(cfg)
    if not scan or len(layers) == 1:
        for i, lp in enumerate(layers):
            lrng = jax.random.fold_in(rng, i) if rng is not None else None
            x = blk(lp, x, valid, lrng)
        return x
    unroll = scan if isinstance(scan, int) and scan is not True else 1
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    if rng is not None:
        rngs = jnp.stack([jax.random.fold_in(rng, i)
                          for i in range(len(layers))])

        def body(h, xs):
            lp, lrng = xs
            return blk(lp, h, valid, lrng), None

        x, _ = jax.lax.scan(body, x, (stacked, rngs), unroll=unroll)
    else:
        def body(h, lp):
            return blk(lp, h, valid, None), None

        x, _ = jax.lax.scan(body, x, stacked, unroll=unroll)
    return x


# --------------------------------------------------------------- decoder

def decoder_init(rng, cfg):
    t = cfg["transformer"]
    d = t["decoder_hidden"]
    d_k = d // t["decoder_head"]
    keys = jax.random.split(rng, t["decoder_layer"])
    return {
        "layers": [
            fft_block_init(keys[i], d, t["decoder_head"], d_k, d_k,
                           t["conv_filter_size"], t["conv_kernel_size"])
            for i in range(t["decoder_layer"])
        ],
    }


def decoder_apply(p, x, mel_valid, cfg, *, train, rng, pos_table):
    t = cfg["transformer"]
    cdtype = jnp.dtype(cfg.get("compute_dtype", "float32"))
    T = x.shape[1]
    adtype = jnp.dtype(cfg.get("activation_dtype", "float32"))
    x = (x + pos_table[None, :T]).astype(adtype)
    if _use_fused_infer(cfg, train, t["decoder_hidden"], t["decoder_head"]):
        from ..ops.pallas.fftblock import fused_fft_block
        for lp in p["layers"]:
            x = fused_fft_block(lp, x, mel_valid,
                                t["decoder_head"]).astype(adtype)
        return x
    blk = _make_block(t["decoder_head"], cdtype, t["decoder_dropout"], train,
                      cfg.get("remat", False), resolve_attn_impl(cfg),
                      jnp.dtype(cfg.get("attention_scores_dtype",
                                        "float32")), adtype)
    return _run_layers(p["layers"], blk, x, mel_valid, rng, cfg)


# --------------------------------------------------------------- postnet

def postnet_init(rng, n_mels=80, d=512, k=5, n_convs=5):
    keys = jax.random.split(rng, n_convs)
    params, state = [], []
    chans = [n_mels] + [d] * (n_convs - 1) + [n_mels]
    for i in range(n_convs):
        cp = nn.conv1d_init(keys[i], chans[i], chans[i + 1], k)
        bp, bs = nn.batch_norm_init(chans[i + 1])
        params.append({"conv": cp, "bn": bp})
        state.append(bs)
    return {"convs": params}, {"convs": state}


def postnet_apply(p, state, mel, *, cdtype, train, rng):
    """5-conv residual refiner (reference ``Layers.py:67-137``).
    Returns (residual, new_state)."""
    x = mel
    new_states = []
    n = len(p["convs"])
    for i, (cp, bs) in enumerate(zip(p["convs"], state["convs"])):
        x = nn.conv1d(cp["conv"], x, cdtype)
        x, ns = nn.batch_norm(cp["bn"], bs, x, train)
        new_states.append(ns)
        if i < n - 1:
            x = jnp.tanh(x)
        lrng = jax.random.fold_in(rng, i) if rng is not None else None
        x = nn.dropout(lrng, x, 0.5, train)
    return x, {"convs": new_states}
