"""Minimal pure-functional NN layers over params pytrees.

Every layer is an (init, apply) pair: ``init`` returns a nested dict of
jnp arrays, ``apply`` is a pure function.  This replaces torch.nn modules;
the pytree structure is the checkpoint format and the unit of meta-learning
(MAML adapts sub-pytrees selected by top-level key).

Precision policy: params live in float32; matmuls/convs run in the model's
``compute_dtype`` (bfloat16 on TPU) with float32 accumulation
(``preferred_element_type``); layer norms, softmax and losses stay float32.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..utils.backend import is_tpu as _is_tpu


def uniform_init(rng, shape, scale):
    return jax.random.uniform(rng, shape, jnp.float32, -scale, scale)


# ------------------------------------------------------------------ linear

def linear_init(rng, d_in, d_out, bias=True):
    kw, kb = jax.random.split(rng)
    s = 1.0 / np.sqrt(d_in)
    p = {"w": uniform_init(kw, (d_in, d_out), s)}
    if bias:
        p["b"] = uniform_init(kb, (d_out,), s)
    return p


def linear(p, x, cdtype=jnp.float32, out_dtype=jnp.float32):
    y = jnp.dot(x.astype(cdtype), p["w"].astype(cdtype),
                preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y.astype(out_dtype)


# --------------------------------------------------------------- embedding

def embedding_init(rng, n, d, padding_idx=None):
    t = jax.random.normal(rng, (n, d), jnp.float32)
    if padding_idx is not None:
        t = t.at[padding_idx].set(0.0)
    return {"table": t}


def embedding(p, ids):
    return jnp.take(p["table"], ids, axis=0)


# --------------------------------------------------------------- layernorm

def layer_norm_init(d):
    return {"scale": jnp.ones((d,), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32)}


def layer_norm(p, x, eps=1e-5, out_dtype=jnp.float32):
    # stats always in fp32; out_dtype lets the residual stream stay bf16
    # (halves every saved activation on second-order paths)
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(out_dtype)


# --------------------------------------------------------------- batchnorm

def batch_norm_init(d):
    params = {"scale": jnp.ones((d,), jnp.float32),
              "bias": jnp.zeros((d,), jnp.float32)}
    state = {"mean": jnp.zeros((d,), jnp.float32),
             "var": jnp.ones((d,), jnp.float32)}
    return params, state


def batch_norm(p, state, x, train, momentum=0.1, eps=1e-5):
    """BatchNorm over (B, T, C) reducing (B, T). Returns (y, new_state)."""
    if train:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(0, 1))
        var = jnp.var(x32, axis=(0, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * var,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x.astype(jnp.float32) - mean) * lax.rsqrt(var + eps)
    return y * p["scale"] + p["bias"], new_state


# ------------------------------------------------------------------ conv1d

def conv1d_init(rng, c_in, c_out, k, bias=True):
    kw, kb = jax.random.split(rng)
    s = 1.0 / np.sqrt(c_in * k)
    p = {"w": uniform_init(kw, (c_out, c_in, k), s)}  # OIH, torch layout
    if bias:
        p["b"] = uniform_init(kb, (c_out,), s)
    return p


def _conv1d_native(w, xc, cdtype, dilation):
    """lax conv lowering: saves only (x, w) for backward, where im2col saves
    the K-times-larger cols tensor — the dominant residual in second-order
    inner loops.  TPU-only: the XLA-CPU conv lowering's compile time is
    pathological at >=256 channels (CLAUDE.md)."""
    K = w.shape[-1]
    pad = dilation * (K - 1) // 2
    return lax.conv_general_dilated(
        xc, w.astype(cdtype), window_strides=(1,),
        padding=[(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "OIW", "NWC")).astype(jnp.float32)


def _conv1d_im2col(w, xc, cdtype, dilation):
    """Concatenate the K dilated shifts, one (B,T,K*I) @ (K*I,O) contraction:
    a single large MXU matmul, and orders of magnitude faster to compile
    than the conv lowering on the CPU backend."""
    K = w.shape[-1]
    T = xc.shape[1]
    pad = dilation * (K - 1) // 2
    xp = jnp.pad(xc, ((0, 0), (pad, pad), (0, 0)))
    cols = jnp.concatenate(
        [lax.dynamic_slice_in_dim(xp, k * dilation, T, axis=1)
         for k in range(K)], axis=-1)     # (B, T, K*I)
    wmat = jnp.concatenate([w[:, :, k].T for k in range(K)],
                           axis=0).astype(cdtype)  # (K*I, O)
    return jnp.dot(cols, wmat).astype(jnp.float32)


def conv1d(p, x, cdtype=jnp.float32, dilation=1, stride=1, padding="SAME",
           out_dtype=jnp.float32, impl=None):
    """x: (B, T, C_in) -> (B, T, C_out); kernel stored OIH (torch layout).

    SAME padding, stride 1 (the only mode the acoustic model uses); odd
    kernel sizes.  ``impl``: "native" | "im2col" | None (auto: native conv
    on TPU for the smaller backward residuals, im2col elsewhere for CPU
    compile time — see the branch helpers).
    """
    assert stride == 1 and padding == "SAME"
    w = p["w"]                                # (O, I, K)
    K = w.shape[-1]
    xc = x.astype(cdtype)
    if impl is None:
        # trace-time only; lets tools/probe_attn_ab.py A/B the branches on
        # hardware without threading a config through every call site
        impl = os.environ.get("METATTS_CONV_IMPL")
    if K == 1:
        y = jnp.dot(xc, w[:, :, 0].T.astype(cdtype)).astype(jnp.float32)
    elif impl == "native" or (impl is None and _is_tpu()):
        y = _conv1d_native(w, xc, cdtype, dilation)
    else:
        y = _conv1d_im2col(w, xc, cdtype, dilation)
    if "b" in p:
        y = y + p["b"]
    return y.astype(out_dtype)


def conv_transpose1d_init(rng, c_in, c_out, k, bias=True):
    kw, kb = jax.random.split(rng)
    s = 1.0 / np.sqrt(c_in * k)
    p = {"w": uniform_init(kw, (c_in, c_out, k), s)}  # IOH
    if bias:
        p["b"] = uniform_init(kb, (c_out,), s)
    return p


def conv_transpose1d(p, x, stride, cdtype=jnp.float32, padding=0):
    """Transposed conv over (B, T, C); `padding` is torch-style int padding."""
    k = p["w"].shape[-1]
    pad = (k - 1 - padding, k - 1 - padding)
    y = lax.conv_general_dilated(
        x.astype(cdtype),
        jnp.flip(p["w"], -1).transpose(1, 0, 2).astype(cdtype),  # IOH -> OIH
        window_strides=(1,),
        padding=[pad],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "OIH", "NHC"),
    ).astype(jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y


# ----------------------------------------------------------------- dropout

def dropout(rng, x, rate, train):
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# -------------------------------------------------------------------- lstm

def lstm_init(rng, d_in, d_hidden, n_layers):
    """Multi-layer LSTM params (torch gate order i, f, g, o)."""
    layers = []
    for i in range(n_layers):
        din = d_in if i == 0 else d_hidden
        k1, k2, k3, k4, rng = jax.random.split(rng, 5)
        s = 1.0 / np.sqrt(d_hidden)
        layers.append({
            "w_ih": uniform_init(k1, (din, 4 * d_hidden), s),
            "w_hh": uniform_init(k2, (d_hidden, 4 * d_hidden), s),
            "b_ih": uniform_init(k3, (4 * d_hidden,), s),
            "b_hh": uniform_init(k4, (4 * d_hidden,), s),
        })
    return {"layers": layers}


def lstm(p, x, cdtype=jnp.float32):
    """x: (B, T, D) -> outputs (B, T, H), final hidden per layer (n, B, H)."""
    B = x.shape[0]
    finals = []
    for lp in p["layers"]:
        H = lp["w_hh"].shape[0]
        xw = jnp.einsum("btd,dg->btg", x.astype(cdtype), lp["w_ih"].astype(cdtype),
                        preferred_element_type=jnp.float32) + lp["b_ih"] + lp["b_hh"]

        def step(carry, xt):
            h, c = carry
            gates = xt + jnp.dot(h.astype(cdtype), lp["w_hh"].astype(cdtype),
                                 preferred_element_type=jnp.float32)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        init = (jnp.zeros((B, H), jnp.float32), jnp.zeros((B, H), jnp.float32))
        (h_T, _), hs = lax.scan(step, init, xw.transpose(1, 0, 2))
        x = hs.transpose(1, 0, 2)
        finals.append(h_T)
    return x, jnp.stack(finals)
