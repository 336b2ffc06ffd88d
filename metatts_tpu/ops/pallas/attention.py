"""Flash self-attention Pallas kernel with custom VJP.

Why: the FFT blocks' O(T^2) attention at T<=1024 is the framework's HBM
hot-spot — under the second-order MAML step XLA materializes the fp32
(B, h, T, T) score tensors of every inner iteration as residuals (observed:
47.8 GB requested for 4 episodes/chip -> OOM).  This kernel never writes the
score matrix to HBM: forward emits (out, logsumexp), backward recomputes
probabilities block-wise in VMEM (standard flash-attention recomputation).

Scope: bidirectional self-attention with a key-validity mask, d_head <= 128,
T a multiple of the q-block (sequences are bucket-padded anyway).  Layout in:
q, k, v as (BH, T, D); mask (BH, T) float {0, 1}.

Forward grid: (BH, T / TQ) — each program computes one q block against the
full K/V (<= 1024 x 128 fp32 = 512 KB each, comfortably VMEM-resident).
Backward grid: (BH,) — one program per head accumulates dk/dv over q blocks
in VMEM scratch (avoids cross-program accumulation races) and writes dq per
block.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TQ = 128
NEG = -1e9


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *, scale):
    q = q_ref[0]                                   # (TQ, D) bf16 or f32
    k = k_ref[0]                                   # (T, D)
    v = v_ref[0]
    bias = (mask_ref[0] - 1.0) * -NEG              # (1, T): 0 valid
    # MXU contraction in the input dtype (bf16 doubles throughput + halves
    # VMEM traffic); softmax statistics and accumulation stay fp32
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    s = s + bias
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = (jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
                / jnp.maximum(l, 1e-30))
    lse_ref[0] = (m + jnp.log(jnp.maximum(l, 1e-30)))[:, 0][None, :]


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, tq):
    k = k_ref[0]
    v = v_ref[0]
    bias = (mask_ref[0] - 1.0) * -NEG              # (1, T)
    T = k.shape[0]
    n_blocks = T // tq

    dk_acc = jnp.zeros(k.shape, jnp.float32)   # fp32 accumulators
    dv_acc = jnp.zeros(v.shape, jnp.float32)

    def body(j, carry):
        dk_acc, dv_acc = carry
        start = j * tq
        # ref-level dynamic slices (value-level dynamic_slice has no Pallas
        # TPU lowering)
        q = q_ref[0, pl.ds(start, tq), :]
        o = o_ref[0, pl.ds(start, tq), :]
        do = do_ref[0, pl.ds(start, tq), :]
        lse = lse_ref[0, :, pl.ds(start, tq)]      # (1, tq)
        cd = k.dtype                               # contraction dtype
        do_c = do.astype(cd)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        s = s + bias
        p = jnp.exp(s - lse.T)                     # (TQ, T) fp32
        p_c = p.astype(cd)
        dv_acc = dv_acc + jnp.dot(p_c.T, do_c,
                                  preferred_element_type=jnp.float32)
        dp = jnp.dot(do_c, v.T, preferred_element_type=jnp.float32)
        delta = jnp.sum(do * o, axis=-1, keepdims=True)
        ds = p * (dp - delta) * scale              # (TQ, T) fp32
        ds_c = ds.astype(cd)
        dq_ref[0, pl.ds(start, tq), :] = jnp.dot(
            ds_c, k, preferred_element_type=jnp.float32).astype(
                dq_ref.dtype)
        dk_acc = dk_acc + jnp.dot(ds_c.T, q,
                                  preferred_element_type=jnp.float32)
        return dk_acc, dv_acc

    dk_acc, dv_acc = jax.lax.fori_loop(0, n_blocks, body, (dk_acc, dv_acc))
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _fwd_call(q, k, v, mask, scale, tq, interpret):
    BH, T, D = q.shape
    mask = mask.reshape(BH, 1, T)
    grid = (BH, T // tq)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, D), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, D), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tq), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, T, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, 1, T), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(q, k, v, mask)
    return o, lse


def _bwd_call(q, k, v, mask, o, lse, do, scale, tq, interpret):
    BH, T, D = q.shape
    mask = mask.reshape(BH, 1, T)
    full = lambda b: (b, 0, 0)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, tq=tq),
        grid=(BH,),
        in_specs=[
            pl.BlockSpec((1, T, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), full, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, T, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), full, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, T, D), q.dtype),
            jax.ShapeDtypeStruct((BH, T, D), k.dtype),
            jax.ShapeDtypeStruct((BH, T, D), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(q, k, v, mask, o, lse, do)
    return dq, dk, dv


def _pick_tq(T, tq):
    tq = min(tq, T)
    while T % tq:
        tq //= 2
    return max(tq, 8)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention(q, k, v, mask, tq=DEFAULT_TQ, interpret=False):
    """q, k, v: (BH, T, D) fp32 or bf16; mask: (BH, T) float {0,1} ->
    (BH, T, D) fp32 output.

    MXU contractions run in the input dtype (bf16 halves HBM/VMEM traffic
    and doubles matmul rate); softmax statistics, output normalization and
    dk/dv accumulation are fp32. Cotangents keep the input dtypes. Softmax
    over keys with invalid keys biased to -1e9 (matches the einsum reference
    in models/transformer.py). T must be a multiple of the (auto-shrunk)
    q block.
    """
    scale = 1.0 / np.sqrt(q.shape[-1])
    o, _ = _fwd_call(q, k, v, mask, scale, _pick_tq(q.shape[1], tq),
                     interpret)
    return o


def _flash_fwd(q, k, v, mask, tq, interpret):
    scale = 1.0 / np.sqrt(q.shape[-1])
    o, lse = _fwd_call(q, k, v, mask, scale, _pick_tq(q.shape[1], tq),
                       interpret)
    return o, (q, k, v, mask, o, lse)


def _flash_bwd(tq, interpret, res, do):
    q, k, v, mask, o, lse = res
    scale = 1.0 / np.sqrt(q.shape[-1])
    dq, dk, dv = _bwd_call(q, k, v, mask, o, lse, do, scale,
                           _pick_tq(q.shape[1], tq), interpret)
    return dq, dk, dv, None


flash_attention.defvjp(_flash_fwd, _flash_bwd)
