"""Whale streaming audio encoder, TPU-native.

Behavior-parity target: the reference's NeMo/WeNet-style encoder
(vita/model/multimodal_encoder/whale/: encoder.py:55-171,
transformer.py:280-394, attention.py:9-128,273-420, subsampling.py:15-43,
cmvn.py:7-32) with the deployed config (model_weight_file/config.json
audio_config): 24 layers, hidden 1024, 16 heads, ffn 4096 (ReLU),
pre-norm LayerNorm (eps 1e-5), Transformer-XL-style relative-position
attention *without* rel_shift, sinusoidal PE table, no concat_after.

Pipeline: GlobalCMVN -> Conv2dSubsampling4 (two 3x3 stride-2 valid convs,
T -> ((T-1)//2-1)//2) -> linear embed + LN + ReLU -> x*sqrt(d) ->
24 transformer layers -> final LN. ~25 feature frames/sec at the output;
the CNN adapter (projectors.py) halves that again to ~12.5 tokens/sec.

Full bidirectional attention over valid frames (the deployed non-streaming
path, vllm_file/whale.py:596-654); chunked-causal masks for streaming
training are provided by `chunk_mask`.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vita_tpu.ops.attention import NEG_INF
from vita_tpu.ops.norms import layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class WhaleConfig:
    input_dim: int = 80
    hidden: int = 1024
    n_layers: int = 24
    n_heads: int = 16
    ffn_dim: int = 4096
    ln_eps: float = 1e-5
    max_positions: int = 5000
    attn_backend: str = "xla"  # 'xla' | 'flash' (fused; full-context only)
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden // self.n_heads

    @property
    def conv_out_freq(self) -> int:
        return ((self.input_dim - 1) // 2 - 1) // 2

    @staticmethod
    def vita(**kw) -> "WhaleConfig":
        # measured on v5e at production geometry: XLA attention wins at
        # realistic clip lengths (4 s: 2.09 vs 2.24 ms; 30 s: 8.68 vs
        # 10.47 ms) — the flash path's augmented head dim (65 lanes pads
        # to 128) costs more than the fused softmax saves at T' <= 750.
        # 'flash' remains available for very long streaming sessions.
        return WhaleConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "WhaleConfig":
        base = dict(input_dim=80, hidden=32, n_layers=2, n_heads=4, ffn_dim=64)
        base.update(kw)
        return WhaleConfig(**base)


def subsampled_length(t: jnp.ndarray | int) -> jnp.ndarray | int:
    """Frame count after Conv2dSubsampling4 (two k=3 s=2 valid convs)."""
    return ((t - 1) // 2 - 1) // 2


def sinusoid_table(max_len: int, d: int) -> np.ndarray:
    """The WeNet positional table: sin on even dims, cos on odd."""
    pe = np.zeros((max_len, d), np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float32) * -(math.log(10000.0) / d))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


def init_params(rng: jax.Array, cfg: WhaleConfig) -> Params:
    dt = cfg.dtype
    d = cfg.hidden
    nl = cfg.n_layers
    k = jax.random.split(rng, 16)
    s = d**-0.5

    def nrm(key, shape, scale=0.02):
        return jax.random.normal(key, shape, dt) * scale

    return {
        "cmvn": {
            "mean": jnp.zeros((cfg.input_dim,), jnp.float32),
            "istd": jnp.ones((cfg.input_dim,), jnp.float32),
        },
        "sub": {
            # conv kernels in HWIO layout for lax.conv (H=time, W=freq)
            "conv1_w": nrm(k[0], (3, 3, 1, d), (9) ** -0.5),
            "conv1_b": jnp.zeros((d,), dt),
            "conv2_w": nrm(k[1], (3, 3, d, d), (9 * d) ** -0.5),
            "conv2_b": jnp.zeros((d,), dt),
            "out_w": nrm(k[2], (d * cfg.conv_out_freq, d), (d * cfg.conv_out_freq) ** -0.5),
            "out_b": jnp.zeros((d,), dt),
        },
        "embed": {
            "w": nrm(k[3], (d, d), s),
            "b": jnp.zeros((d,), dt),
            "ln_w": jnp.ones((d,), dt),
            "ln_b": jnp.zeros((d,), dt),
        },
        "layers": {
            "q_w": nrm(k[4], (nl, d, d), s), "q_b": jnp.zeros((nl, d), dt),
            "k_w": nrm(k[5], (nl, d, d), s), "k_b": jnp.zeros((nl, d), dt),
            "v_w": nrm(k[6], (nl, d, d), s), "v_b": jnp.zeros((nl, d), dt),
            "out_w": nrm(k[7], (nl, d, d), s), "out_b": jnp.zeros((nl, d), dt),
            "pos_w": nrm(k[8], (nl, d, d), s),  # linear_pos, no bias
            "pos_bias_u": nrm(k[9], (nl, cfg.n_heads, cfg.head_dim)),
            "pos_bias_v": nrm(k[10], (nl, cfg.n_heads, cfg.head_dim)),
            "ffn1_w": nrm(k[11], (nl, d, cfg.ffn_dim), s),
            "ffn1_b": jnp.zeros((nl, cfg.ffn_dim), dt),
            "ffn2_w": nrm(k[12], (nl, cfg.ffn_dim, d), cfg.ffn_dim**-0.5),
            "ffn2_b": jnp.zeros((nl, d), dt),
            "norm1_w": jnp.ones((nl, d), dt), "norm1_b": jnp.zeros((nl, d), dt),
            "norm2_w": jnp.ones((nl, d), dt), "norm2_b": jnp.zeros((nl, d), dt),
        },
        "ln_final": {"w": jnp.ones((d,), dt), "b": jnp.zeros((d,), dt)},
    }


def param_specs(cfg: WhaleConfig) -> Params:
    ff = {
        "q_w": P(None, "fsdp", "model"), "q_b": P(None, None),
        "k_w": P(None, "fsdp", "model"), "k_b": P(None, None),
        "v_w": P(None, "fsdp", "model"), "v_b": P(None, None),
        "out_w": P(None, "model", "fsdp"), "out_b": P(None, None),
        "pos_w": P(None, "fsdp", "model"),
        "pos_bias_u": P(None, None, None), "pos_bias_v": P(None, None, None),
        "ffn1_w": P(None, "fsdp", "model"), "ffn1_b": P(None, None),
        "ffn2_w": P(None, "model", "fsdp"), "ffn2_b": P(None, None),
        "norm1_w": P(None, None), "norm1_b": P(None, None),
        "norm2_w": P(None, None), "norm2_b": P(None, None),
    }
    return {
        "cmvn": {"mean": P(None), "istd": P(None)},
        "sub": {
            "conv1_w": P(None, None, None, "model"), "conv1_b": P(None),
            "conv2_w": P(None, None, None, "model"), "conv2_b": P(None),
            "out_w": P("fsdp", None), "out_b": P(None),
        },
        "embed": {"w": P("fsdp", None), "b": P(None), "ln_w": P(None), "ln_b": P(None)},
        "layers": ff,
        "ln_final": {"w": P(None), "b": P(None)},
    }


def _conv_subsample(sub: Params, x: jnp.ndarray) -> jnp.ndarray:
    """[B, T, F] -> [B, T', hidden] via two stride-2 valid convs + linear."""
    x = x[..., None]  # NHWC: [B, T, F, 1]
    x = jax.lax.conv_general_dilated(
        x, sub["conv1_w"], (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + sub["conv1_b"]
    x = jax.nn.relu(x)
    x = jax.lax.conv_general_dilated(
        x, sub["conv2_w"], (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + sub["conv2_b"]
    x = jax.nn.relu(x)
    b, t, f, c = x.shape
    # torch flattens as (channel, freq): x.transpose(1,2).view(b, t, c*f)
    x = x.transpose(0, 1, 3, 2).reshape(b, t, c * f)
    return x @ sub["out_w"] + sub["out_b"]


def chunk_mask(t: int, chunk_size: int, left_chunks: int = -1) -> np.ndarray:
    """WeNet chunked attention mask [t, t] (whale/utils.py:88-146 semantics):
    frame i attends within its chunk and up to `left_chunks` chunks back
    (all history if -1)."""
    chunk_of = np.arange(t) // chunk_size
    q = chunk_of[:, None]
    kv = chunk_of[None, :]
    ok = kv <= q
    if left_chunks >= 0:
        ok &= kv >= q - left_chunks
    return ok


def forward(
    params: Params,
    cfg: WhaleConfig,
    speech: jnp.ndarray,  # [B, T, input_dim] fbank features
    lengths: jnp.ndarray,  # [B] valid frame counts
    attn_chunk_mask: Optional[jnp.ndarray] = None,  # [T', T'] bool (streaming)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (features [B, T', hidden], valid_mask [B, T'])."""
    b, t, _ = speech.shape
    x = (speech.astype(jnp.float32) - params["cmvn"]["mean"]) * params["cmvn"]["istd"]
    x = x.astype(cfg.dtype)

    x = _conv_subsample(params["sub"], x)
    t_sub = x.shape[1]
    out_len = subsampled_length(lengths)
    valid = jnp.arange(t_sub)[None, :] < out_len[:, None]  # [B, T']

    e = params["embed"]
    x = jax.nn.relu(layer_norm(x @ e["w"] + e["b"], e["ln_w"], e["ln_b"], eps=1e-5))
    x = x * math.sqrt(cfg.hidden)
    pos = jnp.asarray(sinusoid_table(t_sub, cfg.hidden), cfg.dtype)  # [T', D]

    keep = valid[:, None, None, :]  # key padding [B,1,1,T']
    if attn_chunk_mask is not None:
        keep = keep & attn_chunk_mask[None, None]
    bias = jnp.where(keep, 0.0, NEG_INF).astype(jnp.float32)

    nh, hd = cfg.n_heads, cfg.head_dim
    scale = 1.0 / math.sqrt(hd)

    def layer_fn(x, lp):
        h = layer_norm(x, lp["norm1_w"], lp["norm1_b"], cfg.ln_eps)
        q = (h @ lp["q_w"] + lp["q_b"]).reshape(b, t_sub, nh, hd)
        k = (h @ lp["k_w"] + lp["k_b"]).reshape(b, t_sub, nh, hd)
        v = (h @ lp["v_w"] + lp["v_b"]).reshape(b, t_sub, nh, hd)
        p = (pos @ lp["pos_w"]).reshape(t_sub, nh, hd)
        if cfg.attn_backend == "flash" and attn_chunk_mask is None:
            # XL rel-pos WITHOUT rel_shift reduces exactly to standard
            # attention: (q+u)·k + (q+v)·p = q·(k+p) + [u·k + v·p], i.e.
            # modified keys plus a per-key additive bias — fold the bias
            # into an augmented dimension (q gets a 1, k gets the bias)
            # and ride the fused flash kernel. NOTE measured slower than
            # XLA below ~30 s clips (lane padding 65->128); default stays
            # 'xla' — this path is for very long streaming contexts.
            from vita_tpu.ops.flash_attention import flash_mha

            kt = k + p[None]
            key_bias = (
                jnp.einsum("hd,bkhd->bkh", lp["pos_bias_u"], k)
                + jnp.einsum("hd,khd->kh", lp["pos_bias_v"], p)[None]
            )
            ones = jnp.ones((b, t_sub, nh, 1), q.dtype)
            q_aug = jnp.concatenate([q, ones], axis=-1)
            k_aug = jnp.concatenate([kt, key_bias[..., None].astype(k.dtype)], -1)
            v_aug = jnp.concatenate([v, jnp.zeros_like(ones)], axis=-1)
            attn = flash_mha(
                q_aug, k_aug, v_aug, kv_len=out_len, causal=False, scale=scale
            )[..., :hd].reshape(b, t_sub, cfg.hidden)
        else:
            # Transformer-XL terms without rel_shift (attention.py:388-401):
            # content score (q+u)·k^T plus position score (q+v)·p^T.
            ac = jnp.einsum("bqhd,bkhd->bhqk", q + lp["pos_bias_u"], k,
                            preferred_element_type=jnp.float32)
            bd = jnp.einsum("bqhd,khd->bhqk", q + lp["pos_bias_v"], p,
                            preferred_element_type=jnp.float32)
            logits = (ac + bd) * scale + bias
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t_sub, cfg.hidden)
        x = x + (attn @ lp["out_w"] + lp["out_b"])
        h = layer_norm(x, lp["norm2_w"], lp["norm2_b"], cfg.ln_eps)
        h = jax.nn.relu(h @ lp["ffn1_w"] + lp["ffn1_b"])
        x = x + (h @ lp["ffn2_w"] + lp["ffn2_b"])
        return x, None

    x, _ = jax.lax.scan(layer_fn, x, params["layers"])
    x = layer_norm(x, params["ln_final"]["w"], params["ln_final"]["b"], cfg.ln_eps)
    return x, valid


# ---------------------------------------------------------------------------
# streaming (chunked) inference
# ---------------------------------------------------------------------------
# The reference implements real-time encoding via an explicit flat ring-
# buffer protocol threaded through every layer (`.infer`:
# module/component/transformer.py:46-64, layer/attention.py:421-479).
# Here the same capability is a functional jitted step: the state pytree
# carries (a) unconsumed raw fbank frames (the subsampling convs need 7-
# frame receptive fields), (b) per-layer K/V caches of the last
# `left_context` subsampled positions, (c) the absolute position offset
# (the rel-pos term indexes the sinusoid table by absolute kv position,
# matching the full forward exactly).

TAIL_MAX = 8  # raw frames carried between chunks (receptive-field overlap)


def streaming_init(
    cfg: WhaleConfig, batch: int, chunk_frames: int, left_context: int = 128
) -> Params:
    """State for streaming_step. ``chunk_frames`` is raw fbank frames per
    step (multiple of 4 recommended); ``left_context`` is the attention
    span in subsampled frames kept per layer."""
    return {
        "raw_tail": jnp.zeros((batch, TAIL_MAX, cfg.input_dim), jnp.float32),
        "tail_len": jnp.zeros((), jnp.int32),
        "k": jnp.zeros((cfg.n_layers, batch, left_context, cfg.n_heads, cfg.head_dim), cfg.dtype),
        "v": jnp.zeros((cfg.n_layers, batch, left_context, cfg.n_heads, cfg.head_dim), cfg.dtype),
        "ctx_len": jnp.zeros((), jnp.int32),
        "pos_offset": jnp.zeros((), jnp.int32),
    }


def streaming_step(
    params: Params, cfg: WhaleConfig, state: Params, chunk: jnp.ndarray,
    chunk_len: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Params]:
    """Process one chunk [B, chunk_frames, input_dim] of fbank features.

    Returns (features [B, max_out, hidden], valid [B, max_out], new_state).
    Concatenated valid outputs across steps equal `forward` restricted to
    the same bounded left context.

    ``chunk_len`` (traced int32, default chunk_frames) marks how many
    leading frames of ``chunk`` are real — the final flush of a streaming
    session rarely lands on the block size, and counting padding as valid
    would let real outputs attend to garbage keys (whale attention is
    bidirectional within the chunk). One compiled program serves full and
    partial chunks.
    """
    b, chunk_frames, fdim = chunk.shape
    max_out = subsampled_length(TAIL_MAX + chunk_frames)  # static
    left_context = state["k"].shape[2]
    nh, hd = cfg.n_heads, cfg.head_dim
    if chunk_len is None:
        chunk_len = jnp.int32(chunk_frames)

    x_cm = (chunk.astype(jnp.float32) - params["cmvn"]["mean"]) * params["cmvn"]["istd"]

    # assemble [tail || chunk]; tail is stored RIGHT-aligned in its buffer,
    # so one left-roll by (TAIL_MAX - tail_len) makes the valid span
    # contiguous from index 0
    total_buf = TAIL_MAX + chunk_frames
    buf = jnp.concatenate([state["raw_tail"], x_cm.astype(jnp.float32)], axis=1)
    tail_len = state["tail_len"]
    shift = TAIL_MAX - tail_len
    idx = (jnp.arange(total_buf)[None, :] + shift) % total_buf
    buf = jnp.take_along_axis(buf, idx[..., None], axis=1)
    t_total = tail_len + chunk_len

    # clamp: fewer than 3 buffered frames subsample to NOTHING — the raw
    # formula goes negative there, which would corrupt the carried state
    # (negative consumed, inflated tail, decremented positions)
    t_out = jnp.maximum(subsampled_length(t_total), 0)
    consumed = 4 * t_out
    new_tail_len = jnp.clip(t_total - consumed, 0, TAIL_MAX)

    # subsample the (padded) buffer; outputs beyond t_out are garbage->masked
    sub_in = buf[:, :, :]  # [B, total_buf, F]
    feats = _conv_subsample(params["sub"], sub_in.astype(cfg.dtype))[:, :max_out]
    out_valid = jnp.arange(max_out)[None, :] < t_out  # [B?, max_out]
    out_valid = jnp.broadcast_to(out_valid, (b, max_out))

    # carry unconsumed raw frames, right-aligned: slot TAIL_MAX-1 holds the
    # newest frame (buf row t_total-1)
    tail_idx = jnp.clip(t_total - TAIL_MAX + jnp.arange(TAIL_MAX)[None, :], 0, total_buf - 1)
    new_tail = jnp.take_along_axis(buf, tail_idx[..., None], axis=1)
    keep = jnp.arange(TAIL_MAX)[None, :, None] >= (TAIL_MAX - new_tail_len)
    new_tail = jnp.where(keep, new_tail, 0.0)

    e = params["embed"]
    h = jax.nn.relu(layer_norm(feats @ e["w"] + e["b"], e["ln_w"], e["ln_b"], eps=1e-5))
    h = h * math.sqrt(cfg.hidden)

    # absolute positions of this chunk's outputs / cached context
    pos_offset = state["pos_offset"]
    q_abs = pos_offset + jnp.arange(max_out)  # [max_out]
    pe_full = jnp.asarray(sinusoid_table(cfg.max_positions, cfg.hidden), cfg.dtype)
    ctx_len = state["ctx_len"]
    ctx_start = pos_offset - ctx_len
    kv_ctx_abs = ctx_start + jnp.arange(left_context)  # first ctx_len valid
    scale = 1.0 / math.sqrt(hd)

    def layer_fn(carry, inputs):
        h = carry
        lp, ck, cv = inputs  # caches [B, left_context, nh, hd]
        hn = layer_norm(h, lp["norm1_w"], lp["norm1_b"], cfg.ln_eps)
        q = (hn @ lp["q_w"] + lp["q_b"]).reshape(b, max_out, nh, hd)
        k = (hn @ lp["k_w"] + lp["k_b"]).reshape(b, max_out, nh, hd)
        v = (hn @ lp["v_w"] + lp["v_b"]).reshape(b, max_out, nh, hd)

        k_all = jnp.concatenate([ck, k.astype(ck.dtype)], axis=1)
        v_all = jnp.concatenate([cv, v.astype(cv.dtype)], axis=1)
        kv_abs = jnp.concatenate([kv_ctx_abs, q_abs])  # [left+max_out]
        kv_valid = jnp.concatenate(
            [jnp.arange(left_context) < ctx_len, jnp.arange(max_out) < t_out]
        )

        # positions WRAP at the table size (reference attention.py:116
        # pe_index % max_len) — clipping would collapse all keys onto one
        # position in long streaming sessions and flatten the rel-pos term
        p_all = (
            jnp.take(pe_full, jnp.mod(kv_abs, cfg.max_positions), axis=0)
            @ lp["pos_w"]
        ).reshape(-1, nh, hd)
        ac = jnp.einsum("bqhd,bkhd->bhqk", q + lp["pos_bias_u"], k_all,
                        preferred_element_type=jnp.float32)
        bd = jnp.einsum("bqhd,khd->bhqk", q + lp["pos_bias_v"], p_all,
                        preferred_element_type=jnp.float32)
        logits = (ac + bd) * scale
        logits = jnp.where(kv_valid[None, None, None, :], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(v_all.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v_all).reshape(b, max_out, cfg.hidden)
        h = h + (attn @ lp["out_w"] + lp["out_b"])
        hn = layer_norm(h, lp["norm2_w"], lp["norm2_b"], cfg.ln_eps)
        hn = jax.nn.relu(hn @ lp["ffn1_w"] + lp["ffn1_b"])
        h = h + (hn @ lp["ffn2_w"] + lp["ffn2_b"])

        # roll this layer's cache: keep the last `left_context` of valid kv
        # ordered [old ctx (ctx_len) | new (t_out)]. The ctx cache is
        # left-aligned [0, ctx_len); new valid entries sit at
        # [left_context, left_context + t_out) of the padded concat.
        nvalid = jnp.minimum(ctx_len + t_out, left_context)
        total = left_context + max_out
        order = jnp.concatenate([jnp.arange(left_context), left_context + jnp.arange(max_out)])
        is_valid = kv_valid
        # stable partition: valid entries first
        sort_key = jnp.where(is_valid, 0, 1) * total + order
        perm = jnp.argsort(sort_key)
        k_compact = jnp.take(k_all, perm, axis=1)
        v_compact = jnp.take(v_all, perm, axis=1)
        # take the last nvalid of the first (ctx_len+t_out) compacted entries
        start = jnp.maximum(ctx_len + t_out - nvalid, 0)
        idx2 = jnp.clip(start + jnp.arange(left_context), 0, total - 1)
        new_ck = jnp.take(k_compact, idx2, axis=1)
        new_cv = jnp.take(v_compact, idx2, axis=1)
        # left-align: entries beyond nvalid are stale; mask handled by ctx_len
        return h, (new_ck, new_cv)

    h, new_caches = jax.lax.scan(layer_fn, h, (params["layers"], state["k"], state["v"]))
    h = layer_norm(h, params["ln_final"]["w"], params["ln_final"]["b"], cfg.ln_eps)

    new_state = {
        "raw_tail": new_tail,
        "tail_len": new_tail_len,
        "k": new_caches[0],
        "v": new_caches[1],
        "ctx_len": jnp.minimum(ctx_len + t_out, left_context),
        "pos_offset": pos_offset + t_out,
    }
    return h, out_valid, new_state
