"""Mixtral MoE decoder-only LM, TPU-native.

One implementation serves training, prefill and decode (the reference keeps
two — an HF stack (vita/model/language_model/vita_mixtral.py) and a vLLM
tensor-parallel rewrite (web_demo/vllm_tools/vllm_file/mixtral.py); weight
remapping between them is hand-coded there at :1197-1221).

Design:
  - Per-layer parameters are stacked on a leading L axis and the layer loop
    is a `lax.scan` — one trace/compile of the layer body regardless of
    depth.
  - KV cache is a static-shape pytree [L, B, S_max, H_kv, D]; decode writes
    via dynamic_update_slice at the current position.
  - Attention bias (causal + padding) is built on the fly from positions
    and a validity mask — never a [S,S] host-side constant.
  - Sharding is declarative: `param_specs(cfg)` returns a PartitionSpec
    pytree over the (data, fsdp, expert, model) mesh; GSPMD inserts the
    collectives (ZeRO-3-equivalent fsdp sharding for training, TP/EP for
    serving) — replacing DeepSpeed and the vLLM parallel layers.

Shapes follow the deployed VITA config
(web_demo/vllm_tools/model_weight_file/config.json:17-44): 32L, 4096d,
32 q-heads / 8 kv-heads, 8 experts top-2, ffn 14336, rope 1e6, vocab 51760.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vita_tpu.ops.attention import NEG_INF, mha
from vita_tpu.ops.moe import init_moe_params, load_balancing_loss, moe_ffn, route_topk
from vita_tpu.ops.norms import rms_norm
from vita_tpu.ops.rope import apply_rope

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MixtralConfig:
    vocab_size: int = 51760
    d_model: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 8
    d_ff: int = 14336
    n_experts: int = 8
    top_k: int = 2
    rope_theta: float = 1e6
    rms_eps: float = 1e-5
    max_position: int = 32768
    router_aux_loss_coef: float = 0.02
    moe_mode: str = "dense"  # 'dense' | 'capacity' (training at scale)
    moe_capacity_factor: float = 1.25
    # >0: scan each layer's MoE over token chunks of this size with a
    # jax.checkpoint body — bwd rematerializes one chunk's expert
    # intermediates at a time (caps the training step's HBM high-water;
    # chunk-local aux loss / sort capacity — see ops.moe.moe_ffn).
    moe_chunk: int = 0
    attn_backend: str = "xla"  # 'xla' | 'flash'
    remat: bool = False  # jax.checkpoint each layer (trade FLOPs for HBM)
    # GPipe pipeline parallelism over the mesh 'pipe' axis
    # (parallel/pipeline.py); >1 requires forward(..., mesh=...) and the
    # cacheless training/prefill path. n_layers % pipe_stages == 0.
    pipe_stages: int = 1
    pipe_microbatches: int = 4
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @staticmethod
    def vita_8x7b(**kw) -> "MixtralConfig":
        return MixtralConfig(
            **{**dict(dtype=jnp.bfloat16, attn_backend="flash", remat=True), **kw}
        )

    @staticmethod
    def tiny(**kw) -> "MixtralConfig":
        """Small config for tests / CPU development."""
        base = dict(
            vocab_size=512, d_model=64, n_layers=2, n_heads=4, n_kv_heads=2,
            d_ff=128, n_experts=4, top_k=2,
        )
        base.update(kw)
        return MixtralConfig(**base)


def init_params(rng: jax.Array, cfg: MixtralConfig) -> Params:
    dt = cfg.dtype
    d, hd = cfg.d_model, cfg.head_dim
    keys = jax.random.split(rng, 8)
    s = d**-0.5

    def layer_init(k):
        ks = jax.random.split(k, 5)
        return {
            "attn": {
                "wq": jax.random.normal(ks[0], (cfg.n_layers, d, cfg.n_heads * hd), dt) * s,
                "wk": jax.random.normal(ks[1], (cfg.n_layers, d, cfg.n_kv_heads * hd), dt) * s,
                "wv": jax.random.normal(ks[2], (cfg.n_layers, d, cfg.n_kv_heads * hd), dt) * s,
                "wo": jax.random.normal(ks[3], (cfg.n_layers, cfg.n_heads * hd, d), dt) * s,
            },
            "moe": jax.vmap(
                lambda kk: init_moe_params(kk, cfg.n_experts, d, cfg.d_ff, dt)
            )(jax.random.split(ks[4], cfg.n_layers)),
            "ln_attn": jnp.ones((cfg.n_layers, d), dt),
            "ln_moe": jnp.ones((cfg.n_layers, d), dt),
        }

    return {
        "embed": jax.random.normal(keys[0], (cfg.vocab_size, d), dt) * s,
        "layers": layer_init(keys[1]),
        "ln_final": jnp.ones((d,), dt),
        "lm_head": jax.random.normal(keys[2], (d, cfg.vocab_size), dt) * s,
    }


def param_specs(cfg: MixtralConfig) -> Params:
    """PartitionSpec pytree mirroring init_params' structure.

    Leading layer-stack axis is unsharded (or sharded over 'pipe' when
    pipe_stages > 1 — stage s owns the contiguous slice of layers); 'model'
    shards heads/ffn columns (TP), 'expert' shards the expert axis (EP),
    'fsdp' shards the remaining large dim (ZeRO-3-style parameter sharding).
    """
    lead = "pipe" if cfg.pipe_stages > 1 else None
    return {
        "embed": P("model", "fsdp"),
        "layers": {
            "attn": {
                "wq": P(lead, "fsdp", "model"),
                "wk": P(lead, "fsdp", "model"),
                "wv": P(lead, "fsdp", "model"),
                "wo": P(lead, "model", "fsdp"),
            },
            "moe": {
                "router": P(lead, "fsdp", None),
                "w_gate": P(lead, "expert", "fsdp", "model"),
                "w_up": P(lead, "expert", "fsdp", "model"),
                "w_down": P(lead, "expert", "model", "fsdp"),
            },
            "ln_attn": P(lead, None),
            "ln_moe": P(lead, None),
        },
        "ln_final": P(None),
        "lm_head": P("fsdp", "model"),
    }


def decode_param_specs(cfg: MixtralConfig, params: Params) -> Params:
    """param_specs extended to quantized decode params: the int8/int4
    scale leaves (quantize_moe_for_decode) shard like their weights —
    [L, E, ...] with the expert axis on 'expert'."""
    specs = param_specs(cfg)
    lead = "pipe" if cfg.pipe_stages > 1 else None
    moe = dict(specs["layers"]["moe"])
    for k_, v in params["layers"]["moe"].items():
        if k_ not in moe:
            moe[k_] = P(lead, "expert", *(None,) * (v.ndim - 2))
    specs["layers"] = dict(specs["layers"])
    specs["layers"]["moe"] = moe
    return specs


def unstack_layers(params: Params) -> Params:
    """Convert the scan-stacked layer params into a per-layer list.

    The decode path with the Pallas MoE gather kernel needs whole expert
    arrays as kernel operands: a lax.scan slice of the stacked [L, E, D, F]
    array makes XLA materialize a 2.8 GB copy per layer before the custom
    call. With unstacked layers the python-loop forward passes each
    layer's own arrays directly — zero copies.
    """
    stacked = params["layers"]
    n_layers = jax.tree.leaves(stacked)[0].shape[0]
    layers = [jax.tree.map(lambda x: x[i], stacked) for i in range(n_layers)]
    out = dict(params)
    out["layers"] = layers
    return out


def quantize_moe_for_decode(params: Params, bits: int = 8) -> Params:
    """int8-quantize every layer's expert weights (weight-only) for the
    'gather_q' decode mode. Works on stacked or unstacked params; all
    non-expert weights stay in their original dtype (shared, not copied,
    with the source pytree). ``bits`` selects int8 or int4 packing."""
    from vita_tpu.ops.moe_decode import (
        quantize_expert_weights,
        quantize_expert_weights_int4,
    )

    qfn = {8: quantize_expert_weights, 4: quantize_expert_weights_int4}[bits]
    out = dict(params)
    if isinstance(params["layers"], (list, tuple)):
        out["layers"] = [
            {**lp, "moe": qfn(lp["moe"])} for lp in params["layers"]
        ]
    else:
        out["layers"] = dict(params["layers"])
        out["layers"]["moe"] = qfn(params["layers"]["moe"])
    return out


def init_kv_cache(
    cfg: MixtralConfig, batch: int, max_len: int, dtype=None
) -> Params:
    """Static KV cache. ``pos`` is per-slot [B] so independent sequences can
    sit at different depths (continuous batching); uniform-batch callers
    simply see all-equal positions."""
    dt = dtype or cfg.dtype
    shape = (cfg.n_layers, batch, max_len, cfg.n_kv_heads, cfg.head_dim)
    return {
        "k": jnp.zeros(shape, dt),
        "v": jnp.zeros(shape, dt),
        "pos": jnp.zeros((batch,), jnp.int32),
    }


def kv_cache_specs(cfg: MixtralConfig) -> Params:
    return {
        "k": P(None, ("data", "fsdp"), None, "model", None),
        "v": P(None, ("data", "fsdp"), None, "model", None),
        "pos": P(("data", "fsdp")),
    }


def _attention_block(
    lp: Params,
    cfg: MixtralConfig,
    x: jnp.ndarray,  # [B, S, D]
    positions: jnp.ndarray,  # [B, S]
    kv_valid: jnp.ndarray,  # [B, S_kv] bool — which kv slots are attendable
    layer_k: Optional[jnp.ndarray],  # cache slices [B, S_max, Hkv, D] or None
    layer_v: Optional[jnp.ndarray],
    cache_pos: Optional[jnp.ndarray],
    mesh=None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    b, s, d = x.shape
    hq, hkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    q = (x @ lp["wq"]).reshape(b, s, hq, hd)
    k = (x @ lp["wk"]).reshape(b, s, hkv, hd)
    v = (x @ lp["wv"]).reshape(b, s, hkv, hd)
    q, k = apply_rope(q, k, positions, cfg.rope_theta)

    if layer_k is not None:
        # per-slot write offsets (cache_pos is [B]): vectorized scatter —
        # out-of-range writes are dropped by XLA scatter semantics.
        b_idx = jnp.arange(b)[:, None]
        s_idx = cache_pos[:, None] + jnp.arange(s)[None, :]
        k_all = layer_k.at[b_idx, s_idx].set(k.astype(layer_k.dtype), mode="drop")
        v_all = layer_v.at[b_idx, s_idx].set(v.astype(layer_v.dtype), mode="drop")
        kv_positions = jnp.arange(k_all.shape[1])[None, :]
        new_k, new_v = k_all, v_all
    else:
        k_all, v_all = k, v
        kv_positions = positions
        new_k = new_v = None

    if cfg.attn_backend == "flash":
        # kv slots are stored at their absolute positions and validity is a
        # prefix (right padding), so causal+kv_len masking in-kernel is
        # exact; q positions are contiguous per row starting at q_offset.
        from vita_tpu.parallel.sharded_ops import sharded_flash_mha

        out = sharded_flash_mha(
            q, k_all.astype(q.dtype), v_all.astype(q.dtype),
            kv_len=jnp.sum(kv_valid, axis=1).astype(jnp.int32),
            q_offset=positions[:, 0].astype(jnp.int32),
            causal=True, mesh=mesh,
        )
    else:
        # Additive bias: causal (kv_pos <= q_pos) AND kv slot valid.
        causal = kv_positions[:, None, :] <= positions[:, :, None]  # [B, Sq, Skv]
        keep = causal & kv_valid[:, None, :]
        bias = jnp.where(keep[:, None], 0.0, NEG_INF).astype(jnp.float32)
        out = mha(q, k_all.astype(q.dtype), v_all.astype(q.dtype), bias=bias,
                  backend="xla")
    out = out.reshape(b, s, hq * hd) @ lp["wo"]
    return out, new_k, new_v


def _attention_block_paged(
    lp: Params,
    cfg: MixtralConfig,
    x: jnp.ndarray,  # [B, 1, D]
    positions: jnp.ndarray,  # [B, 1]
    k_pages: jnp.ndarray,  # [L, Hkv, P, page, d]
    v_pages: jnp.ndarray,
    table: jnp.ndarray,  # [B, max_pages]
    pos: jnp.ndarray,  # [B] rows already written (current token's slot)
    active: Optional[jnp.ndarray],  # [B] bool or None
    layer_idx: int,
    mesh=None,
    k_scale: Optional[jnp.ndarray] = None,  # int8 pool scales (kv_int8)
    v_scale: Optional[jnp.ndarray] = None,
):
    """Decode attention against the paged KV pool (ops.paged_attention).

    Returns (out, k_pages, v_pages[, k_scale, v_scale]) — the scale arrays
    ride along when the pool is int8-quantized."""
    from vita_tpu.parallel.sharded_ops import (
        sharded_paged_attention,
        sharded_write_kv_rows,
    )

    b, s, d = x.shape
    if s != 1:
        raise ValueError("paged cache supports single-token decode only")
    hq, hkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    q = (x @ lp["wq"]).reshape(b, s, hq, hd)
    k = (x @ lp["wk"]).reshape(b, s, hkv, hd)
    v = (x @ lp["wv"]).reshape(b, s, hkv, hd)
    q, k = apply_rope(q, k, positions, cfg.rope_theta)
    layer = jnp.int32(layer_idx)
    quant = k_scale is not None
    wrote = sharded_write_kv_rows(
        k_pages, v_pages, layer, table, pos, k[:, 0], v[:, 0], active,
        mesh=mesh, k_scale=k_scale, v_scale=v_scale,
    )
    if quant:
        k_pages, v_pages, k_scale, v_scale = wrote
    else:
        k_pages, v_pages = wrote
    lengths = pos + 1
    if active is not None:
        lengths = jnp.where(active, lengths, 0)
    q_dt = x.dtype if quant else k_pages.dtype
    out = sharded_paged_attention(
        q[:, 0].astype(q_dt), k_pages, v_pages, table, lengths,
        layer, mesh=mesh, k_scale=k_scale, v_scale=v_scale,
    ).astype(x.dtype)
    out = out.reshape(b, s, hq * hd) @ lp["wo"]
    if quant:
        return out, k_pages, v_pages, k_scale, v_scale
    return out, k_pages, v_pages


def forward(
    params: Params,
    cfg: MixtralConfig,
    input_ids: Optional[jnp.ndarray] = None,  # [B, S] int32
    inputs_embeds: Optional[jnp.ndarray] = None,  # [B, S, D]
    positions: Optional[jnp.ndarray] = None,  # [B, S]
    attn_valid: Optional[jnp.ndarray] = None,  # [B, S_kv] bool
    cache: Optional[Params] = None,
    token_mask: Optional[jnp.ndarray] = None,  # [B, S] real (non-pad) tokens, for aux loss
    return_hidden: bool = False,  # skip lm_head, return post-ln hidden [B, S, D]
    mesh=None,  # required when cfg.pipe_stages > 1 (pipeline parallelism)
) -> Tuple[jnp.ndarray, Optional[Params], jnp.ndarray]:
    """Returns (logits [B, S, V], new_cache or None, moe_aux_loss scalar).

    ``cache`` is either the linear KV cache from init_kv_cache, or a paged
    cache {'k_pages','v_pages','table','pos'[,'active']} (single-token
    decode against the block pool; see ops.paged_attention).

    ``return_hidden=True`` returns the final-norm hidden states in place of
    logits (callers that only need one row's logits apply lm_head to that
    row themselves — e.g. chunked prefill).
    """
    paged = cache is not None and "k_pages" in cache
    if inputs_embeds is None:
        inputs_embeds = jnp.take(params["embed"], input_ids, axis=0)
    b, s, d = inputs_embeds.shape
    if positions is None:
        base = cache["pos"][:, None] if cache is not None else 0
        positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s)) + base
    if attn_valid is None and not paged:
        kv_len = cache["k"].shape[2] if cache is not None else s
        attn_valid = jnp.ones((b, kv_len), bool)

    tm_flat = None if token_mask is None else token_mask.reshape(-1)

    if cfg.pipe_stages > 1:
        gm = cfg.moe_mode in ("gather", "gather_q", "gather_q4")
        if cache is not None or gm or isinstance(params["layers"], (list, tuple)):
            raise ValueError(
                "pipe_stages > 1 supports the cacheless stacked-layer "
                "training/prefill path only (no KV cache, no gather decode)"
            )
        if cfg.moe_mode == "gmm":
            raise ValueError(
                "moe_mode='gmm' is not supported with pipeline parallelism:"
                " inside the pipeline's layer scan the Pallas kernels would"
                " consume scan-sliced stacked expert weights (a ~2.8 GB"
                " copy per layer at production shape); use 'sort' or"
                " 'capacity' with pipe_stages > 1"
            )
        if mesh is None:
            raise ValueError("pipe_stages > 1 requires forward(..., mesh=...)")
        from vita_tpu.parallel.pipeline import pipeline_layer_stack

        def pp_layer(lp, x, consts):
            pos_mb, valid_mb, tm_mb = consts
            bm, sm, _ = x.shape
            h = rms_norm(x, lp["ln_attn"], cfg.rms_eps)
            attn_out, _, _ = _attention_block(
                lp["attn"], cfg, h, pos_mb, valid_mb, None, None, None,
                mesh=mesh,
            )
            x = x + attn_out
            h = rms_norm(x, lp["ln_moe"], cfg.rms_eps)
            moe_out, aux = moe_ffn(
                lp["moe"], h.reshape(bm * sm, d), cfg.top_k,
                mode=cfg.moe_mode, capacity_factor=cfg.moe_capacity_factor,
                token_mask=None if tm_mb is None else tm_mb.reshape(-1),
                chunk=cfg.moe_chunk,
            )
            return x + moe_out.reshape(bm, sm, d), aux

        x, aux_total = pipeline_layer_stack(
            mesh, pp_layer, params["layers"], inputs_embeds,
            (positions, attn_valid, token_mask),
            cfg.pipe_stages, cfg.pipe_microbatches, remat=cfg.remat,
        )
        x = rms_norm(x, params["ln_final"], cfg.rms_eps)
        logits = x if return_hidden else x @ params["lm_head"]
        return logits, None, aux_total / cfg.n_layers

    # gmm mode under lax.scan: the Pallas kernels must NOT consume the
    # scan-sliced stacked expert weights (XLA materializes ~2.8 GB/layer
    # as the custom-call operand — same invariant as the gather decode
    # modes). They read uint views of the WHOLE stacked arrays reshaped
    # [L*E, ...] with flat group ids layer*E + expert instead; the sliced
    # weights stay in the graph only as the grad target (ops.moe_gmm.gmm_scan).
    gmm_flat = None
    if cfg.moe_mode == "gmm" and not isinstance(params["layers"], (list, tuple)):
        from vita_tpu.ops.moe_gmm import as_uint_view

        gmm_flat = {
            k: as_uint_view(
                jax.lax.stop_gradient(v).reshape((-1,) + v.shape[2:])
            )
            for k, v in params["layers"]["moe"].items()
            if k != "router"
        }

    def layer_fn(carry, layer_inputs):
        x, aux_sum = carry
        lp, ck, cv, li = layer_inputs
        h = rms_norm(x, lp["ln_attn"], cfg.rms_eps)
        attn_out, nk, nv = _attention_block(
            lp["attn"], cfg, h, positions, attn_valid, ck, cv,
            cache["pos"] if cache is not None else None, mesh=mesh,
        )
        x = x + attn_out
        h = rms_norm(x, lp["ln_moe"], cfg.rms_eps)
        moe_out, aux = moe_ffn(
            lp["moe"], h.reshape(b * s, d), cfg.top_k,
            mode=cfg.moe_mode, capacity_factor=cfg.moe_capacity_factor,
            token_mask=tm_flat,
            flat=gmm_flat, group_off=li * cfg.n_experts,
            chunk=cfg.moe_chunk,
        )
        x = x + moe_out.reshape(b, s, d)
        return (x, aux_sum + aux), (nk, nv)

    gather_mode = cfg.moe_mode in ("gather", "gather_q", "gather_q4")
    if isinstance(params["layers"], (list, tuple)) or gather_mode or paged:
        # Python layer loop (unrolled at trace time). Used for unstacked
        # params (see unstack_layers) and for the Pallas gather decode
        # modes: the gather kernels consume the STACKED expert arrays
        # reshaped [L*E, ...] (a free metadata reshape) with flat expert
        # indices layer*E + topk — no per-layer weight copies at all (a
        # lax.scan slice would materialize 2.8 GB per layer as the
        # custom-call operand, and unstacking would double weight HBM).
        layers = params["layers"]
        stacked = not isinstance(layers, (list, tuple))
        moe_flat = None
        if gather_mode and stacked and mesh is None:
            m = layers["moe"]
            moe_flat = {
                k: v.reshape((-1,) + v.shape[2:])
                for k, v in m.items()
                if k != "router"
            }

        def moe_gather_layer(h2d, moe_lp, layer_idx):
            from vita_tpu.ops.moe_decode import (
                masked_expert_ffn,
                masked_expert_ffn_q,
                masked_expert_ffn_q4,
            )

            router_logits = jnp.einsum(
                "td,de->te", h2d.astype(jnp.float32), moe_lp["router"].astype(jnp.float32)
            )
            topk_w, topk_i, probs = route_topk(router_logits, cfg.top_k)
            aux = load_balancing_loss(probs, topk_i, cfg.n_experts, tm_flat)
            if mesh is not None and stacked:
                # EP/TP serving: stacked expert weights sharded over the
                # 'expert' mesh axis; the wrapper flattens per shard
                from vita_tpu.parallel.sharded_ops import sharded_gather_ffn

                out = sharded_gather_ffn(
                    h2d, topk_w, topk_i,
                    {k: v for k, v in layers["moe"].items() if k != "router"},
                    layer_idx, cfg.n_experts, cfg.moe_mode, mesh=mesh,
                )
                return out.astype(h2d.dtype), aux
            # single-chip decode: masked active-expert kernels — each
            # unique selected expert's weights stream from HBM once for
            # the whole batch (flat layer*E+e ids on the stacked view)
            if moe_flat is not None:
                idx = topk_i + layer_idx * cfg.n_experts
                src = moe_flat
            else:
                idx = topk_i
                src = moe_lp
            if cfg.moe_mode == "gather_q4":
                out = masked_expert_ffn_q4(
                    h2d, topk_w, idx, src, n_experts=cfg.n_experts
                )
            elif cfg.moe_mode == "gather_q":
                out = masked_expert_ffn_q(
                    h2d, topk_w, idx, src, n_experts=cfg.n_experts
                )
            else:
                out = masked_expert_ffn(
                    h2d, topk_w, idx,
                    src["w_gate"], src["w_up"], src["w_down"],
                    n_experts=cfg.n_experts,
                )
            return out.astype(h2d.dtype), aux

        # gmm prefill under a serving mesh: EP-sharded grouped matmul
        # (sharded_gmm_ffn psums per-shard partials) so mesh serving keeps
        # the dispatch win instead of falling back to dense
        gmm_sharded = cfg.moe_mode == "gmm" and mesh is not None and stacked

        def moe_gmm_sharded_layer(h2d, moe_lp, layer_idx):
            from vita_tpu.parallel.sharded_ops import sharded_gmm_ffn

            router_logits = jnp.einsum(
                "td,de->te", h2d.astype(jnp.float32),
                moe_lp["router"].astype(jnp.float32),
            )
            topk_w, topk_i, probs = route_topk(router_logits, cfg.top_k)
            aux = load_balancing_loss(probs, topk_i, cfg.n_experts, tm_flat)
            out = sharded_gmm_ffn(
                h2d, topk_w, topk_i,
                {k: v for k, v in layers["moe"].items() if k != "router"},
                layer_idx, cfg.n_experts, mesh=mesh,
            )
            return out.astype(h2d.dtype), aux

        x = inputs_embeds
        aux_total = jnp.zeros((), jnp.float32)
        new_ks, new_vs = [], []
        if paged:
            pages_k, pages_v = cache["k_pages"], cache["v_pages"]
            table, ppos = cache["table"], cache["pos"]
            pactive = cache.get("active")
            pages_ks, pages_vs = cache.get("k_scale"), cache.get("v_scale")
        n_layers = cfg.n_layers if stacked else len(layers)
        for i in range(n_layers):
            if stacked:
                lp = {
                    "attn": jax.tree.map(lambda a: a[i], layers["attn"]),
                    "ln_attn": layers["ln_attn"][i],
                    "ln_moe": layers["ln_moe"][i],
                    # gather modes read experts from moe_flat (and sharded
                    # gmm from the whole stacked arrays); only the router
                    # is needed per layer
                    "moe": {"router": layers["moe"]["router"][i]}
                    if (gather_mode or gmm_sharded)
                    else jax.tree.map(lambda a: a[i], layers["moe"]),
                }
            else:
                lp = layers[i]
            h = rms_norm(x, lp["ln_attn"], cfg.rms_eps)
            if paged:
                got = _attention_block_paged(
                    lp["attn"], cfg, h, positions, pages_k, pages_v,
                    table, ppos, pactive, i, mesh=mesh,
                    k_scale=pages_ks, v_scale=pages_vs,
                )
                if pages_ks is not None:
                    attn_out, pages_k, pages_v, pages_ks, pages_vs = got
                else:
                    attn_out, pages_k, pages_v = got
            else:
                ck = cache["k"][i] if cache is not None else None
                cv = cache["v"][i] if cache is not None else None
                attn_out, nk, nv = _attention_block(
                    lp["attn"], cfg, h, positions, attn_valid, ck, cv,
                    cache["pos"] if cache is not None else None, mesh=mesh,
                )
            x = x + attn_out
            h = rms_norm(x, lp["ln_moe"], cfg.rms_eps)
            if gather_mode:
                moe_out, aux = moe_gather_layer(h.reshape(b * s, d), lp["moe"], i)
            elif gmm_sharded:
                moe_out, aux = moe_gmm_sharded_layer(h.reshape(b * s, d), lp["moe"], i)
            else:
                moe_out, aux = moe_ffn(
                    lp["moe"], h.reshape(b * s, d), cfg.top_k,
                    mode=cfg.moe_mode, capacity_factor=cfg.moe_capacity_factor,
                    token_mask=tm_flat, chunk=cfg.moe_chunk,
                )
            x = x + moe_out.reshape(b, s, d)
            aux_total = aux_total + aux
            if cache is not None and not paged:
                new_ks.append(nk)
                new_vs.append(nv)
        new_kv = (
            (jnp.stack(new_ks), jnp.stack(new_vs))
            if cache is not None and not paged
            else (None, None)
        )
    else:
        nl = cfg.n_layers
        layer_ids = jnp.arange(nl, dtype=jnp.int32)
        if cache is not None:
            xs = (params["layers"], cache["k"], cache["v"], layer_ids)
        else:
            xs = (params["layers"], jnp.zeros((nl, 0)), jnp.zeros((nl, 0)),
                  layer_ids)

            def layer_fn_nocache(carry, layer_inputs):  # avoid tracing cache branch
                x, aux_sum = carry
                lp, _, _, li = layer_inputs
                h = rms_norm(x, lp["ln_attn"], cfg.rms_eps)
                attn_out, _, _ = _attention_block(
                    lp["attn"], cfg, h, positions, attn_valid, None, None,
                    None, mesh=mesh,
                )
                x = x + attn_out
                h = rms_norm(x, lp["ln_moe"], cfg.rms_eps)
                moe_out, aux = moe_ffn(
                    lp["moe"], h.reshape(b * s, d), cfg.top_k,
                    mode=cfg.moe_mode, capacity_factor=cfg.moe_capacity_factor,
                    token_mask=tm_flat,
                    flat=gmm_flat, group_off=li * cfg.n_experts,
                    chunk=cfg.moe_chunk,
                )
                x = x + moe_out.reshape(b, s, d)
                return (x, aux_sum + aux), (None, None)

            layer_fn = layer_fn_nocache

        if cfg.remat:
            layer_fn = jax.checkpoint(layer_fn)
        (x, aux_total), new_kv = jax.lax.scan(
            layer_fn, (inputs_embeds, jnp.zeros((), jnp.float32)), xs
        )

    x = rms_norm(x, params["ln_final"], cfg.rms_eps)
    logits = x if return_hidden else x @ params["lm_head"]

    new_cache = None
    if paged:
        new_cache = dict(cache)
        new_cache.update({"k_pages": pages_k, "v_pages": pages_v,
                          "pos": cache["pos"] + s})
        if pages_ks is not None:
            new_cache.update({"k_scale": pages_ks, "v_scale": pages_vs})
    elif cache is not None:
        new_cache = {"k": new_kv[0], "v": new_kv[1], "pos": cache["pos"] + s}
    return logits, new_cache, aux_total / cfg.n_layers


def init_pp_kv_cache(
    cfg: MixtralConfig, n_waves: int, batch: int, max_len: int, dtype=None
) -> Params:
    """Wave-major KV cache for pipeline-parallel decode: leaves
    [L, W, B, T, H_kv, Dh], pipe-sharded on the layer dim (each stage holds
    rows for its own L/S layers only). ``pos`` is [W, B]."""
    dt = dtype or cfg.dtype
    shape = (cfg.n_layers, n_waves, batch, max_len, cfg.n_kv_heads, cfg.head_dim)
    return {
        "k": jnp.zeros(shape, dt),
        "v": jnp.zeros(shape, dt),
        "pos": jnp.zeros((n_waves, batch), jnp.int32),
    }


def pp_kv_cache_specs() -> Params:
    return {"k": P("pipe"), "v": P("pipe"), "pos": P()}


def pp_prefill(
    params: Params,
    cfg: MixtralConfig,
    mesh,
    prompts: jnp.ndarray,  # [W, B, T0] int32 (W == pipe stages)
    max_len: int,
) -> Tuple[Params, jnp.ndarray]:
    """Pipeline-parallel prefill: runs the prompt through the GPipe ring
    while materializing the wave-major layer-sharded KV cache that
    pp_decode_greedy consumes (parallel/pipeline.py::pipeline_prefill_kv).
    Together they serve a model whose weights exceed one chip's HBM
    end-to-end — the capability the reference's vLLM PP plumbing aimed at
    (vllm_file/mixtral.py:592-628) but never shipped.

    Returns (cache {'k','v','pos'}, first_tokens [W, B] greedy)."""
    from vita_tpu.parallel.pipeline import pipeline_prefill_kv

    w, b, t0 = prompts.shape
    d = cfg.d_model
    x = jnp.take(params["embed"], prompts, axis=0).astype(cfg.dtype)
    positions = jnp.broadcast_to(jnp.arange(t0)[None, None], (w, b, t0))
    kv_valid = jnp.broadcast_to(
        (jnp.arange(max_len) < t0)[None, None], (w, b, max_len)
    )
    kv_template = jnp.zeros(
        (b, max_len, cfg.n_kv_heads, cfg.head_dim), cfg.dtype
    )

    def body(lp, xx, cw, kv_zeros):
        pos_w, valid_w = cw
        bb, ss, _ = xx.shape
        h = rms_norm(xx, lp["ln_attn"], cfg.rms_eps)
        attn_out, nk, nv = _attention_block(
            lp["attn"], cfg, h, pos_w, valid_w, kv_zeros, kv_zeros,
            jnp.zeros((bb,), jnp.int32),
        )
        xx = xx + attn_out
        h = rms_norm(xx, lp["ln_moe"], cfg.rms_eps)
        moe_out, _ = moe_ffn(
            lp["moe"], h.reshape(bb * ss, d), cfg.top_k, mode="dense"
        )
        return xx + moe_out.reshape(bb, ss, d), nk, nv

    x_out, ck, cv = pipeline_prefill_kv(
        mesh, body, params["layers"], x, (positions, kv_valid),
        kv_template, cfg.pipe_stages,
    )
    h = rms_norm(x_out[:, :, -1], params["ln_final"], cfg.rms_eps)
    logits = (h @ params["lm_head"]).astype(jnp.float32)
    first = jnp.argmax(logits, -1).astype(jnp.int32)
    cache = {"k": ck, "v": cv, "pos": jnp.full((w, b), t0, jnp.int32)}
    return cache, first


def pp_generate(
    params: Params,
    cfg: MixtralConfig,
    mesh,
    prompts: jnp.ndarray,  # [W, B, T0] int32
    n_tokens: int,
    max_len: int,
) -> jnp.ndarray:
    """End-to-end pipeline-parallel greedy generation: GPipe prefill into
    the layer-sharded cache, then the S-wave ring decode. Returns tokens
    [W, n_tokens + 1, B] (the prefill's first sample + n_tokens more)."""
    cache, first = pp_prefill(params, cfg, mesh, prompts, max_len)
    toks, _ = pp_decode_greedy(params, cfg, mesh, cache, first, n_tokens)
    return jnp.concatenate([first[:, None], toks], axis=1)


def pp_decode_greedy(
    params: Params,
    cfg: MixtralConfig,
    mesh,
    cache: Params,  # from init_pp_kv_cache, prefilled per wave
    first_tokens: jnp.ndarray,  # [W, B] int32 — each wave's next input token
    n_tokens: int,
) -> Tuple[jnp.ndarray, Params]:
    """Pipeline-parallel greedy decode: S waves ride the pipe-axis ring
    (parallel/pipeline.py::pipeline_decode_greedy). Decode-path counterpart
    of the reference's vLLM PP plumbing (vllm_file/mixtral.py:592-628),
    which the reference plumbed but never deployed.

    MoE dispatch inside the stage follows cfg.moe_mode: the gather decode
    modes read each stage's LOCAL stacked experts through flat
    [L/S * E, ...] views with group ids li*E + topk (the same invariant as
    gmm_scan — the Pallas kernels never consume lax.scan-sliced weights);
    any other mode runs dense routing. Returns (tokens [W, n_tokens, B],
    cache)."""
    from vita_tpu.parallel.pipeline import pipeline_decode_greedy

    d = cfg.d_model
    gather_mode = cfg.moe_mode in ("gather", "gather_q", "gather_q4")

    def stage_fn(local_layers, ck, cv, x, positions, kv_valid, cache_pos):
        if gather_mode:
            from vita_tpu.ops.moe_decode import (
                gather_expert_ffn,
                gather_expert_ffn_q,
                gather_expert_ffn_q4,
            )

            moe = local_layers["moe"]
            # free metadata reshape of the whole LOCAL stacked arrays;
            # closed over (not scanned), so the kernel operand is never a
            # scan-sliced copy
            flat = {
                k: v.reshape((-1,) + v.shape[2:])
                for k, v in moe.items()
                if k != "router"
            }
            n_local = moe["router"].shape[0]
            lids = jnp.arange(n_local, dtype=jnp.int32)
            xs = (
                {
                    "attn": local_layers["attn"],
                    "ln_attn": local_layers["ln_attn"],
                    "ln_moe": local_layers["ln_moe"],
                    "router": moe["router"],
                },
                ck, cv, lids,
            )
        else:
            xs = (local_layers, ck, cv,
                  jnp.arange(jax.tree.leaves(local_layers)[0].shape[0],
                             dtype=jnp.int32))

        def f(carry, xs_):
            x = carry
            lp, ck1, cv1, li = xs_
            h = rms_norm(x, lp["ln_attn"], cfg.rms_eps)
            attn_out, nk, nv = _attention_block(
                lp["attn"], cfg, h, positions, kv_valid, ck1, cv1, cache_pos
            )
            x = x + attn_out
            h = rms_norm(x, lp["ln_moe"], cfg.rms_eps)
            b, s, _ = x.shape
            h2d = h.reshape(b * s, d)
            if gather_mode:
                router_logits = jnp.einsum(
                    "td,de->te", h2d.astype(jnp.float32),
                    lp["router"].astype(jnp.float32),
                )
                topk_w, topk_i, _ = route_topk(router_logits, cfg.top_k)
                idx = topk_i + li * cfg.n_experts
                if cfg.moe_mode == "gather_q4":
                    eo = gather_expert_ffn_q4(h2d, idx, flat)
                elif cfg.moe_mode == "gather_q":
                    eo = gather_expert_ffn_q(h2d, idx, flat)
                else:
                    eo = gather_expert_ffn(
                        h2d, idx, flat["w_gate"], flat["w_up"], flat["w_down"]
                    )
                moe_out = jnp.sum(
                    eo * topk_w[..., None].astype(h2d.dtype), axis=1
                ).astype(x.dtype)
            else:
                moe_out, _ = moe_ffn(
                    lp["moe"], h2d, cfg.top_k, mode=cfg.moe_mode,
                    capacity_factor=cfg.moe_capacity_factor,
                )
            return x + moe_out.reshape(b, s, d), (nk, nv)

        y, (nk, nv) = jax.lax.scan(f, x, xs)
        return y, nk, nv

    def finish_fn(head, y):
        h = rms_norm(y, head["ln_final"], cfg.rms_eps)
        logits = (h[:, 0] @ head["lm_head"]).astype(jnp.float32)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        emb = jnp.take(head["embed"], tok, axis=0)[:, None].astype(y.dtype)
        return tok, emb

    head = {
        "ln_final": params["ln_final"],
        "lm_head": params["lm_head"],
        "embed": params["embed"],
    }
    x0 = jnp.take(params["embed"], first_tokens, axis=0)[:, :, None].astype(
        cfg.dtype
    )
    toks, ck, cv = pipeline_decode_greedy(
        mesh, stage_fn, finish_fn, params["layers"], head,
        cache["k"], cache["v"], x0, cache["pos"], n_tokens,
    )
    return toks, {"k": ck, "v": cv, "pos": cache["pos"] + n_tokens}
