"""On-device token sampling and multi-token decode chunks.

The round-1 decode loop pulled the full logits row to host every token and
sampled in numpy; on this environment's tunnel (~27 ms RTT) that caps decode
at ~35 tok/s regardless of kernel speed. Here sampling (greedy +
temperature / top-k / top-p, matching the reference demos' generate args —
video_audio_demo.py:257-270, web_demo/web_ability_demo.py:351) runs inside
the jitted step, and decode advances ``chunk_len`` tokens per dispatch via
``lax.scan``; the host reads back one small [B, chunk_len] int32 array per
chunk instead of one [V] logits row per token.

All sampling knobs are *traced* values (temperature/top_k/top_p arrays), so
one compiled chunk program serves every sampling configuration — dynamic
top-k uses a descending sort + take instead of ``lax.top_k`` (static k);
nucleus filtering reuses the same sorted order.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vita_tpu.models import mixtral

NEG_INF = float(jnp.finfo(jnp.float32).min)


def choose_sampling_mode(temperatures, top_ks, top_ps) -> str:
    """Cheapest static sampling tier covering the given requests: 'greedy'
    needs only an argmax, 'categorical' adds Gumbel sampling, 'filtered'
    pays a full-vocab sort for top-k/top-p. The tier is baked into the
    compiled decode program (at most 3 variants), so greedy decoding never
    pays the ~51k-element sort."""
    ts = np.atleast_1d(np.asarray(temperatures))
    ks = np.atleast_1d(np.asarray(top_ks))
    ps = np.atleast_1d(np.asarray(top_ps))
    if np.any((ks > 0) | (ps < 1.0)):
        return "filtered"
    if np.any(ts > 0.0):
        return "categorical"
    return "greedy"


def sample_tokens(
    logits: jnp.ndarray,  # [B, V] (any float dtype)
    key: jax.Array,
    temperature: jnp.ndarray,  # [B] float; <= 0 -> greedy
    top_k: jnp.ndarray,  # [B] int32; <= 0 -> disabled
    top_p: jnp.ndarray,  # [B] float; >= 1 -> disabled
    mode: str = "filtered",
) -> jnp.ndarray:
    """Sample one token per row. Greedy rows (temperature<=0) are exact
    argmax; sampled rows apply top-k then top-p on the temperature-scaled
    distribution (same order of operations as the reference's HF generate
    configuration).

    ``mode`` (static) must cover the traced knobs (choose_sampling_mode):
    under 'greedy'/'categorical' the filter knobs are ignored."""
    v = logits.shape[-1]
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if mode == "greedy":
        return greedy

    x = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)[:, None]
    if mode == "categorical":
        sampled = jax.random.categorical(key, x, axis=-1).astype(jnp.int32)
        return jnp.where(temperature <= 0.0, greedy, sampled)
    order = jnp.argsort(-x, axis=-1)  # descending
    x_sorted = jnp.take_along_axis(x, order, axis=-1)

    # top-k in sorted space: keep ranks < k (k<=0 disables)
    ranks = jnp.arange(v)[None, :]
    k = jnp.where(top_k > 0, jnp.clip(top_k, 1, v), v)[:, None]
    keep = ranks < k

    # top-p on the top-k-filtered distribution: keep the minimal prefix
    # whose probability mass reaches top_p (exclusive-cumsum < top_p)
    masked = jnp.where(keep, x_sorted, NEG_INF)
    probs = jax.nn.softmax(masked, axis=-1)
    csum_excl = jnp.cumsum(probs, axis=-1) - probs
    keep &= csum_excl < jnp.clip(top_p, 1e-6, 1.0)[:, None]

    idx = jax.random.categorical(key, jnp.where(keep, x_sorted, NEG_INF), axis=-1)
    sampled = jnp.take_along_axis(order, idx[:, None], axis=-1)[:, 0].astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy, sampled)


def decode_chunk(
    llm_params: Dict[str, Any],
    cache: Dict[str, Any],
    tok: jnp.ndarray,  # [B] int32 — last sampled, kv not yet written
    pos: jnp.ndarray,  # [B] int32 — cache row each slot writes next
    active: jnp.ndarray,  # [B] bool
    temperature: jnp.ndarray,  # [B]
    top_k: jnp.ndarray,  # [B] int32
    top_p: jnp.ndarray,  # [B]
    key: jax.Array,
    *,
    llm_cfg: mixtral.MixtralConfig,
    chunk_len: int,
    sampling_mode: str = "filtered",
    mesh=None,  # TP/EP serving mesh (parallel/sharded_ops.py); hashable static
) -> Tuple[Dict[str, Any], jnp.ndarray, jnp.ndarray, jax.Array]:
    """Run ``chunk_len`` decode steps fully on device.

    Emits the *fed* token at each step (the last step's sample is returned
    as the new carry ``tok``), so the host sees generated tokens in order
    with exactly one device->host readback per chunk. Inactive slots write
    their kv past the cache end (dropped) and attend nothing.

    Accepts either the linear KV cache ({'k','v','pos'}) or the paged
    block-pool cache ({'k_pages','v_pages','table','pos'}); the branch is
    static (pytree structure).

    Donation applies to the big KV arrays ONLY (in-place pool update);
    table/pos and the sampling-tier arrays survive the call, so a serving
    loop can keep them device-resident across chunks instead of
    re-uploading per tick (each small H2D dispatch rides the tunnel RTT).

    Returns (cache, tokens [B, chunk_len], next_tok [B], next_key);
    the returned cache carries the ADVANCED ``pos``.
    """
    if "k_pages" in cache:
        # int8 pools carry per-row scale arrays alongside (kv_int8)
        kv = {k: cache[k] for k in
              ("k_pages", "v_pages", "k_scale", "v_scale") if k in cache}
        table = cache["table"]
    else:
        kv = {"k": cache["k"], "v": cache["v"]}
        table = None
    kv, toks, tok, key, pos_out = _decode_chunk_jit(
        llm_params, kv, table, tok, pos, active, temperature, top_k, top_p,
        key, llm_cfg=llm_cfg, chunk_len=chunk_len,
        sampling_mode=sampling_mode, mesh=mesh,
    )
    new_cache = dict(cache)
    new_cache.update(kv)
    new_cache["pos"] = pos_out
    return new_cache, toks, tok, key


@functools.partial(
    jax.jit,
    static_argnames=("llm_cfg", "chunk_len", "sampling_mode", "mesh"),
    donate_argnames=("kv",),
)
def _decode_chunk_jit(
    llm_params, kv, table, tok, pos, active, temperature, top_k, top_p, key,
    *, llm_cfg, chunk_len, sampling_mode, mesh,
):
    paged = "k_pages" in kv
    if paged:

        pool_keys = tuple(kv)  # k_pages/v_pages (+ k_scale/v_scale if int8)

        def body(carry, _):
            kv, tok, pos, key = carry
            c = dict(kv)
            c.update({"table": table, "pos": pos, "active": active})
            logits, nc, _ = mixtral.forward(
                llm_params, llm_cfg, input_ids=tok[:, None],
                positions=pos[:, None], cache=c, mesh=mesh,
            )
            key, sub = jax.random.split(key)
            nxt = sample_tokens(logits[:, -1], sub, temperature, top_k, top_p,
                                mode=sampling_mode)
            return (
                {k: nc[k] for k in pool_keys},
                nxt, pos + 1, key,
            ), tok

        carry0 = (dict(kv), tok, pos, key)
        (kv, tok, pos, key), toks = jax.lax.scan(body, carry0, None, length=chunk_len)
        return kv, toks.T, tok, key, pos

    max_len = kv["k"].shape[2]

    def body(carry, _):
        kv, tok, pos, key = carry
        write_pos = jnp.where(active, pos, max_len)
        c = {"k": kv["k"], "v": kv["v"], "pos": write_pos}
        valid = (jnp.arange(max_len)[None, :] <= pos[:, None]) & active[:, None]
        logits, nc, _ = mixtral.forward(
            llm_params, llm_cfg, input_ids=tok[:, None],
            positions=pos[:, None], attn_valid=valid, cache=c, mesh=mesh,
        )
        key, sub = jax.random.split(key)
        nxt = sample_tokens(logits[:, -1], sub, temperature, top_k, top_p,
                            mode=sampling_mode)
        return ({"k": nc["k"], "v": nc["v"]}, nxt, pos + 1, key), tok

    (kv, tok, pos, key), toks = jax.lax.scan(
        body, ({"k": kv["k"], "v": kv["v"]}, tok, pos, key), None,
        length=chunk_len,
    )
    # return the ADVANCED positions: a caller feeding the returned cache
    # into the next chunk must not re-decode at the original rows
    return kv, toks.T, tok, key, pos
