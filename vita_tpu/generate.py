"""Generation: jitted multimodal prefill + token-by-token decode.

The decode loop is a single compiled step reused across tokens (KV cache
is functional state). Host-side loop handles stopping (eos / max tokens /
cache-capacity guard — XLA's dynamic_update_slice silently clamps writes
past the cache end, so the guard lives here).

Mirrors the reference's HF-path generate flow
(video_audio_demo.py:257-270, vita_mixtral.py:357-382: media only at
prefill, decode steps feed one token) with temperature/greedy sampling
(demo default temperature 0.01 ~= greedy).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vita_tpu.models import mixtral, vita


@dataclasses.dataclass
class GenerationConfig:
    max_new_tokens: int = 512
    temperature: float = 0.0  # 0 => greedy
    top_k: int = 0  # 0 => no top-k filter
    top_p: float = 1.0  # nucleus sampling threshold
    eos_id: int = 2  # </s>
    # multi-token stop sequences (KeywordsStoppingCriteria equivalent,
    # vita/util/mm_utils.py:121-155): generation stops when the output
    # ends with any of these id sequences.
    stop_sequences: tuple = ()


def stop_sequences_from_keywords(keywords, encode, bos_id=None):
    """Build stop id-sequences from keyword strings (strips leading BOS the
    way the reference does, mm_utils.py:127-131)."""
    seqs = []
    for kw in keywords:
        ids = encode(kw)
        if bos_id is not None and len(ids) > 1 and ids[0] == bos_id:
            ids = ids[1:]
        seqs.append(tuple(ids))
    return tuple(seqs)


def ends_with_stop(tokens, stop_sequences) -> bool:
    for seq in stop_sequences:
        n = len(seq)
        if n and len(tokens) >= n and tuple(tokens[-n:]) == tuple(seq):
            return True
    return False


class Generator:
    """Holds the jitted prefill/decode executables for one (cfg, shapes)."""

    def __init__(self, params, cfg: vita.VITAConfig, max_len: int = 4096):
        self.params = params
        self.cfg = cfg
        self.max_len = max_len

        @jax.jit
        def _prefill(params, cache, input_ids, image_mask, audio_mask,
                     images, speech, speech_lengths, attn_valid):
            logits, cache, _ = vita.forward(
                params, cfg, input_ids,
                image_mask=image_mask, audio_mask=audio_mask,
                images=images, speech=speech, speech_lengths=speech_lengths,
                attn_valid=attn_valid, cache=cache,
            )
            return logits, cache

        @jax.jit
        def _prefill_text(params, cache, input_ids, attn_valid):
            logits, cache, _ = vita.forward(
                params, cfg, input_ids, attn_valid=attn_valid, cache=cache
            )
            return logits, cache

        @jax.jit
        def _step(params, cache, tok, attn_valid):
            logits, cache, _ = mixtral.forward(
                params["llm"], cfg.llm, input_ids=tok,
                attn_valid=attn_valid, cache=cache,
            )
            return logits[:, -1], cache

        self._prefill = _prefill
        self._prefill_text = _prefill_text
        self._step = _step

    def _sample(self, logits: np.ndarray, gen: GenerationConfig, rng: np.random.Generator):
        if gen.temperature <= 0.0:
            return int(np.argmax(logits))
        x = logits.astype(np.float64) / gen.temperature
        if gen.top_k > 0:
            kth = np.partition(x, -gen.top_k)[-gen.top_k]
            x = np.where(x < kth, -np.inf, x)
        p = np.exp(x - x.max())
        p /= p.sum()
        if gen.top_p < 1.0:
            order = np.argsort(-p)
            csum = np.cumsum(p[order])
            cut = int(np.searchsorted(csum, gen.top_p)) + 1
            mask = np.zeros_like(p)
            mask[order[:cut]] = 1.0
            p = p * mask
            p /= p.sum()
        return int(rng.choice(len(p), p=p))

    def generate(
        self,
        input_ids: np.ndarray,  # [S] sentinel-free ids
        image_mask: Optional[np.ndarray] = None,
        audio_mask: Optional[np.ndarray] = None,
        images: Optional[np.ndarray] = None,
        speech: Optional[np.ndarray] = None,
        speech_length: Optional[int] = None,
        gen: Optional[GenerationConfig] = None,
        seed: int = 0,
        on_token=None,
    ) -> List[int]:
        """Single-sequence generation. Returns new token ids (no prompt)."""
        gen = gen or GenerationConfig()
        rng = np.random.default_rng(seed)
        s = len(input_ids)
        if s + gen.max_new_tokens > self.max_len:
            raise ValueError(
                f"prompt ({s}) + max_new_tokens ({gen.max_new_tokens}) exceeds "
                f"cache capacity {self.max_len}"
            )

        cache = mixtral.init_kv_cache(self.cfg.llm, batch=1, max_len=self.max_len)
        ids = jnp.asarray(input_ids, jnp.int32)[None]
        valid = jnp.zeros((1, self.max_len), bool).at[:, :s].set(True)

        if images is None and speech is None:
            logits, cache = self._prefill_text(self.params, cache, ids, valid)
        else:
            im = (
                jnp.asarray(image_mask)[None]
                if image_mask is not None
                else jnp.zeros((1, s), bool)
            )
            am = (
                jnp.asarray(audio_mask)[None]
                if audio_mask is not None
                else jnp.zeros((1, s), bool)
            )
            sp = jnp.asarray(speech)[None] if speech is not None else None
            sl = jnp.asarray([speech_length or 0]) if speech is not None else None
            logits, cache = self._prefill(
                self.params, cache, ids, im, am,
                jnp.asarray(images) if images is not None else None,
                sp, sl, valid,
            )

        out: List[int] = []
        tok = self._sample(np.asarray(logits[0, s - 1]), gen, rng)
        for i in range(gen.max_new_tokens):
            out.append(tok)
            if on_token is not None:
                on_token(tok)
            if tok == gen.eos_id or ends_with_stop(out, gen.stop_sequences):
                break
            pos = s + i
            if pos + 1 > self.max_len:
                break
            valid = valid.at[:, pos].set(True)
            logits, cache = self._step(
                self.params, cache, jnp.asarray([[tok]], jnp.int32), valid
            )
            tok = self._sample(np.asarray(logits[0]), gen, rng)
        return out
