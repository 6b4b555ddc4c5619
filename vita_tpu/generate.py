"""Generation: bucketed multimodal prefill + on-device chunked decode.

TPU-first redesign of the reference's HF-path generate flow
(video_audio_demo.py:257-270, vita_mixtral.py:357-382: media only at
prefill, decode steps feed one token):

- **Bucketed prefill**: prompts are padded to a small set of length buckets
  (and image tiles / audio frames to their own buckets), so the XLA compile
  cache stays bounded under arbitrary user inputs — critical on a backend
  where each remote compile takes minutes.
- **On-device decode**: sampling (greedy/temperature/top-k/top-p) runs
  inside the jitted step and ``chunk_len`` tokens advance per dispatch
  (vita_tpu.sampling.decode_chunk); the host reads back one small int32
  array per chunk instead of a [V] logits row per token, so decode speed is
  set by the chip, not the host link. Chunk dispatches are pipelined one
  deep to hide the readback round-trip entirely.
- Stop handling (eos / KeywordsStoppingCriteria-style stop sequences,
  vita/util/mm_utils.py:121-155 / max tokens) stays host-side, applied per
  chunk with exact truncation — outputs are identical to a token-by-token
  loop.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vita_tpu.models import mixtral, vita
from vita_tpu.sampling import choose_sampling_mode, decode_chunk, sample_tokens
from vita_tpu.tokenization import audio_select_arrays, audio_token_count, pad_to_bucket

DEFAULT_PROMPT_BUCKETS = (128, 256, 512, 1024, 2048, 4096)
DEFAULT_TILE_BUCKETS = (1, 5, 13)  # dynamic-patch counts: 1 tile .. 12+thumbnail
DEFAULT_FRAME_BUCKETS = (400, 800, 1600, 3200, 6400)  # 10ms fbank frames


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


def pad_axis0(x: np.ndarray, buckets: Sequence[int]) -> np.ndarray:
    """Zero-pad axis 0 of ``x`` up to the smallest bucket >= its length.
    Lengths beyond the largest bucket are left as-is (exact-shape compile)."""
    n = x.shape[0]
    for b in sorted(buckets):
        if n <= b:
            if n == b:
                return x
            pad = [(0, b - n)] + [(0, 0)] * (x.ndim - 1)
            return np.pad(x, pad)
    return x


CLIP_COUNT_BUCKETS = (1, 2, 4, 8, 16)


def stack_speech_clips(
    speech, speech_length, frame_buckets: Sequence[int]
) -> Tuple[np.ndarray, np.ndarray, List[int]]:
    """Normalize one-or-many audio clips into a static-shape stack.

    Returns (clips [n_bucket, T_bucket, 80], lengths [n_bucket],
    per-clip LLM token counts). Clip count and frame length both bucket so
    the prefill program cache stays bounded; padding clips have length 1
    and are never selected by the merge (audio_select addressing)."""
    clips = list(speech) if isinstance(speech, (list, tuple)) else [speech]
    if isinstance(speech_length, (list, tuple, np.ndarray)):
        lens = [int(x) for x in speech_length]
    else:
        lens = [int(speech_length or clips[0].shape[0])]
    if len(lens) != len(clips):
        raise ValueError(f"{len(clips)} clips but {len(lens)} lengths")
    counts = [audio_token_count(l) for l in lens]

    padded = [pad_axis0(np.asarray(c, np.float32), frame_buckets) for c in clips]
    t = max(p.shape[0] for p in padded)
    padded = [np.pad(p, ((0, t - p.shape[0]), (0, 0))) for p in padded]
    nb = next((b for b in CLIP_COUNT_BUCKETS if b >= len(padded)), len(padded))
    while len(padded) < nb:
        padded.append(np.zeros((t, padded[0].shape[1]), np.float32))
        lens.append(1)
    return np.stack(padded), np.asarray(lens, np.int32), counts


def stack_encoded_clips(
    encoded, encoded_length, frame_buckets: Sequence[int]
) -> Tuple[np.ndarray, np.ndarray, List[int]]:
    """stack_speech_clips twin for PRE-ENCODED Whale features (streaming
    path, serve.streaming_audio): clips are [T', whale_hidden] with
    T' = subsampled_length(raw_frames). Buckets are the raw frame buckets
    mapped through the same subsampling so one program cache serves both
    paths' shape families. Token counts use the adapter arithmetic
    (T'-1)//2+1 — identical to audio_token_count on the raw length."""
    from vita_tpu.models.whale import subsampled_length

    clips = list(encoded) if isinstance(encoded, (list, tuple)) else [encoded]
    if isinstance(encoded_length, (list, tuple, np.ndarray)):
        lens = [int(x) for x in encoded_length]
    else:
        lens = [int(encoded_length or clips[0].shape[0])]
    if len(lens) != len(clips):
        raise ValueError(f"{len(clips)} clips but {len(lens)} lengths")
    counts = [(l - 1) // 2 + 1 for l in lens]

    sub_buckets = sorted({int(subsampled_length(b)) for b in frame_buckets})
    padded = [pad_axis0(np.asarray(c, np.float32), sub_buckets) for c in clips]
    t = max(p.shape[0] for p in padded)
    padded = [np.pad(p, ((0, t - p.shape[0]), (0, 0))) for p in padded]
    nb = next((b for b in CLIP_COUNT_BUCKETS if b >= len(padded)), len(padded))
    while len(padded) < nb:
        padded.append(np.zeros((t, padded[0].shape[1]), np.float32))
        lens.append(1)
    return np.stack(padded), np.asarray(lens, np.int32), counts


class Generator:
    """Holds the jitted prefill/decode executables for one (cfg, shapes)."""

    def __init__(
        self,
        params,
        cfg: vita.VITAConfig,
        max_len: int = 4096,
        chunk_len: int = 8,
        prompt_buckets: Sequence[int] = DEFAULT_PROMPT_BUCKETS,
        tile_buckets: Sequence[int] = DEFAULT_TILE_BUCKETS,
        frame_buckets: Sequence[int] = DEFAULT_FRAME_BUCKETS,
        decode_moe_mode: Optional[str] = None,  # None=inherit cfg.llm.moe_mode
        prefill_moe_mode: Optional[str] = None,  # None=inherit cfg.llm.moe_mode
    ):
        self.params = params
        self.cfg = cfg
        self.max_len = max_len
        self.chunk_len = chunk_len
        buckets = sorted(b for b in prompt_buckets if b <= max_len)
        if not buckets or buckets[-1] < max_len:
            buckets.append(max_len)
        self.prompt_buckets = tuple(buckets)
        # framecat tiles come in 5-tuples: buckets round up to multiples
        g = getattr(cfg, "image_group_tiles", 1)
        self.tile_buckets = tuple(sorted({-(-b // g) * g for b in tile_buckets}))
        self.frame_buckets = tuple(sorted(frame_buckets))

        # Decode MoE path (same options as serve.engine): 'gather'/'gather_q'
        # read only the selected experts via the Pallas kernels.
        if decode_moe_mode is None:
            # 'gmm' is a training/prefill dispatch (multi-token tiles);
            # a gmm-trained checkpoint decodes via the selected-expert
            # gather kernel (identical outputs, single-token-row layout)
            decode_moe_mode = (
                "gather" if cfg.llm.moe_mode == "gmm" else cfg.llm.moe_mode
            )
        if decode_moe_mode not in ("dense", "capacity", "sort", "gather", "gather_q", "gather_q4"):
            raise ValueError(f"bad decode_moe_mode {decode_moe_mode!r}")
        self._decode_cfg = dataclasses.replace(cfg.llm, moe_mode=decode_moe_mode)
        if decode_moe_mode in ("gather_q", "gather_q4"):
            self._decode_llm = mixtral.quantize_moe_for_decode(
                params["llm"], bits=4 if decode_moe_mode == "gather_q4" else 8
            )
        else:
            self._decode_llm = params["llm"]

        # Prefill MoE dispatch over the padded prompt bucket: 'gmm' (exact,
        # top-k-only FLOPs) or 'sort' (capacity-dropping, fastest) instead
        # of the default dense einsums — see serve.engine and
        # tools/bench_prefill_moe.py for the measured tradeoffs.
        if prefill_moe_mode is None:
            prefill_moe_mode = cfg.llm.moe_mode
        if prefill_moe_mode not in ("dense", "capacity", "sort", "gmm"):
            raise ValueError(f"bad prefill_moe_mode {prefill_moe_mode!r}")
        pcfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, moe_mode=prefill_moe_mode)
        )

        @functools.partial(jax.jit, static_argnames=("mode",))
        def _prefill(params, input_ids, image_mask, audio_mask,
                     images, speech, speech_lengths, audio_select,
                     true_len, temp, tk, tp, key, mode="filtered"):
            cache = mixtral.init_kv_cache(cfg.llm, 1, max_len)
            attn_valid = jnp.arange(max_len)[None, :] < true_len[:, None]
            logits, cache, _ = vita.forward(
                params, pcfg, input_ids,
                image_mask=image_mask, audio_mask=audio_mask,
                images=images, speech=speech, speech_lengths=speech_lengths,
                audio_select=audio_select,
                attn_valid=attn_valid, cache=cache,
            )
            last = jnp.take_along_axis(
                logits, (true_len - 1)[:, None, None], axis=1
            )[:, 0]
            key, sub = jax.random.split(key)
            tok = sample_tokens(last, sub, temp, tk, tp, mode=mode)
            return tok, cache["k"], cache["v"], key

        @functools.partial(jax.jit, static_argnames=("mode",))
        def _prefill_text(params, input_ids, true_len, temp, tk, tp, key,
                          mode="filtered"):
            cache = mixtral.init_kv_cache(cfg.llm, 1, max_len)
            attn_valid = jnp.arange(max_len)[None, :] < true_len[:, None]
            logits, cache, _ = vita.forward(
                params, pcfg, input_ids, attn_valid=attn_valid, cache=cache
            )
            last = jnp.take_along_axis(
                logits, (true_len - 1)[:, None, None], axis=1
            )[:, 0]
            key, sub = jax.random.split(key)
            tok = sample_tokens(last, sub, temp, tk, tp, mode=mode)
            return tok, cache["k"], cache["v"], key

        self._prefill = _prefill
        self._prefill_text = _prefill_text

    def generate(
        self,
        input_ids: np.ndarray,  # [S] sentinel-free ids
        image_mask: Optional[np.ndarray] = None,
        audio_mask: Optional[np.ndarray] = None,
        images: Optional[np.ndarray] = None,
        speech=None,  # [T, 80] or a list of clips (multi-turn audio)
        speech_length=None,  # int or list of ints
        gen: Optional[GenerationConfig] = None,
        seed: int = 0,
        on_token=None,
    ) -> List[int]:
        """Single-sequence generation. Returns new token ids (no prompt)."""
        gen = gen or GenerationConfig()
        s = len(input_ids)
        if s + gen.max_new_tokens > self.max_len:
            raise ValueError(
                f"prompt ({s}) + max_new_tokens ({gen.max_new_tokens}) exceeds "
                f"cache capacity {self.max_len}"
            )

        padded, _ = pad_to_bucket(input_ids, self.prompt_buckets, pad_id=0)
        p = len(padded)

        def _padmask(m):
            out = np.zeros(p, bool)
            if m is not None:
                out[:s] = np.asarray(m, bool)
            return jnp.asarray(out)[None]

        ids = jnp.asarray(np.asarray(padded, np.int32))[None]
        true_len = jnp.asarray([s], jnp.int32)
        temp = jnp.asarray([gen.temperature], jnp.float32)
        tk = jnp.asarray([gen.top_k], jnp.int32)
        tp = jnp.asarray([gen.top_p], jnp.float32)
        key = jax.random.PRNGKey(seed)
        # static sampling tier: greedy requests must not pay the 51k-vocab
        # sort — in the prefill programs too, not just decode_chunk
        mode = choose_sampling_mode(gen.temperature, gen.top_k, gen.top_p)

        if images is None and speech is None:
            tok, k, v, key = self._prefill_text(
                self.params, ids, true_len, temp, tk, tp, key, mode=mode
            )
        else:
            im = _padmask(image_mask)
            # one padded audio mask drives BOTH the model mask and the
            # audio_select addressing (they must stay byte-identical)
            am_np = np.zeros(p, bool)
            if audio_mask is not None:
                am_np[:s] = np.asarray(audio_mask, bool)
            am = jnp.asarray(am_np)[None]
            img = (
                jnp.asarray(pad_axis0(np.asarray(images), self.tile_buckets))
                if images is not None else None
            )
            sp = sl = sel = None
            if speech is not None:
                clips, lens, counts = stack_speech_clips(
                    speech, speech_length, self.frame_buckets
                )
                sp, sl = jnp.asarray(clips), jnp.asarray(lens)
                ci, ri = audio_select_arrays(am_np, counts)
                sel = (jnp.asarray(ci)[None], jnp.asarray(ri)[None])
            tok, k, v, key = self._prefill(
                self.params, ids, im, am, img, sp, sl, sel,
                true_len, temp, tk, tp, key, mode=mode,
            )

        cache = {"k": k, "v": v, "pos": true_len}
        active = jnp.ones((1,), bool)
        out: List[int] = []
        pos = s
        first_token_dev = tok  # read back early for streaming TTFT

        # pipeline chunk dispatches one deep: enqueue chunk i+1 before
        # reading chunk i's tokens so the host round-trip is hidden.

        def launch(cache, tok, pos, key):
            return decode_chunk(
                self._decode_llm, cache, tok, jnp.asarray([pos], jnp.int32),
                active, temp, tk, tp, key,
                llm_cfg=self._decode_cfg, chunk_len=self.chunk_len,
                sampling_mode=mode,
            )

        def start_host_copy(x):
            try:
                x.copy_to_host_async()  # enqueue before the next dispatch
            except AttributeError:
                pass

        cache, toks, tok, key = launch(cache, tok, pos, key)
        start_host_copy(toks)
        pending = toks
        pos += self.chunk_len
        if on_token is not None:
            # first token is ready before the chunk completes; stream it
            on_token(int(np.asarray(first_token_dev)[0]))
        streamed_first = on_token is not None

        while True:
            want_more = len(out) + self.chunk_len < gen.max_new_tokens
            nxt = launch(cache, tok, pos, key) if want_more else None
            chunk = np.asarray(pending)[0]
            done = False
            for t in chunk:
                t = int(t)
                out.append(t)
                if on_token is not None and not (streamed_first and len(out) == 1):
                    on_token(t)
                if (
                    t == gen.eos_id
                    or ends_with_stop(out, gen.stop_sequences)
                    or len(out) >= gen.max_new_tokens
                ):
                    done = True
                    break
            if done or nxt is None:
                return out
            cache, pending, tok, key = nxt
            start_host_copy(pending)
            pos += self.chunk_len
