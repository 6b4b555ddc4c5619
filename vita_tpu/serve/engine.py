"""Serving engine: slot-based continuous batching with streaming output.

TPU-native replacement for the reference's patched-vLLM serving stack
(web_demo/vllm_tools/, AsyncLLMEngine usage in web_interactive_demo.py):
a fixed pool of KV-cache slots; new requests prefill into a free slot
while existing slots keep decoding (one batched decode step per tick);
tokens stream to per-request callbacks; requests support cancellation
mid-decode (the duplex interrupt path, web_interactive_demo.py:345-351).

Static shapes throughout: the global cache is [L, n_slots, max_len, H, D];
per-slot depths live in a host-side position array; inactive slots are
masked out of the batched step by pointing their cache writes past the
end (XLA scatter drops out-of-range writes).
"""

from __future__ import annotations

import dataclasses
import itertools
import queue
import threading
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vita_tpu.models import mixtral, vita


@dataclasses.dataclass
class Request:
    input_ids: np.ndarray  # [S] sentinel-free ids
    max_new_tokens: int = 512
    temperature: float = 0.0
    eos_id: int = 2
    image_mask: Optional[np.ndarray] = None
    audio_mask: Optional[np.ndarray] = None
    images: Optional[np.ndarray] = None
    speech: Optional[np.ndarray] = None
    speech_length: int = 0
    on_token: Optional[Callable[[int], None]] = None
    on_finish: Optional[Callable[[List[int], str], None]] = None
    request_id: int = dataclasses.field(default_factory=itertools.count().__next__)

    # runtime state
    cancelled: bool = False
    tokens: List[int] = dataclasses.field(default_factory=list)
    submit_time: float = 0.0
    first_token_time: float = 0.0
    finish_time: float = 0.0

    def cancel(self) -> None:
        self.cancelled = True

    @property
    def ttft_s(self) -> float:
        return max(self.first_token_time - self.submit_time, 0.0)

    @property
    def decode_tokens_per_s(self) -> float:
        dt = self.finish_time - self.first_token_time
        return (len(self.tokens) - 1) / dt if dt > 0 and len(self.tokens) > 1 else 0.0


class Engine:
    """Single-model continuous-batching engine."""

    def __init__(
        self,
        params,
        cfg: vita.VITAConfig,
        n_slots: int = 4,
        max_len: int = 4096,
        seed: int = 0,
        decode_moe_mode: Optional[str] = None,  # None=inherit cfg.llm.moe_mode
    ):
        self.params = params
        self.cfg = cfg
        self.n_slots = n_slots
        self.max_len = max_len
        self.rng = np.random.default_rng(seed)

        # Decode MoE path. None inherits cfg.llm.moe_mode so prefill and
        # decode use the same math by default; 'gather' reads only the
        # selected experts (same weights, zero copies — the kernel indexes
        # the stacked arrays directly); 'gather_q' additionally keeps an
        # int8 expert copy (~half the expert bytes) for 2x faster decode.
        if decode_moe_mode is None:
            decode_moe_mode = cfg.llm.moe_mode
        if decode_moe_mode not in ("dense", "capacity", "gather", "gather_q"):
            raise ValueError(
                f"decode_moe_mode must be dense|capacity|gather|gather_q, "
                f"got {decode_moe_mode!r}"
            )
        self._decode_llm_cfg = dataclasses.replace(cfg.llm, moe_mode=decode_moe_mode)
        if decode_moe_mode == "gather_q":
            self._decode_llm = mixtral.quantize_moe_for_decode(params["llm"])
        else:
            self._decode_llm = params["llm"]

        self.cache = mixtral.init_kv_cache(cfg.llm, n_slots, max_len)
        self.pos = np.zeros(n_slots, np.int32)  # host-side slot depths
        self.slot_req: List[Optional[Request]] = [None] * n_slots
        self.queue: "queue.Queue[Request]" = queue.Queue()

        llm = cfg.llm

        @jax.jit
        def _prefill(params, ids, image_mask, audio_mask, images, speech, speech_lengths):
            """Batch-1 prefill with its own scratch cache; returns last
            logits + the kv to install into a slot."""
            scratch = mixtral.init_kv_cache(llm, 1, max_len)
            logits, new_cache, _ = vita.forward(
                params, cfg, ids,
                image_mask=image_mask, audio_mask=audio_mask,
                images=images, speech=speech, speech_lengths=speech_lengths,
                attn_valid=jnp.arange(max_len)[None] < ids.shape[1],
                cache=scratch,
            )
            return logits[:, -1], new_cache["k"], new_cache["v"]

        @jax.jit
        def _prefill_text(params, ids):
            scratch = mixtral.init_kv_cache(llm, 1, max_len)
            logits, new_cache, _ = vita.forward(
                params, cfg, ids,
                attn_valid=jnp.arange(max_len)[None] < ids.shape[1],
                cache=scratch,
            )
            return logits[:, -1], new_cache["k"], new_cache["v"]

        @jax.jit
        def _install(cache, slot_k, slot_v, slot):
            k = jax.lax.dynamic_update_slice(cache["k"], slot_k, (0, slot, 0, 0, 0))
            v = jax.lax.dynamic_update_slice(cache["v"], slot_v, (0, slot, 0, 0, 0))
            return {"k": k, "v": v, "pos": cache["pos"]}

        decode_cfg = self._decode_llm_cfg

        @jax.jit
        def _step(llm_params, cache, toks, pos, active):
            # inactive slots write past the cache end (dropped) and are
            # masked out of attention
            write_pos = jnp.where(active, pos, max_len)
            c = {"k": cache["k"], "v": cache["v"], "pos": write_pos}
            valid = jnp.arange(max_len)[None, :] <= pos[:, None]
            valid &= active[:, None]
            logits, new_cache, _ = mixtral.forward(
                llm_params, decode_cfg, input_ids=toks[:, None],
                positions=pos[:, None], attn_valid=valid, cache=c,
            )
            return logits[:, -1], {"k": new_cache["k"], "v": new_cache["v"],
                                   "pos": cache["pos"]}

        self._prefill = _prefill
        self._prefill_text = _prefill_text
        self._install = _install
        self._step = _step
        self._last_tok = np.zeros(n_slots, np.int32)
        self._finished: List[Request] = []

    # -- public API -------------------------------------------------------
    def submit(self, req: Request) -> Request:
        if len(req.input_ids) + req.max_new_tokens > self.max_len:
            raise ValueError(
                f"request needs {len(req.input_ids) + req.max_new_tokens} slots, "
                f"cache holds {self.max_len}"
            )
        req.submit_time = time.time()
        self.queue.put(req)
        return req

    def stats(self) -> Dict[str, float]:
        """Aggregate serving metrics (p50 TTFT is the BASELINE.md target)."""
        done = self._finished
        out: Dict[str, float] = {
            "active": float(self.active_count()),
            "queued": float(self.queue.qsize()),
            "completed": float(len(done)),
        }
        if done:
            ttfts = sorted(r.ttft_s for r in done)
            tps = [r.decode_tokens_per_s for r in done if r.decode_tokens_per_s > 0]
            out["ttft_p50_s"] = ttfts[len(ttfts) // 2]
            out["ttft_max_s"] = ttfts[-1]
            if tps:
                out["decode_tokens_per_s_mean"] = sum(tps) / len(tps)
        return out

    def active_count(self) -> int:
        return sum(r is not None for r in self.slot_req)

    def cancel_all(self) -> None:
        """Duplex interrupt: abort every in-flight and queued request."""
        for r in self.slot_req:
            if r is not None:
                r.cancel()
        try:
            while True:
                self.queue.get_nowait().cancel()
        except queue.Empty:
            pass

    def step(self) -> int:
        """One engine tick: admit waiting requests, decode one token for
        all active slots. Returns number of active slots after the tick."""
        self._admit()
        active_idx = [i for i, r in enumerate(self.slot_req) if r is not None]
        if not active_idx:
            return 0

        active = np.zeros(self.n_slots, bool)
        active[active_idx] = True
        logits, self.cache = self._step(
            self._decode_llm, self.cache,
            jnp.asarray(self._last_tok), jnp.asarray(self.pos), jnp.asarray(active),
        )
        logits = np.asarray(logits)

        for i in active_idx:
            req = self.slot_req[i]
            self.pos[i] += 1
            tok = self._sample(logits[i], req.temperature)
            self._emit(i, req, tok)
        return self.active_count()

    def run_until_idle(self, max_ticks: int = 100000) -> None:
        for _ in range(max_ticks):
            if self.step() == 0 and self.queue.empty():
                return

    # -- internals --------------------------------------------------------
    def _sample(self, logits: np.ndarray, temperature: float) -> int:
        if temperature <= 0.0:
            return int(np.argmax(logits))
        x = logits.astype(np.float64) / temperature
        p = np.exp(x - x.max())
        p /= p.sum()
        return int(self.rng.choice(len(p), p=p))

    def _emit(self, slot: int, req: Request, tok: int) -> None:
        if not req.tokens:
            req.first_token_time = time.time()
        req.tokens.append(tok)
        self._last_tok[slot] = tok
        if req.on_token is not None:
            req.on_token(tok)
        done_reason = None
        if req.cancelled:
            done_reason = "cancelled"
        elif tok == req.eos_id:
            done_reason = "eos"
        elif len(req.tokens) >= req.max_new_tokens:
            done_reason = "length"
        elif self.pos[slot] + 1 >= self.max_len:
            done_reason = "cache_full"
        if done_reason is not None:
            self._free(slot, req, done_reason)

    def _free(self, slot: int, req: Request, reason: str) -> None:
        self.slot_req[slot] = None
        self.pos[slot] = 0
        req.finish_time = time.time()
        self._finished.append(req)
        if len(self._finished) > 1000:  # bounded history
            self._finished = self._finished[-500:]
        if req.on_finish is not None:
            req.on_finish(req.tokens, reason)

    def _admit(self) -> None:
        for slot in range(self.n_slots):
            if self.slot_req[slot] is not None:
                continue
            try:
                req = self.queue.get_nowait()
            except queue.Empty:
                return
            if req.cancelled:
                self._free(slot, req, "cancelled")
                self.slot_req[slot] = None
                continue
            self._start(slot, req)

    def _start(self, slot: int, req: Request) -> None:
        s = len(req.input_ids)
        ids = jnp.asarray(req.input_ids, jnp.int32)[None]
        if req.images is None and req.speech is None:
            logits, k, v = self._prefill_text(self.params, ids)
        else:
            im = (
                jnp.asarray(req.image_mask)[None]
                if req.image_mask is not None
                else jnp.zeros((1, s), bool)
            )
            am = (
                jnp.asarray(req.audio_mask)[None]
                if req.audio_mask is not None
                else jnp.zeros((1, s), bool)
            )
            logits, k, v = self._prefill(
                self.params, ids, im, am,
                jnp.asarray(req.images) if req.images is not None else None,
                jnp.asarray(req.speech)[None] if req.speech is not None else None,
                jnp.asarray([req.speech_length]) if req.speech is not None else None,
            )
        self.cache = self._install(self.cache, k, v, slot)
        self.slot_req[slot] = req
        # cache rows 0..s-1 hold the prompt; the next decode writes at s
        self.pos[slot] = s
        tok = self._sample(np.asarray(logits[0]), req.temperature)
        self._emit(slot, req, tok)


class EngineThread(threading.Thread):
    """Background loop driving Engine.step (the demo's engine process)."""

    def __init__(self, engine: Engine, tick_idle_s: float = 0.005):
        super().__init__(daemon=True)
        self.engine = engine
        self.tick_idle_s = tick_idle_s
        self._stop = threading.Event()

    def run(self) -> None:
        while not self._stop.is_set():
            n = self.engine.step()
            if n == 0:
                time.sleep(self.tick_idle_s)

    def stop(self) -> None:
        self._stop.set()
