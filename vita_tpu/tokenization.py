"""Multimodal tokenization: media sentinels, and their static expansion.

Two layers:

1. ``tokenize_multimodal`` — user-facing parity API. Splits a prompt string
   on ``<image>`` / ``<audio>`` and splices sentinel ids (-200 / -500) into
   the token stream. Output ids are identical to the reference's
   ``tokenizer_image_token`` / ``tokenizer_image_audio_token``
   (reference: vita/util/mm_utils.py:45-109).

2. ``expand_media_sentinels`` — the TPU-first step. Each sentinel is
   expanded *on the host, before anything is traced* into the exact number
   of feature slots its media item will produce (256 per image patch;
   ``audio_token_count(frames)`` per audio clip). After expansion the
   sequence has a static length and the on-device fusion is a pure gather —
   no data-dependent Python splice loop (the reference's per-sample loop at
   vita/model/vita_arch.py:237-321 is replaced by this design, which the
   reference's own vLLM patch also uses:
   web_demo/vllm_tools/vllm_file/mixtral.py:194-294).
"""

from __future__ import annotations

import re
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from vita_tpu.constants import (
    AUDIO_TOKEN_INDEX,
    IMAGE_TOKEN_INDEX,
    IMAGE_TOKENS_PER_PATCH,
)

EncodeFn = Callable[[str], List[int]]

_MEDIA_SPLIT = re.compile(r"(<audio>|<image>)")


def tokenize_multimodal(
    prompt: str,
    encode: EncodeFn,
    bos_id: Optional[int] = None,
    image_token_index: int = IMAGE_TOKEN_INDEX,
    audio_token_index: int = AUDIO_TOKEN_INDEX,
) -> List[int]:
    """Tokenize a prompt, splicing one sentinel id per media placeholder.

    ``encode`` is the plain text tokenizer (HF ``tokenizer(s).input_ids``
    semantics: it may prepend BOS to every chunk). If ``bos_id`` is given
    and the first chunk starts with it, a single BOS is kept at position 0
    and the per-chunk BOS duplicates are stripped — matching the
    reference's offset logic (vita/util/mm_utils.py:55-70,91-103).
    """
    chunks: List[List[int]] = []
    sentinel = {"<image>": image_token_index, "<audio>": audio_token_index}
    for piece in _MEDIA_SPLIT.split(prompt):
        if piece in sentinel:
            chunks.append([sentinel[piece]])
        else:
            chunks.append(encode(piece))

    ids: List[int] = []
    offset = 0
    if bos_id is not None and chunks and chunks[0] and chunks[0][0] == bos_id:
        offset = 1
        ids.append(bos_id)
    for c in chunks:
        if c == [image_token_index] or c == [audio_token_index]:
            ids.extend(c)
        else:
            ids.extend(c[offset:])
    return ids


def audio_token_count(num_frames: int) -> int:
    """LLM tokens produced by a fbank clip of ``num_frames`` 10 ms frames.

    Conv2dSubsampling4 (two k=3 s=2 convs) then the CNN adapter's s=2 conv:
    exact arithmetic from the reference's serving-path feature sizing
    (web_demo/vllm_tools/vllm_file/mixtral.py:272-277).
    """
    downsampled = ((num_frames - 1) // 2 - 1) // 2
    return (downsampled - 1) // 2 + 1


def image_token_count(num_patches: int) -> int:
    """LLM tokens for an image tiled into ``num_patches`` 448x448 patches."""
    return num_patches * IMAGE_TOKENS_PER_PATCH


def expand_media_sentinels(
    ids: Sequence[int],
    image_slot_counts: Sequence[int] = (),
    audio_slot_counts: Sequence[int] = (),
    image_token_index: int = IMAGE_TOKEN_INDEX,
    audio_token_index: int = AUDIO_TOKEN_INDEX,
) -> List[int]:
    """Expand each media sentinel into N copies of itself.

    ``image_slot_counts[k]`` is the feature count of the k-th image sentinel
    in ``ids`` (and likewise for audio). After this, the number of sentinel
    positions equals the number of feature vectors exactly, so the on-device
    merge is shape-static.
    """
    out: List[int] = []
    img_i = aud_i = 0
    for t in ids:
        if t == image_token_index:
            if img_i >= len(image_slot_counts):
                raise ValueError("more <image> sentinels than image_slot_counts entries")
            out.extend([image_token_index] * image_slot_counts[img_i])
            img_i += 1
        elif t == audio_token_index:
            if aud_i >= len(audio_slot_counts):
                raise ValueError("more <audio> sentinels than audio_slot_counts entries")
            out.extend([audio_token_index] * audio_slot_counts[aud_i])
            aud_i += 1
        else:
            out.append(int(t))
    if img_i != len(image_slot_counts):
        raise ValueError(f"{len(image_slot_counts) - img_i} unused image_slot_counts entries")
    if aud_i != len(audio_slot_counts):
        raise ValueError(f"{len(audio_slot_counts) - aud_i} unused audio_slot_counts entries")
    return out


def media_masks(
    expanded_ids: np.ndarray,
    image_token_index: int = IMAGE_TOKEN_INDEX,
    audio_token_index: int = AUDIO_TOKEN_INDEX,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(input_ids_safe, image_mask, audio_mask) for an expanded sequence.

    ``input_ids_safe`` has sentinels replaced by 0 so it can index the
    embedding table; the masks mark where image / audio features are merged.
    """
    expanded_ids = np.asarray(expanded_ids)
    image_mask = expanded_ids == image_token_index
    audio_mask = expanded_ids == audio_token_index
    safe = np.where(image_mask | audio_mask, 0, expanded_ids)
    return safe, image_mask, audio_mask


def pad_to_bucket(
    ids: Sequence[int],
    buckets: Sequence[int],
    pad_id: int,
    side: str = "right",
) -> Tuple[List[int], int]:
    """Pad ``ids`` to the smallest bucket length >= len(ids).

    Bucketing keeps the XLA compile cache small under variable prompt
    lengths (SURVEY.md §7 design delta 2). Returns (padded_ids, true_len).
    Raises if ids exceed the largest bucket.
    """
    n = len(ids)
    for b in sorted(buckets):
        if n <= b:
            pad = [pad_id] * (b - n)
            padded = (list(ids) + pad) if side == "right" else (pad + list(ids))
            return padded, n
    raise ValueError(f"sequence length {n} exceeds largest bucket {max(buckets)}")


def audio_select_arrays(
    audio_mask: np.ndarray,  # [S] bool — expanded audio slot positions
    audio_slot_counts: Sequence[int],  # LLM tokens per clip, in clip order
) -> Tuple[np.ndarray, np.ndarray]:
    """(clip_idx [S], row_idx [S]) addressing per-clip audio features.

    With several audio clips in one prompt (multi-turn audio history) each
    clip's valid feature rows are a prefix of its padded block, so the
    merge must know which clip and row every audio slot reads —
    a flat cumsum over concatenated padded features would straddle padding
    (see models/vita.py::merge_embeddings audio_select)."""
    s = len(audio_mask)
    clip = np.zeros(s, np.int32)
    row = np.zeros(s, np.int32)
    positions = np.flatnonzero(audio_mask)
    if positions.size != sum(audio_slot_counts):
        raise ValueError(
            f"audio mask has {positions.size} slots but clips provide "
            f"{sum(audio_slot_counts)}"
        )
    k = 0
    for c, n in enumerate(audio_slot_counts):
        for r in range(n):
            clip[positions[k]] = c
            row[positions[k]] = r
            k += 1
    return clip, row
