"""Multimodal tokenization parity + expansion-layer unit tests.

Goldens in tests/goldens/tokenization.json were produced by the reference's
tokenizer_image_token / tokenizer_image_audio_token
(vita/util/mm_utils.py:45-109) with a deterministic fake text tokenizer.
"""

import json
import pathlib

import numpy as np
import pytest

from vita_tpu.constants import AUDIO_TOKEN_INDEX, IMAGE_TOKEN_INDEX
from vita_tpu.tokenization import (
    audio_token_count,
    expand_media_sentinels,
    image_token_count,
    media_masks,
    pad_to_bucket,
    tokenize_multimodal,
)

BOS = 1


def fake_encode(s):
    # Same deterministic fake tokenizer used to generate the goldens:
    # BOS + one id per whitespace-separated chunk.
    ids = [BOS]
    for tok in s.split(" "):
        if tok:
            ids.append(100 + (sum(map(ord, tok)) % 997))
    return ids


GOLDENS = json.loads(
    (pathlib.Path(__file__).parent / "goldens" / "tokenization.json").read_text()
)


@pytest.mark.parametrize("case", GOLDENS, ids=[repr(c["prompt"])[:40] for c in GOLDENS])
def test_golden_tokenization(case):
    assert tokenize_multimodal(case["prompt"], fake_encode, bos_id=BOS) == case["ids"]


def test_audio_token_count_matches_reference_formula():
    # 400-frame fbank clip -> 50 LLM tokens
    # (web_demo/vllm_tools/vllm_file/mixtral.py:272-277).
    assert audio_token_count(400) == 50
    assert audio_token_count(100) == 12
    # monotone non-decreasing
    counts = [audio_token_count(t) for t in range(8, 2000)]
    assert all(b >= a for a, b in zip(counts, counts[1:]))


def test_image_token_count():
    assert image_token_count(1) == 256
    assert image_token_count(13) == 13 * 256  # 12 tiles + thumbnail


def test_expand_media_sentinels():
    ids = [1, 5, IMAGE_TOKEN_INDEX, 7, AUDIO_TOKEN_INDEX, 9]
    out = expand_media_sentinels(ids, image_slot_counts=[3], audio_slot_counts=[2])
    assert out == [1, 5] + [IMAGE_TOKEN_INDEX] * 3 + [7] + [AUDIO_TOKEN_INDEX] * 2 + [9]


def test_expand_count_mismatch_raises():
    with pytest.raises(ValueError):
        expand_media_sentinels([IMAGE_TOKEN_INDEX], image_slot_counts=[])
    with pytest.raises(ValueError):
        expand_media_sentinels([5], image_slot_counts=[3])


def test_media_masks():
    ids = np.array([1, IMAGE_TOKEN_INDEX, IMAGE_TOKEN_INDEX, 4, AUDIO_TOKEN_INDEX])
    safe, img, aud = media_masks(ids)
    assert safe.tolist() == [1, 0, 0, 4, 0]
    assert img.tolist() == [False, True, True, False, False]
    assert aud.tolist() == [False, False, False, False, True]


def test_pad_to_bucket():
    padded, n = pad_to_bucket([1, 2, 3], buckets=[4, 8], pad_id=0)
    assert padded == [1, 2, 3, 0] and n == 3
    padded, _ = pad_to_bucket([1] * 5, buckets=[4, 8], pad_id=0, side="left")
    assert padded == [0, 0, 0, 1, 1, 1, 1, 1]
    with pytest.raises(ValueError):
        pad_to_bucket([1] * 9, buckets=[4, 8], pad_id=0)
