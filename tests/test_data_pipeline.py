"""Data pipeline: preprocess goldens, dataset loading, collation, sampler."""

import json
import pathlib
import random

import numpy as np
import pytest

from vita_tpu.constants import (
    AUDIO_TOKEN_INDEX,
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
    IMAGE_TOKENS_PER_PATCH,
)
from vita_tpu.data.dataset import (
    Collator,
    ConversationDataset,
    DataArgs,
    DatasetSpec,
    expand_sample,
    modality_grouped_indices,
)
from vita_tpu.data.preprocess import build_training_sample, normalize_media_tokens

GOLDEN = json.loads(
    (pathlib.Path(__file__).parent / "goldens" / "preprocess.json").read_text()
)

BOS, EOS, PAD = 1, 2, 0


def sp_encode(s):
    # The deterministic SP-like tokenizer used to generate the goldens.
    return [BOS] + [
        777 if t == "</s>" else 100 + (sum(map(ord, t)) % 3000)
        for t in s.replace("</s>", " </s> ").split()
    ]


@pytest.mark.parametrize("case", GOLDEN, ids=[c["modality"] + str(i) for i, c in enumerate(GOLDEN)])
def test_preprocess_golden(case):
    """ids + labels byte-match the reference's preprocess_multimodal +
    preprocess_mixtral_two output."""
    mm = case["mmargs"]
    if mm is not None:
        norm = normalize_media_tokens(
            case["turns"], mm["image_token_num"], mm["patch_num"], mm["inserted_id"]
        )
    else:
        norm = normalize_media_tokens(case["turns"])
    assert [t["value"] for t in norm] == case["norm_values"]
    ids, labels = build_training_sample(
        norm, sp_encode, case["modality"],
        has_media=case["has_image"] or case["has_audio"],
        bos_id=BOS, eos_id=EOS, pad_id=PAD,
    )
    assert ids.tolist() == case["input_ids"]
    assert labels.tolist() == case["labels"]


def test_state_token_rules():
    turns = [
        {"from": "human", "value": "<audio>"},
        {"from": "gpt", "value": "a"},
        {"from": "human", "value": "text q"},
        {"from": "gpt", "value": "b"},
    ]
    norm = normalize_media_tokens(turns)
    assert norm[1]["value"].startswith("<1>")  # after audio query
    assert norm[3]["value"].startswith("<3>")  # after text query
    norm = normalize_media_tokens(turns, inserted_id=1)
    assert norm[1]["value"].startswith("<2>")  # injected negative


def test_trailing_image_moves_front():
    turns = [{"from": "human", "value": "what is this\n<image>"}, {"from": "gpt", "value": "x"}]
    norm = normalize_media_tokens(turns, patch_nums=[2])
    assert norm[0]["value"].startswith("<image><image>\n")


def test_video_frame_clamp():
    turns = [{"from": "human", "value": "<image>" * 30 + "\nq"}, {"from": "gpt", "value": "x"}]
    norm = normalize_media_tokens(turns, patch_nums=[1] * 30)
    assert norm[0]["value"].count("<image>") == 16  # MAX_IMAGE_LENGTH


def test_expand_sample():
    ids = np.array([1, IMAGE_TOKEN_INDEX, 5, AUDIO_TOKEN_INDEX, 6])
    labels = np.array([IGNORE_INDEX, IGNORE_INDEX, 5, IGNORE_INDEX, 6])
    e_ids, e_lab = expand_sample(ids, labels, image_slots=3, audio_slots=2)
    assert e_ids.tolist() == [1] + [IMAGE_TOKEN_INDEX] * 3 + [5] + [AUDIO_TOKEN_INDEX] * 2 + [6]
    assert e_lab.tolist() == [IGNORE_INDEX] * 4 + [5] + [IGNORE_INDEX] * 2 + [6]


@pytest.fixture()
def tmp_dataset(tmp_path):
    from PIL import Image

    img_path = tmp_path / "img.png"
    Image.fromarray(np.zeros((100, 200, 3), np.uint8)).save(img_path)
    data = [
        {
            "conversations": [
                {"from": "human", "value": "<image>\nwhat"},
                {"from": "gpt", "value": "thing"},
            ],
            "image": str(img_path),
        },
        {
            "conversations": [
                {"from": "human", "value": "hello"},
                {"from": "gpt", "value": "world"},
            ]
        },
    ]
    chat = tmp_path / "chat.json"
    chat.write_text(json.dumps(data))
    return chat


def test_dataset_and_collator(tmp_dataset):
    ds = ConversationDataset(
        [DatasetSpec(str(tmp_dataset))], sp_encode, BOS, EOS, pad_id=PAD,
        args=DataArgs(image_size=56, max_patches=2, use_thumbnail=False),
    )
    assert len(ds) == 2
    samples = [ds[i] for i in range(2)]
    mm = next(s for s in samples if s["modality"] == "image")
    lang = next(s for s in samples if s["modality"] == "lang")
    # image sample has 256 slots per tile
    n_img_slots = int((mm["input_ids"] == IMAGE_TOKEN_INDEX).sum())
    assert n_img_slots == mm["images"].shape[0] * IMAGE_TOKENS_PER_PATCH
    # lang sample carries dummy media but no sentinel slots
    assert int((lang["input_ids"] == IMAGE_TOKEN_INDEX).sum()) == 0
    assert lang["images"].shape[0] == 1

    batch = Collator(pad_id=PAD, buckets=(1024,))(samples)
    assert batch["input_ids"].shape == (2, 1024)
    assert batch["input_ids"].min() >= 0  # sentinels stripped
    assert batch["image_mask"].sum() == n_img_slots
    assert batch["images"].shape[0] == 2 * max(s["images"].shape[0] for s in samples)
    assert batch["labels"].shape == (2, 1024)
    assert (batch["labels"][~batch["attn_valid"]] == IGNORE_INDEX).all()


def test_modality_grouped_indices():
    lengths = [10, -5, 20, -8, 30, 15, -3, -9, 12, 25]
    idx = modality_grouped_indices(lengths, batch_size=2, rng=random.Random(0))
    assert sorted(idx) == list(range(10))
    # full batches are modality-pure
    for i in range(0, 8, 2):
        pair = idx[i : i + 2]
        signs = {lengths[j] > 0 for j in pair}
        if len(pair) == 2 and i + 2 <= len(idx) - (len(idx) % 2):
            assert len(signs) == 1, (pair, [lengths[j] for j in pair])


def test_dataset_survives_broken_media(tmp_path, capsys):
    data = [{
        "conversations": [
            {"from": "human", "value": "<image>\nq"},
            {"from": "gpt", "value": "a"},
        ],
        "image": str(tmp_path / "missing.png"),
        "audio": str(tmp_path / "missing.wav"),
    }]
    chat = tmp_path / "c.json"
    chat.write_text(json.dumps(data))
    ds = ConversationDataset(
        [DatasetSpec(str(chat))], sp_encode, BOS, EOS, pad_id=PAD,
        args=DataArgs(image_size=56, max_patches=1, use_thumbnail=False),
    )
    sample = ds[0]  # must not raise
    assert sample["images"].shape[0] == 1
    assert "WARNING" in capsys.readouterr().out


def test_prefetch_loader(tmp_path):
    import random

    from vita_tpu.data.dataset import Collator
    from vita_tpu.data.loader import PrefetchLoader

    data = [{"conversations": [{"from": "human", "value": f"q {i}"},
                               {"from": "gpt", "value": f"a {i}"}]} for i in range(7)]
    chat = tmp_path / "c.json"
    chat.write_text(json.dumps(data))
    ds = ConversationDataset([DatasetSpec(str(chat))], sp_encode, BOS, EOS, pad_id=PAD,
                             args=DataArgs(image_size=56))
    loader = PrefetchLoader(ds, order=list(range(7)), batch_size=2,
                            collate=Collator(pad_id=PAD, buckets=(512,)),
                            num_workers=2, prefetch=2)
    batches = list(loader)
    assert len(loader) == 3 and len(batches) == 3
    assert all(b["input_ids"].shape == (2, 512) for b in batches)


def _write_wav(path, n_samples=16000):
    import struct
    import wave

    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        t = np.arange(n_samples)
        sig = (3000 * np.sin(2 * np.pi * 200 * t / 16000)).astype(np.int16)
        w.writeframes(struct.pack(f"<{n_samples}h", *sig))


def test_lang_samples_have_no_state_tokens(tmp_path):
    """Pure-language samples bypass media normalization (reference lang
    branch, neg_frameCat.py:1089-1093): no <1>/<2>/<3> prefix on the
    assistant turn."""
    data = [{"conversations": [
        {"from": "human", "value": "hello"},
        {"from": "gpt", "value": "world"},
    ]}]
    chat = tmp_path / "chat.json"
    chat.write_text(json.dumps(data))
    ds = ConversationDataset([DatasetSpec(str(chat))], sp_encode, BOS, EOS,
                             pad_id=PAD, args=DataArgs(image_size=56))
    # ids must equal the raw (un-normalized) build — byte parity with the
    # reference's lang branch — and differ from the state-token version
    plain, _ = build_training_sample(
        data[0]["conversations"], sp_encode, "lang", has_media=False,
        bos_id=BOS, eos_id=EOS, pad_id=PAD)
    assert ds[0]["input_ids"].tolist() == plain.tolist()
    normed = normalize_media_tokens(data[0]["conversations"])
    with_state, _ = build_training_sample(
        normed, sp_encode, "lang", has_media=False,
        bos_id=BOS, eos_id=EOS, pad_id=PAD)
    assert ds[0]["input_ids"].tolist() != with_state.tolist()


def test_multi_image_sample_loads_all(tmp_path):
    from PIL import Image

    p1, p2 = tmp_path / "a.png", tmp_path / "b.png"
    Image.fromarray(np.zeros((60, 60, 3), np.uint8)).save(p1)
    Image.fromarray(np.full((60, 120, 3), 128, np.uint8)).save(p2)
    data = [{"conversations": [
        {"from": "human", "value": "<image>\nfirst"},
        {"from": "gpt", "value": "one"},
        {"from": "human", "value": "<image>\nsecond"},
        {"from": "gpt", "value": "two"},
    ], "image": [str(p1), str(p2)]}]
    chat = tmp_path / "chat.json"
    chat.write_text(json.dumps(data))
    ds = ConversationDataset([DatasetSpec(str(chat))], sp_encode, BOS, EOS,
                             pad_id=PAD,
                             args=DataArgs(image_size=56, max_patches=2,
                                           use_thumbnail=False))
    s = ds[0]
    n_tiles = s["images"].shape[0]
    assert n_tiles >= 2  # both images produced tiles
    n_slots = int((s["input_ids"] == IMAGE_TOKEN_INDEX).sum())
    assert n_slots == n_tiles * IMAGE_TOKENS_PER_PATCH


def test_multi_audio_sample_end_to_end(tmp_path):
    """Two audio clips: each <audio> sentinel expands to ITS clip's token
    count, the collator builds the global clip stack + audio_select, and a
    train step runs on the batch."""
    import jax

    from vita_tpu.models import vita as vita_mod
    from vita_tpu.tokenization import audio_token_count
    from vita_tpu.train.step import TrainConfig, make_optimizer, make_train_step

    w1, w2 = tmp_path / "a.wav", tmp_path / "b.wav"
    _write_wav(w1, 16000)   # 1 s
    _write_wav(w2, 32000)   # 2 s
    data = [{"conversations": [
        {"from": "human", "value": "<audio>"},
        {"from": "gpt", "value": "one"},
        {"from": "human", "value": "<audio>"},
        {"from": "gpt", "value": "two"},
    ], "audio": [str(w1), str(w2)]}]
    chat = tmp_path / "chat.json"
    chat.write_text(json.dumps(data))
    ds = ConversationDataset([DatasetSpec(str(chat))], sp_encode, BOS, EOS,
                             pad_id=PAD, args=DataArgs(image_size=56))
    s = ds[0]
    assert "audio_clips" in s and len(s["audio_clips"]) == 2
    c1 = audio_token_count(len(s["audio_clips"][0]))
    c2 = audio_token_count(len(s["audio_clips"][1]))
    assert c1 != c2  # different lengths -> different counts
    assert int((s["input_ids"] == AUDIO_TOKEN_INDEX).sum()) == c1 + c2

    batch = Collator(pad_id=PAD, buckets=(512,))([s])
    assert batch["speech"].shape[0] == 2  # global clip stack
    assert "audio_select_clip" in batch
    # the second sentinel's slots address clip 1
    sel = batch["audio_select_clip"][0][batch["audio_mask"][0]]
    assert set(sel.tolist()) == {0, 1}

    cfg = vita_mod.VITAConfig.tiny()
    params = vita_mod.init_params(jax.random.PRNGKey(0), cfg)
    tc = TrainConfig()
    opt = make_optimizer(tc, params)
    step = make_train_step(cfg, tc, opt)
    import jax.numpy as jnp

    # sp_encode ids exceed the tiny vocab; fold them in (mechanics test)
    v = cfg.llm.vocab_size
    batch["input_ids"] = batch["input_ids"] % v
    batch["labels"] = np.where(batch["labels"] >= 0, batch["labels"] % v,
                               batch["labels"])
    jbatch = {k: jnp.asarray(v_) for k, v_ in batch.items()
              if k != "tiles_per_sample"}
    _, _, metrics = step(params, opt.init(params), jbatch)
    assert np.isfinite(float(metrics["loss"]))


def test_end_tag_false_strips_trailing_sep(tmp_path):
    data = [
        {"conversations": [
            {"from": "human", "value": "q"}, {"from": "gpt", "value": "a"}],
         "end_tag": False},
        {"conversations": [
            {"from": "human", "value": "q"}, {"from": "gpt", "value": "a"}]},
    ]
    chat = tmp_path / "chat.json"
    chat.write_text(json.dumps(data))
    ds = ConversationDataset([DatasetSpec(str(chat))], sp_encode, BOS, EOS,
                             pad_id=PAD, args=DataArgs(image_size=56))
    no_tag = ds[0]["input_ids"] if "end_tag" in ds.samples[0] else ds[1]["input_ids"]
    with_tag = ds[1]["input_ids"] if "end_tag" in ds.samples[0] else ds[0]["input_ids"]
    assert len(no_tag) == len(with_tag) - 1


def test_media_keyed_sample_without_token_degrades(tmp_path, capsys):
    from PIL import Image

    p = tmp_path / "x.png"
    Image.fromarray(np.zeros((50, 50, 3), np.uint8)).save(p)
    data = [{"conversations": [
        {"from": "human", "value": "no token here"},
        {"from": "gpt", "value": "ok"},
    ], "image": str(p)}]
    chat = tmp_path / "chat.json"
    chat.write_text(json.dumps(data))
    ds = ConversationDataset([DatasetSpec(str(chat))], sp_encode, BOS, EOS,
                             pad_id=PAD, args=DataArgs(image_size=56))
    s = ds[0]  # must not raise
    assert s["modality"] == "lang"
    assert "no media token" in capsys.readouterr().out
