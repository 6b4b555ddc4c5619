"""Data curation CLI: remove-lost / fix-json / data-stats (the remaining
reference data_tools categories — rm_lost_*_in_json.py, json fixers,
statistics_*)."""

import json
import os
import wave

import numpy as np
import pytest

from vita_tpu.data.tools import main


def test_remove_lost(tmp_path):
    img = tmp_path / "ok.png"
    from PIL import Image

    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img)
    data = [
        {"conversations": [{"from": "human", "value": "<image>\nhi"},
                           {"from": "gpt", "value": "ok"}], "image": str(img)},
        {"conversations": [{"from": "human", "value": "<image>\nhi"},
                           {"from": "gpt", "value": "ok"}],
         "image": str(tmp_path / "missing.png")},
        {"conversations": [{"from": "human", "value": "hi"},
                           {"from": "gpt", "value": "ok"}]},
    ]
    src = tmp_path / "in.json"
    src.write_text(json.dumps(data))
    out = tmp_path / "clean.json"
    assert main(["remove-lost", str(src), "--output", str(out)]) == 0
    cleaned = json.loads(out.read_text())
    assert len(cleaned) == 2  # missing-image sample dropped


def test_fix_json(tmp_path):
    data = [
        {"conversations": [{"from": "user", "value": "hi"},
                           {"from": "assistant", "value": "yo"}]},
        {"conversations": [{"from": "human", "value": "  "},
                           {"from": "human", "value": "a"},
                           {"from": "gpt", "value": "b"}]},
        {"conversations": [{"from": "gpt", "value": "starts wrong"}]},
        {"conversations": []},
    ]
    src = tmp_path / "in.json"
    src.write_text(json.dumps(data))
    out = tmp_path / "fixed.json"
    assert main(["fix-json", str(src), "--output", str(out)]) == 0
    fixed = json.loads(out.read_text())
    # 1: roles normalized; 2: empty turn stripped -> valid; 3/4 dropped
    assert len(fixed) == 2
    assert [t["from"] for t in fixed[0]["conversations"]] == ["human", "gpt"]
    assert [t["from"] for t in fixed[1]["conversations"]] == ["human", "gpt"]


def test_data_stats(tmp_path, capsys):
    wav = tmp_path / "a.wav"
    with wave.open(str(wav), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(np.zeros(8000, np.int16).tobytes())
    data = [
        {"conversations": [{"from": "human", "value": "<audio>"},
                           {"from": "gpt", "value": "ok"}], "audio": str(wav)},
        {"conversations": [{"from": "human", "value": "hi"},
                           {"from": "gpt", "value": "ok"}]},
    ]
    src = tmp_path / "in.json"
    src.write_text(json.dumps(data))
    assert main(["data-stats", str(src)]) == 0
    out = capsys.readouterr().out
    assert "2 samples" in out and "audio 1" in out and "0.5s audio" in out
