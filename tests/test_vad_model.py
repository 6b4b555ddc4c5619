"""Trained VAD vs energy detector: ROC on a held-out noisy fixture set
(VERDICT round-1 item 9 done-criterion)."""

import numpy as np
import pytest

from vita_tpu.serve.vad import StreamingVAD, VADConfig, default_prob_fn, energy_vad_prob
from vita_tpu.serve.vad_model import (
    CHUNK,
    load_trained_vad,
    synth_noise,
    synth_speech,
)


def _fixtures(seed=1234, n=150):
    """Held-out set (different seed than training)."""
    rng = np.random.default_rng(seed)
    pos = [synth_speech(rng) for _ in range(n)]
    neg = [synth_noise(rng) for _ in range(n)]
    return pos, neg


def _auc(scores_pos, scores_neg):
    s = np.concatenate([scores_pos, scores_neg])
    y = np.concatenate([np.ones(len(scores_pos)), np.zeros(len(scores_neg))])
    order = np.argsort(s)
    ranks = np.empty(len(s))
    ranks[order] = np.arange(1, len(s) + 1)
    n1, n0 = len(scores_pos), len(scores_neg)
    return (ranks[y == 1].sum() - n1 * (n1 + 1) / 2) / (n1 * n0)


def test_trained_vad_beats_energy_roc():
    pos, neg = _fixtures()
    trained = load_trained_vad()
    auc_t = _auc([trained(c) for c in pos], [trained(c) for c in neg])
    auc_e = _auc([energy_vad_prob(c) for c in pos], [energy_vad_prob(c) for c in neg])
    assert auc_t > auc_e, (auc_t, auc_e)
    assert auc_t > 0.97  # silero-class separation on the fixture set


def test_trained_vad_rejects_loud_noise():
    """Loud non-speech defeats the energy detector but not the model."""
    rng = np.random.default_rng(99)
    trained = load_trained_vad()
    loud = [synth_noise(rng) for _ in range(40)]
    loud = [c / (np.max(np.abs(c)) + 1e-9) * 0.5 for c in loud]
    fp_t = sum(trained(c) >= 0.7 for c in loud)
    fp_e = sum(energy_vad_prob(c) >= 0.7 for c in loud)
    assert fp_t < fp_e
    assert fp_t <= 2  # at most occasional confusion on synthetic noise


def test_streaming_vad_with_trained_model_segments_speech():
    vad = StreamingVAD(VADConfig(min_dialog_s=0.5))  # default = trained model
    rng = np.random.default_rng(5)
    silence = [np.zeros(CHUNK, np.float32)] * 8
    speech = [synth_speech(rng) * 0 + synth_speech(np.random.default_rng(6 + i))
              for i in range(8)]
    segs = []
    for c in [*silence, *speech, *silence]:
        out = vad.process(c)
        if out is not None:
            segs.append(out)
    assert len(segs) == 1

    # loud noise stream produces NO segment
    vad2 = StreamingVAD(VADConfig(min_dialog_s=0.5))
    noise = [synth_noise(np.random.default_rng(50 + i)) for i in range(12)]
    outs = [vad2.process(c) for c in [*noise, *silence]]
    assert all(o is None for o in outs)
