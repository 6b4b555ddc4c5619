"""Alternative vision towers vs live HF transformers models (tiny random)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vita_tpu.models import clip as clip_mod
from vita_tpu.models import siglip as siglip_mod
from vita_tpu.models.towers import build_vision_tower


def test_clip_golden_vs_hf():
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig, CLIPVisionModel

    from vita_tpu.utils.hf_import import clip_params_from_hf

    hf_cfg = CLIPVisionConfig(
        image_size=56, patch_size=14, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64, hidden_act="quick_gelu",
        layer_norm_eps=1e-5,
    )
    torch.manual_seed(0)
    m = CLIPVisionModel(hf_cfg).eval().float()

    cfg = clip_mod.CLIPConfig.tiny(n_layers=3)
    params = jax.tree.map(jnp.asarray, clip_params_from_hf(m.state_dict(), 3))

    img = np.random.RandomState(0).randn(2, 3, 56, 56).astype(np.float32)
    with torch.no_grad():
        hf_out = m(torch.tensor(img), output_hidden_states=True)
    # reference wrapper: hidden_states[-2], drop CLS (clip_encoder.py:30-40)
    want = hf_out.hidden_states[-2][:, 1:].numpy()
    got = clip_mod.forward(params, cfg, jnp.asarray(img.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_siglip_golden_vs_hf():
    torch = pytest.importorskip("torch")
    from transformers import SiglipVisionConfig, SiglipVisionModel

    from vita_tpu.utils.hf_import import siglip_params_from_hf

    hf_cfg = SiglipVisionConfig(
        image_size=56, patch_size=14, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, hidden_act="gelu_pytorch_tanh",
        layer_norm_eps=1e-6,
    )
    torch.manual_seed(1)
    m = SiglipVisionModel(hf_cfg).eval().float()

    cfg = siglip_mod.SigLIPConfig.tiny()
    params = jax.tree.map(jnp.asarray, siglip_params_from_hf(m.state_dict(), 2))

    img = np.random.RandomState(1).randn(2, 3, 56, 56).astype(np.float32)
    with torch.no_grad():
        want = m(torch.tensor(img)).last_hidden_state.numpy()
    got = siglip_mod.forward(params, cfg, jnp.asarray(img.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_s2_multiscale_shapes():
    cfg = siglip_mod.SigLIPConfig.tiny()
    params = siglip_mod.init_params(jax.random.PRNGKey(0), cfg)
    img = jnp.zeros((2, 112, 112, 3))
    out = siglip_mod.s2_multiscale_forward(
        lambda x: siglip_mod.forward(params, cfg, x),
        img, scales=(56, 112), base_size=56,
    )
    # channel-concat across 2 scales, base grid of tokens
    assert out.shape == (2, cfg.num_patches, cfg.hidden * 2)


@pytest.mark.parametrize("name,out_mult", [("internvit", 1), ("clip", 1), ("siglip", 1), ("siglip-s2", 2)])
def test_tower_factory(name, out_mult):
    t = build_vision_tower(name, tiny=True)
    params = t.init(jax.random.PRNGKey(0))
    sz = t.cfg.image_size * (2 if name == "siglip-s2" else 1)
    out = t.forward(params, jnp.zeros((1, sz, sz, 3)))
    assert out.shape[-1] == t.out_dim
    assert out.ndim == 3


def test_tower_factory_unknown():
    with pytest.raises(ValueError, match="unknown vision tower"):
        build_vision_tower("resnet50")


def test_eva_clip_tower():
    from vita_tpu.models import eva_clip as ev

    cfg = ev.EVAConfig.tiny()
    params = ev.init_params(jax.random.PRNGKey(0), cfg)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    out = ev.forward(params, cfg, img)
    assert out.shape == (2, cfg.num_patches, cfg.hidden)
    assert np.isfinite(np.asarray(out)).all()
    # CLS dropped: output has exactly grid^2 tokens
    assert out.shape[1] == cfg.grid**2


def test_eva_rope_is_position_sensitive():
    """Swapping two image patches must change their features differently
    than a pure permutation (rope injects position)."""
    from vita_tpu.models import eva_clip as ev

    cfg = ev.EVAConfig.tiny()
    cos, sin = ev.vision_rope_tables(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.num_patches, 4, cfg.head_dim))
    r = ev.apply_vision_rope(x, jnp.asarray(cos), jnp.asarray(sin))
    # norms preserved (rotation)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1),
        np.linalg.norm(np.asarray(r), axis=-1), rtol=1e-4,
    )
    # identical content at different positions gets different embeddings
    x2 = x.at[:, 1].set(x[:, 0])
    r2 = ev.apply_vision_rope(x2, jnp.asarray(cos), jnp.asarray(sin))
    assert not np.allclose(np.asarray(r2[:, 0]), np.asarray(r2[:, 1]))


def test_factory_eva():
    t = build_vision_tower("eva-clip-l", tiny=True)
    assert t.name == "eva-clip"
    params = t.init(jax.random.PRNGKey(0))
    out = t.forward(params, jnp.zeros((1, 56, 56, 3)))
    assert out.shape[-1] == t.out_dim


def test_eva_clip_golden():
    """Our EVA02 forward vs the reference's in-tree ViT (eva_vit.py,
    xattn=False math, rope+subln+naiveswiglu) — golden regenerated by
    tools/regen_goldens.py --only eva. Also pins our rope tables to the
    reference's registered freq buffers."""
    import pathlib

    from vita_tpu.models import eva_clip as ev
    from vita_tpu.utils.hf_import import eva_params_from_reference

    z = np.load(pathlib.Path(__file__).parent / "goldens" / "eva_tiny.npz")
    state = {k[3:]: z[k] for k in z.files if k.startswith("sd_")}
    # golden model has torch depth 2, but the reference forward SKIPS the
    # last block (eva_vit.py:791-792) -> effective depth 1
    cfg = ev.EVAConfig.tiny(n_layers=1)
    params = jax.tree.map(jnp.asarray,
                          eva_params_from_reference(state, cfg.n_layers))
    # rope parity: the reference registers its angle tables as buffers
    cos, sin = ev.vision_rope_tables(cfg)
    np.testing.assert_allclose(cos, state["rope.freqs_cos"], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(sin, state["rope.freqs_sin"], rtol=1e-6, atol=1e-6)

    out = ev.forward(params, cfg, jnp.asarray(z["image"].transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), z["expected"],
                               rtol=1e-4, atol=1e-5)
