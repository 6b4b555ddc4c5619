"""Optional whale components: shapes, causality, scan-vs-loop SSM parity."""

import jax
import jax.numpy as jnp
import numpy as np

from vita_tpu.models.whale_extras import (
    conv1d_layer,
    dtc_block,
    fsmn_layer,
    init_conv1d_layer,
    init_dtc,
    init_fsmn,
    init_soft_attention,
    init_ssm,
    soft_attention,
    ssm_scan,
)


def test_fsmn_shapes_and_memory_taps():
    p = init_fsmn(jax.random.PRNGKey(0), 16, 24, 32, left=2, right=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 16))
    out, mem = fsmn_layer(p, x)
    assert out.shape == (2, 10, 24)
    assert mem.shape == (2, 10, 32)
    # left taps: output at t depends on x[t-2..t]; changing x at t+1 must
    # not change mem at positions < t+1 - right(=1)
    x2 = x.at[:, 7].add(10.0)
    _, mem2 = fsmn_layer(p, x2)
    np.testing.assert_allclose(np.asarray(mem[:, :6]), np.asarray(mem2[:, :6]), rtol=1e-5)
    assert not np.allclose(np.asarray(mem[:, 7]), np.asarray(mem2[:, 7]))


def test_conv1d_layer_causal():
    p = init_conv1d_layer(jax.random.PRNGKey(0), 8, 8, kernel=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 8))
    out = conv1d_layer(p, x, causal=True)
    assert out.shape == (1, 12, 8)
    x2 = x.at[:, 6].add(5.0)
    out2 = conv1d_layer(p, x2, causal=True)
    np.testing.assert_allclose(np.asarray(out[:, :6]), np.asarray(out2[:, :6]), rtol=1e-5)


def test_dtc_block_residual_and_stride():
    p = init_dtc(jax.random.PRNGKey(0), 8, kernel=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 8))
    out = dtc_block(p, x, stride=1)
    assert out.shape == (1, 12, 8)
    out2 = dtc_block(p, x, stride=2)
    assert out2.shape == (1, 6, 8)


def test_soft_attention_pools():
    p = init_soft_attention(jax.random.PRNGKey(0), 8, 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 8))
    out = soft_attention(p, x)
    assert out.shape == (2, 8)


def test_ssm_scan_matches_sequential_loop():
    """associative_scan recurrence == explicit sequential recurrence."""
    p = init_ssm(jax.random.PRNGKey(0), dim=6, state_dim=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 9, 6))
    y_scan = ssm_scan(p, x)

    a = -jnp.exp(p["a_log"])
    dt = jax.nn.softplus((x @ p["w_dt"]) @ p["w_dt_proj"] + p["dt_bias"])
    bmat = x @ p["w_b"]
    cmat = x @ p["w_c"]
    decay = jnp.exp(dt[..., None] * a)
    drive = (dt * x)[..., None] * bmat[:, :, None, :]
    h = jnp.zeros((1, 6, 4))
    ys = []
    for t in range(9):
        h = decay[:, t] * h + drive[:, t]
        ys.append(jnp.einsum("bdn,bn->bd", h, cmat[:, t]) + x[:, t] * p["d"])
    y_loop = jnp.stack(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_loop), rtol=1e-4, atol=1e-5)


def test_ssm_causal():
    p = init_ssm(jax.random.PRNGKey(0), dim=6, state_dim=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 9, 6))
    y1 = ssm_scan(p, x)
    y2 = ssm_scan(p, x.at[:, 5].add(3.0))
    np.testing.assert_allclose(np.asarray(y1[:, :5]), np.asarray(y2[:, :5]), rtol=1e-4, atol=1e-5)
    assert not np.allclose(np.asarray(y1[:, 5:]), np.asarray(y2[:, 5:]))
