"""Optional Whale encoder components (constructible but unused in the
shipped VITA config) — inventory parity with the reference's extras:

  - FSMN memory layer (whale/module/layer/fsmn.py:6-129)
  - causal/centered Conv1d layer (layer/conv1d.py:6-88)
  - depthwise-temporal DTC block (layer/dtcblock.py:10-95)
  - SoftAttention pooling (layer/attention.py:533-571)
  - selective SSM (Mamba-style) block — the reference wraps the CUDA
    mamba_ssm package (component/mamba.py:83-131); here the S6 recurrence
    h_t = exp(dt_t * A) h_{t-1} + dt_t * B_t x_t, y_t = C_t h_t + D x_t
    runs as a jax.lax.associative_scan (parallel prefix over time — the
    TPU-native formulation).

Functional style matching the rest of the framework: init_* + pure apply.
BatchNorm layers are folded to inference-mode scale/shift (gamma/beta over
running stats), which is how the reference uses them at eval.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# -- FSMN --------------------------------------------------------------
def init_fsmn(rng, input_dim, out_dim, hidden_dim, left=1, right=1, dtype=jnp.float32):
    k = jax.random.split(rng, 4)
    s = lambda d: d**-0.5
    return {
        "w_in": jax.random.normal(k[0], (input_dim, hidden_dim), dtype) * s(input_dim),
        "b_in": jnp.zeros((hidden_dim,), dtype),
        # depthwise memory taps: left includes the current frame (k=left+1)
        "mem_left": jax.random.normal(k[1], (left + 1, hidden_dim), dtype) * s(left + 1),
        "mem_right": jax.random.normal(k[2], (right, hidden_dim), dtype) * s(max(right, 1)),
        "w_out": jax.random.normal(k[3], (hidden_dim, out_dim), dtype) * s(hidden_dim),
        "b_out": jnp.zeros((out_dim,), dtype),
    }


def fsmn_layer(
    params: Params, x: jnp.ndarray, hidden: Optional[jnp.ndarray] = None,
    left_dilation: int = 1, right_dilation: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x [B, T, D] -> (relu(out) [B, T, out_dim], memory state p_out)."""
    p_in = x @ params["w_in"] + params["b_in"]  # [B, T, H]
    lk = params["mem_left"].shape[0]
    rk = params["mem_right"].shape[0]

    p_left = jnp.zeros_like(p_in)
    for i in range(lk):  # tap i looks back (lk-1-i)*dilation frames
        shift = (lk - 1 - i) * left_dilation
        shifted = jnp.pad(p_in, ((0, 0), (shift, 0), (0, 0)))[:, : p_in.shape[1]]
        p_left = p_left + shifted * params["mem_left"][i]

    p_right = jnp.zeros_like(p_in)
    for i in range(rk):  # tap i looks forward (i+1)*dilation frames
        shift = (i + 1) * right_dilation
        shifted = jnp.pad(p_in, ((0, 0), (0, shift), (0, 0)))[:, shift:]
        p_right = p_right + shifted * params["mem_right"][i]

    p_out = p_in + p_left + p_right
    if hidden is not None:
        p_out = p_out + hidden
    return jax.nn.relu(p_out @ params["w_out"] + params["b_out"]), p_out


# -- Conv1d layer -------------------------------------------------------
def init_conv1d_layer(rng, input_dim, output_dim, kernel, dtype=jnp.float32):
    k1, k2 = jax.random.split(rng)
    return {
        "w": jax.random.normal(k1, (kernel, input_dim, output_dim), dtype)
        * (kernel * input_dim) ** -0.5,
        "b": jnp.zeros((output_dim,), dtype),
        "bn_scale": jnp.ones((output_dim,), dtype),
        "bn_shift": jnp.zeros((output_dim,), dtype),
    }


def conv1d_layer(
    params: Params, x: jnp.ndarray, stride: int = 1, causal: bool = True,
    dilation: int = 1, residual: bool = True,
) -> jnp.ndarray:
    """[B, T, D] -> [B, T', out]; causal left-pad or centered pad."""
    kernel = params["w"].shape[0]
    lorder = (kernel - 1) * dilation
    if not causal and lorder % 2:
        # centered padding needs an odd kernel span; the reference asserts
        # (kernel_size-1)%2==0 (conv1d.py:29) — an even kernel would
        # silently shorten the output by one off-center frame
        raise ValueError(
            f"non-causal conv needs an odd effective kernel; got kernel="
            f"{kernel}, dilation={dilation}"
        )
    pad = (lorder, 0) if causal else (lorder // 2, lorder // 2)
    h = jnp.pad(x, ((0, 0), pad, (0, 0)))
    h = jax.lax.conv_general_dilated(
        h, params["w"], (stride,), "VALID", rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + params["b"]
    h = h * params["bn_scale"] + params["bn_shift"]
    if stride == 1 and residual and x.shape[-1] == h.shape[-1]:
        h = h + x
    return jax.nn.relu(h)


# -- DTC block ----------------------------------------------------------
def init_dtc(rng, dim, kernel, dtype=jnp.float32):
    k = jax.random.split(rng, 3)
    return {
        "depth_w": jax.random.normal(k[0], (kernel, dim), dtype) * kernel**-0.5,
        "depth_b": jnp.zeros((dim,), dtype),
        "pw1_w": jax.random.normal(k[1], (dim, dim), dtype) * dim**-0.5,
        "pw1_b": jnp.zeros((dim,), dtype),
        "pw2_w": jax.random.normal(k[2], (dim, dim), dtype) * dim**-0.5,
        "pw2_b": jnp.zeros((dim,), dtype),
        "bn1_scale": jnp.ones((dim,), dtype), "bn1_shift": jnp.zeros((dim,), dtype),
        "bn2_scale": jnp.ones((dim,), dtype), "bn2_shift": jnp.zeros((dim,), dtype),
        "bn3_scale": jnp.ones((dim,), dtype), "bn3_shift": jnp.zeros((dim,), dtype),
    }


def dtc_block(
    params: Params, x: jnp.ndarray, stride: int = 1, causal: bool = True,
    dilation: int = 1,
) -> jnp.ndarray:
    """Depthwise temporal conv -> BN -> pointwise -> BN -> relu ->
    pointwise -> BN (+residual when stride 1) -> relu."""
    kernel = params["depth_w"].shape[0]
    lorder = (kernel - 1) * dilation
    if not causal and lorder % 2:
        # centered padding needs an odd kernel span; the reference asserts
        # (kernel_size-1)%2==0 (conv1d.py:29) — an even kernel would
        # silently shorten the output by one off-center frame
        raise ValueError(
            f"non-causal conv needs an odd effective kernel; got kernel="
            f"{kernel}, dilation={dilation}"
        )
    pad = (lorder, 0) if causal else (lorder // 2, lorder // 2)
    h = jnp.pad(x, ((0, 0), pad, (0, 0)))
    # depthwise conv via feature_group_count
    dim = x.shape[-1]
    w = params["depth_w"][:, None, :]  # [K, 1, D] with groups=D
    h = jax.lax.conv_general_dilated(
        h, w, (stride,), "VALID", rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=dim,
    ) + params["depth_b"]
    h = h * params["bn1_scale"] + params["bn1_shift"]
    h = h @ params["pw1_w"] + params["pw1_b"]
    h = jax.nn.relu(h * params["bn2_scale"] + params["bn2_shift"])
    h = h @ params["pw2_w"] + params["pw2_b"]
    h = h * params["bn3_scale"] + params["bn3_shift"]
    if stride == 1:
        h = h + x
    return jax.nn.relu(h)


# -- SoftAttention pooling ---------------------------------------------
def init_soft_attention(rng, in_dim, hidden_dim, dtype=jnp.float32):
    k1, k2 = jax.random.split(rng)
    return {
        "q": jax.random.uniform(k1, (hidden_dim,), dtype),
        "w": jax.random.normal(k2, (in_dim, hidden_dim), dtype) * in_dim**-0.5,
        "b": jnp.zeros((hidden_dim,), dtype),
    }


def soft_attention(
    params: Params, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Attention pooling [B, T, D] -> [B, D] (attention.py:549-556)."""
    hidden = jnp.tanh(x @ params["w"] + params["b"])
    score = jax.nn.softmax(jnp.einsum("btd,d->bt", hidden, params["q"]), axis=-1)
    if mask is not None:
        score = jnp.where(mask, 0.0, score)
    return jnp.einsum("bt,btd->bd", score, x)


# -- selective SSM (Mamba-style) -----------------------------------------
def init_ssm(rng, dim, state_dim=16, dt_rank=None, dtype=jnp.float32):
    dt_rank = dt_rank or max(dim // 16, 1)
    k = jax.random.split(rng, 6)
    return {
        # A negative-real diagonal (S4D-real init)
        "a_log": jnp.log(jnp.arange(1, state_dim + 1, dtype=jnp.float32))[None, :]
        * jnp.ones((dim, 1), jnp.float32),
        "d": jnp.ones((dim,), dtype),
        "w_b": jax.random.normal(k[0], (dim, state_dim), dtype) * dim**-0.5,
        "w_c": jax.random.normal(k[1], (dim, state_dim), dtype) * dim**-0.5,
        "w_dt": jax.random.normal(k[2], (dim, dt_rank), dtype) * dim**-0.5,
        "w_dt_proj": jax.random.normal(k[3], (dt_rank, dim), dtype) * dt_rank**-0.5,
        "dt_bias": jnp.zeros((dim,), dtype),
    }


def ssm_scan(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Selective state-space layer via parallel associative scan.

    x [B, T, D] -> y [B, T, D]. The recurrence h_t = a_t * h_{t-1} + b_t is
    associative under (a, b) ∘ (a', b') = (a a', a' b + b'), so time is a
    log-depth parallel scan instead of the CUDA selective-scan kernel.
    """
    b, t, d = x.shape
    n = params["a_log"].shape[1]
    a = -jnp.exp(params["a_log"])  # [D, N] negative real
    dt = jax.nn.softplus(
        (x @ params["w_dt"]) @ params["w_dt_proj"] + params["dt_bias"]
    )  # [B, T, D]
    bmat = x @ params["w_b"]  # [B, T, N] input-dependent B
    cmat = x @ params["w_c"]  # [B, T, N]

    decay = jnp.exp(dt[..., None] * a)  # [B, T, D, N]
    drive = (dt * x)[..., None] * bmat[:, :, None, :]  # [B, T, D, N]

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    _, h = jax.lax.associative_scan(combine, (decay, drive), axis=1)
    y = jnp.einsum("btdn,btn->btd", h, cmat) + x * params["d"]
    return y
