"""Shared Flax building blocks with torch-compatible initialization/semantics.

The reference model is a PyTorch graph; for released-checkpoint conversion and
training-parity the primitives here reproduce torch layer semantics exactly
(NCHW tensor layout is kept throughout the model code for 1:1 shape mapping
with the reference; XLA re-layouts internally for the TPU).
"""
from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def kaiming_uniform_a5(key, shape, dtype=jnp.float32):
    """torch default conv/linear weight init: kaiming_uniform(a=sqrt(5)).

    For flax kernel layout (..., in, out) the fan_in is prod(shape[:-1]).
    """
    fan_in = 1
    for s in shape[:-1]:
        fan_in *= s
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in):
    bound = math.sqrt(1.0 / fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform_init(key, shape, dtype=jnp.float32):
    return nn.initializers.xavier_uniform()(key, shape, dtype)


def normal_init(std):
    return nn.initializers.normal(stddev=std)


def bias_init_with_prob(prior_prob):
    v = -math.log((1 - prior_prob) / prior_prob)
    return nn.initializers.constant(v)


class Conv(nn.Module):
    """NCHW / NCDHW convolution with torch-style defaults.

    features: out channels; kernel_size: int or tuple; torch layout in/out.
    """

    features: int
    kernel_size: Sequence[int] | int = 3
    stride: Sequence[int] | int = 1
    padding: Sequence[int] | int = 0
    use_bias: bool = True
    ndim: int = 2
    kernel_init: Callable = kaiming_uniform_a5
    bias_init: Callable | None = None  # default: torch uniform(fan_in)
    groups: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ks = self.kernel_size
        if isinstance(ks, int):
            ks = (ks,) * self.ndim
        st = self.stride
        if isinstance(st, int):
            st = (st,) * self.ndim
        pd = self.padding
        if isinstance(pd, int):
            pd = (pd,) * self.ndim
        in_ch = x.shape[1]
        kernel = self.param(
            "kernel", self.kernel_init, (*ks, in_ch // self.groups, self.features)
        )
        x, kernel = _maybe_cast(x, kernel)
        dn = jax.lax.conv_dimension_numbers(
            x.shape,
            kernel.shape,
            ("NCHW", "HWIO", "NCHW")
            if self.ndim == 2
            else ("NCDHW", "DHWIO", "NCDHW"),
        )
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=st,
            padding=[(p, p) for p in pd],
            dimension_numbers=dn,
            feature_group_count=self.groups,
        )
        if self.use_bias:
            fan_in = (in_ch // self.groups) * math.prod(ks)
            b_init = self.bias_init or torch_bias_init(fan_in)
            bias = self.param("bias", b_init, (self.features,))
            y = y + _maybe_cast(bias).reshape((1, -1) + (1,) * self.ndim)
        return y


class ConvTranspose(nn.Module):
    """torch-semantics ConvTranspose (gradient of conv) in NC... layout.

    Matches nn.ConvTranspose2d/3d(kernel, stride, padding, output_padding).
    Kernel stored flax-style (..., out, in) transposed from torch (in, out, ...).
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    ndim: int = 2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k, s, p, op = self.kernel_size, self.stride, self.padding, self.output_padding
        in_ch = x.shape[1]
        kernel = self.param(
            "kernel", kaiming_uniform_a5, ((k,) * self.ndim) + (self.features, in_ch)
        )
        x, kernel = _maybe_cast(x, kernel)
        # conv_transpose as the transpose of a strided conv: lax.conv_transpose
        # with transpose_kernel=True replicates torch's weight convention.
        dn = jax.lax.conv_dimension_numbers(
            x.shape,
            ((k,) * self.ndim) + (in_ch, self.features),
            ("NCHW", "HWIO", "NCHW")
            if self.ndim == 2
            else ("NCDHW", "DHWIO", "NCDHW"),
        )
        pad = [(k - 1 - p, k - 1 - p + op)] * self.ndim
        y = jax.lax.conv_transpose(
            x,
            kernel,
            strides=(s,) * self.ndim,
            padding=pad,
            dimension_numbers=dn,
            transpose_kernel=True,
        )
        if self.use_bias:
            fan_in = self.features * (k**self.ndim)
            bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
            y = y + _maybe_cast(bias).reshape((1, -1) + (1,) * self.ndim)
        return y


# Trace-time knob for reduced-precision compute: set before tracing and every
# Conv/ConvTranspose/Linear casts activations+kernels to this dtype (BN keeps
# f32 statistics). The reference trains fp32; bfloat16 is this framework's
# performance mode (MXU-native on TPU).
_COMPUTE_DTYPE = {"dtype": None}


def set_compute_dtype(dtype):
    """dtype: None | 'bfloat16' | jnp dtype. None = full f32 (default)."""
    _COMPUTE_DTYPE["dtype"] = None if dtype in (None, "float32") else jnp.dtype(dtype)


def _maybe_cast(*arrays):
    dt = _COMPUTE_DTYPE["dtype"]
    if dt is None:
        return arrays if len(arrays) > 1 else arrays[0]
    out = tuple(a.astype(dt) if a is not None else None for a in arrays)
    return out if len(out) > 1 else out[0]


# Trace-time knob for SyncBN: set before tracing a shard_map'd train step and
# every BatchNorm pmean's its batch statistics over that mesh axis (the TPU
# equivalent of the reference's sync_batchnorm=True, main.py:81).
_BN_SYNC_AXIS = {"name": None}


def set_bn_sync_axis(name):
    _BN_SYNC_AXIS["name"] = name


class BatchNorm(nn.Module):
    """torch BatchNorm over channel axis 1 for NC... tensors.

    - train=True: batch statistics (optionally pmean-synced over `axis_name`,
      the TPU equivalent of SyncBN), running stats updated into the
      'batch_stats' collection with torch momentum 0.1.
    - train=False or frozen=True: running statistics.
    Frozen (backbone) BN additionally keeps its affine out of the optimizer
    via the train-time parameter partition (see train/optim.py).
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    frozen: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        ch = x.shape[1]
        scale = self.param("scale", nn.initializers.ones, (ch,))
        bias = self.param("bias", nn.initializers.zeros, (ch,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(ch))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(ch))

        use_running = (not train) or self.frozen
        if use_running:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = (0,) + tuple(range(2, x.ndim))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            mean2 = jnp.mean(jnp.square(xf), axis=axes)
            sync_axis = self.axis_name or _BN_SYNC_AXIS["name"]
            if sync_axis is not None:
                mean = jax.lax.pmean(mean, sync_axis)
                mean2 = jax.lax.pmean(mean2, sync_axis)
            var = mean2 - jnp.square(mean)
            n = x.size // ch
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                unbiased = var * n / max(n - 1, 1)
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        shape = (1, ch) + (1,) * (x.ndim - 2)
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        out = x.astype(jnp.float32) * inv.reshape(shape) + (bias - mean * inv).reshape(shape)
        return out.astype(x.dtype)


class Linear(nn.Module):
    features: int
    use_bias: bool = True
    kernel_init: Callable = kaiming_uniform_a5
    bias_init: Callable | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_f = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (in_f, self.features))
        x, kernel = _maybe_cast(x, kernel)
        y = x @ kernel
        if self.use_bias:
            b_init = self.bias_init or torch_bias_init(in_f)
            y = y + _maybe_cast(self.param("bias", b_init, (self.features,)))
        return y


class LayerNorm(nn.Module):
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        f = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (f,))
        bias = self.param("bias", nn.initializers.zeros, (f,))
        mean = jnp.mean(x, -1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), -1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


class FFN(nn.Module):
    """mmcv FFN: Linear -> ReLU -> Dropout -> Linear -> Dropout, residual add."""

    embed_dims: int
    feedforward_channels: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: Array, identity: Array | None = None, train: bool = False) -> Array:
        y = Linear(self.feedforward_channels, name="fc1")(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = Linear(self.embed_dims, name="fc2")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return (x if identity is None else identity) + y


class MultiheadAttention(nn.Module):
    """torch nn.MultiheadAttention-compatible attention (batch dim second).

    query: (Lq, B, E); key/value: (Lk, B, E); key_padding_mask: (B, Lk) True
    for padded. Used for the inter-view attention pooling
    (deformable_cross_attention.py:543,829-833).
    """

    embed_dims: int
    num_heads: int

    @nn.compact
    def __call__(self, query, key, value, key_padding_mask=None):
        e, h = self.embed_dims, self.num_heads
        hd = e // h
        in_proj_w = self.param("in_proj_kernel", kaiming_uniform_a5, (e, 3 * e))
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,))
        q = query @ in_proj_w[:, :e] + in_proj_b[:e]
        k = key @ in_proj_w[:, e : 2 * e] + in_proj_b[e : 2 * e]
        v = value @ in_proj_w[:, 2 * e :] + in_proj_b[2 * e :]

        lq, b, _ = q.shape
        lk = k.shape[0]
        # (B*h, L, hd)
        q = q.reshape(lq, b, h, hd).transpose(1, 2, 0, 3)
        k = k.reshape(lk, b, h, hd).transpose(1, 2, 0, 3)
        v = v.reshape(lk, b, h, hd).transpose(1, 2, 0, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
        if key_padding_mask is not None:
            mask = key_padding_mask[:, None, None, :]
            logits = jnp.where(mask, -jnp.inf, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        # guard fully-masked rows (all -inf -> nan): zero them
        if key_padding_mask is not None:
            all_masked = jnp.all(key_padding_mask, axis=-1)[:, None, None, None]
            attn = jnp.where(all_masked, 0.0, attn)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(2, 0, 1, 3).reshape(lq, b, e)
        out = Linear(e, name="out_proj")(out)
        return out


def interpolate_nearest(x: Array, scale: float) -> Array:
    """torch F.interpolate(mode='nearest') on NC..HW spatial dims."""
    spatial = x.shape[2:]
    out = x
    for axis, s in enumerate(spatial):
        new_s = int(math.floor(s * scale))
        idx = jnp.floor(jnp.arange(new_s) / scale).astype(jnp.int32)
        idx = jnp.clip(idx, 0, s - 1)
        out = jnp.take(out, idx, axis=axis + 2)
    return out


def interpolate_nearest_size(x: Array, size: Sequence[int]) -> Array:
    """torch F.interpolate(size=..., mode='nearest') on NC... tensors."""
    out = x
    for axis, new_s in enumerate(size):
        s = out.shape[axis + 2]
        if new_s == s:
            continue
        idx = jnp.floor(jnp.arange(new_s) * (s / new_s)).astype(jnp.int32)
        idx = jnp.clip(idx, 0, s - 1)
        out = jnp.take(out, idx, axis=axis + 2)
    return out


def _linear_resize_1d(length_in: int, length_out: int, align_corners: bool):
    """Source indices and lerp weights for one axis (torch convention)."""
    if align_corners and length_out > 1:
        src = jnp.arange(length_out) * (length_in - 1) / (length_out - 1)
    else:
        scale = length_in / length_out
        src = (jnp.arange(length_out) + 0.5) * scale - 0.5
        src = jnp.clip(src, 0.0, None)
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, length_in - 1)
    hi = jnp.clip(lo + 1, 0, length_in - 1)
    w = src - lo
    return lo, hi, w.astype(jnp.float32)


def interpolate_linear(x: Array, size: Sequence[int], align_corners: bool = False) -> Array:
    """torch F.interpolate bilinear/trilinear over the trailing spatial dims of
    an NC... tensor (used for multi-level depth dists, volume upsampling and
    the `valid` mask upsampling: SGCDet.py:84-85, AdaptiveSparseHead.py:64-69,
    imvoxel_head_v2.py:123)."""
    spatial_in = x.shape[2:]
    assert len(size) == len(spatial_in)
    out = x
    for axis, new_s in enumerate(size):
        s = out.shape[axis + 2]
        if new_s == s:
            continue
        lo, hi, w = _linear_resize_1d(s, new_s, align_corners)
        a = jnp.take(out, lo, axis=axis + 2)
        b = jnp.take(out, hi, axis=axis + 2)
        shape = [1] * out.ndim
        shape[axis + 2] = new_s
        w = w.reshape(shape)
        out = a * (1 - w) + b * w
    return out


def grid_sample_2d(img: Array, x: Array, y: Array) -> Array:
    """Bilinear sample img (C, H, W) at pixel coords x, y (...,), zero padding.

    Pixel convention: direct pixel coordinates (caller applies any -0.5
    normalization shifts)."""
    c, h, w = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx, ly = x - x0, y - y0
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    out = 0.0
    for dy, dx, wgt in (
        (0, 0, (1 - ly) * (1 - lx)),
        (0, 1, (1 - ly) * lx),
        (1, 0, ly * (1 - lx)),
        (1, 1, ly * lx),
    ):
        yi = y0i + dy
        xi = x0i + dx
        valid = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
        yi = jnp.clip(yi, 0, h - 1)
        xi = jnp.clip(xi, 0, w - 1)
        flat = yi * w + xi
        g = jnp.take(img.reshape(c, -1), flat.reshape(-1), axis=1)
        g = g.reshape((c,) + x.shape)
        out = out + g * jnp.where(valid, wgt, 0.0)[None]
    return out
