"""Masked policy/value ResNet (flax, NHWC, TPU-first).

Capability-parity reimplementation of the reference trainer's model
(/root/reference/train/torch/network.py:100-1213) in JAX/flax:

- every conv is multiplied by the on-board mask (mixed board sizes share one
  fixed buffer, network.py:1131-1134);
- BatchNorm is masked batch *renorm* with clipping and sqrt-batch-scaled
  momentum (network.py:215-350);
- GlobalPool = concat(mean, mean*(sqrt(hw)-14)/10, max); the value-head
  variant uses the KataGo board-size polynomials
  (network.py:133-174);
- block zoo: ResidualBlock / BottleneckBlock / NestedBottleneckBlock /
  MixerBlock(V1/V2), each with optional SE (network.py:643-919);
- policy head (Normal or RepLK large-kernel depthwise) emits 5 spatial
  policy planes + 5 pass logits (network.py:954-1006, 1143-1171);
- value head emits 15 misc values = wdl(3) + q_vals(5) + scores(5) +
  errors(2), plus tanh ownership (network.py:1008-1036, 1173-1193), with
  scale conventions scores*20, q_error*0.25, score_error*150.

Layout is NHWC and matmul-heavy ops prefer bfloat16 inputs with f32
accumulation — the MXU-native convention (3x3 convs on 19x19 boards lower to
im2col matmuls that tile onto the 128x128 systolic array).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

CRAZY_NEGATIVE_VALUE = -5000.0
B_AVG = (19 + 9) / 2  # GlobalPool board-size centering (network.py:134)
B_VARIANCE = 0.1


@dataclasses.dataclass(frozen=True)
class NetConfig:
    """Static architecture config (the reference's NeuralNetwork json block,
    /root/reference/bash/CONFIG.md + train/torch/config.py)."""

    boardsize: int = 19
    input_channels: int = 43
    residual_channels: int = 96
    stack: Sequence[str] = (
        "ResidualBlock",
        "ResidualBlock",
        "ResidualBlock-SE",
        "ResidualBlock",
        "ResidualBlock",
        "ResidualBlock-SE",
    )
    se_ratio: int = 4
    policy_head_channels: int = 32
    value_head_channels: int = 32
    policy_head_type: str = "Normal"  # or "RepLK"
    policy_head_kernel: int = 7
    activation: str = "relu"
    renorm_max_r: float = 1.0
    renorm_max_d: float = 0.0
    value_misc: int = 15
    policy_outs: int = 5
    compute_dtype: Any = jnp.float32  # set bfloat16 for TPU serving/training


def act_fn(name: str):
    return {
        "identity": lambda x: x,
        "relu": jax.nn.relu,
        "elu": jax.nn.elu,
        "selu": jax.nn.selu,
        "gelu": jax.nn.gelu,
        "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
        "swish": jax.nn.silu,
        "hardswish": jax.nn.hard_swish,
    }[name]


def softplus_with_gradient_floor(x, grad_floor=0.05, square=True):
    """KataGo's SoftPlusWithGradientFloor (network.py:106-130): forward is
    softplus (squared variant halves the input first); backward never lets
    the sigmoid gradient fall below `grad_floor`."""

    @jax.custom_vjp
    def _f(x):
        return jnp.square(jax.nn.softplus(0.5 * x)) if square else jax.nn.softplus(x)

    def _fwd(x):
        return _f(x), x

    def _bwd(x, g):
        return (g * (grad_floor + (1.0 - grad_floor) * jax.nn.sigmoid(x)),)

    _f.defvjp(_fwd, _bwd)
    return _f(x)


class MaskedBatchNorm(nn.Module):
    """Masked batch renorm (network.py:215-350).

    Statistics are computed over on-board cells only (sum / mask_sum).
    Renorm clipping r in [1/rmax, rmax], d in [-dmax, dmax]; with the default
    rmax=1, dmax=0 this reduces to plain masked BN. Running stats update with
    momentum * sqrt(batch/256) (momentum_basic_batchsize=256)."""

    features: int
    use_gamma: bool = False
    eps: float = 1e-5
    momentum: float = 0.01
    rmax: float = 1.0
    dmax: float = 0.0
    basic_batchsize: int = 256

    @nn.compact
    def __call__(self, x, mask, train: bool):
        # x: [B, H, W, C]; mask: [B, H, W, 1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        beta = self.param("beta", nn.initializers.zeros, (self.features,))
        gamma = (
            self.param("gamma", nn.initializers.ones, (self.features,))
            if self.use_gamma
            else None
        )

        if not train:
            # Inference: fold the normalization into one per-channel
            # multiply-add in the compute dtype (the f32-cast + divide
            # variant cost ~2 extra HBM passes per conv; the reference
            # engine folds stddev into the weights the same way,
            # /root/reference/src/neural/loader.cc "folded stddev").
            scale = jax.lax.rsqrt(ra_var.value + self.eps)
            if gamma is not None:
                scale = scale * gamma
            bias = beta - ra_mean.value * scale
            out = x * scale.astype(x.dtype) + bias.astype(x.dtype)
            return out * mask

        xf = x.astype(jnp.float32)
        mask_sum = jnp.sum(mask.astype(jnp.float32))
        mean = jnp.sum(xf, axis=(0, 1, 2)) / mask_sum
        zm = (xf - mean) * mask
        var = jnp.sum(jnp.square(zm), axis=(0, 1, 2)) / mask_sum

        std = jnp.sqrt(var + self.eps)
        r_std = jnp.sqrt(ra_var.value + self.eps)
        r = jnp.clip(
            jax.lax.stop_gradient(std) / r_std, 1.0 / self.rmax, self.rmax
        )
        d = jnp.clip(
            (jax.lax.stop_gradient(mean) - ra_mean.value) / r_std,
            -self.dmax,
            self.dmax,
        )
        out = (xf - mean) / std * r + d

        b = x.shape[0]
        m = self.momentum * math.sqrt(b / self.basic_batchsize)
        if not self.is_initializing():
            ra_mean.value = ra_mean.value + m * (
                jax.lax.stop_gradient(mean) - ra_mean.value
            )
            ra_var.value = ra_var.value + m * (
                jax.lax.stop_gradient(var) - ra_var.value
            )

        if gamma is not None:
            out = out * gamma
        out = out + beta
        return (out * mask).astype(x.dtype)


class ConvBlock(nn.Module):
    """conv(no bias) -> *mask -> BN -> act (network.py:489-555)."""

    features: int
    kernel: int
    use_gamma: bool
    activation: str
    rmax: float = 1.0
    dmax: float = 0.0

    @nn.compact
    def __call__(self, x, mask, train: bool):
        y = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding="SAME",
            use_bias=False,
            dtype=x.dtype,
            kernel_init=nn.initializers.xavier_normal(),
        )(x)
        y = y * mask
        y = MaskedBatchNorm(
            self.features, use_gamma=self.use_gamma, rmax=self.rmax, dmax=self.dmax
        )(y, mask, train)
        return act_fn(self.activation)(y)


class BroadcastDWConv(nn.Module):
    """Depthwise conv whose effective kernel adds a gamma-weighted
    cross-channel broadcast (network.py:352-395)."""

    features: int
    kernel: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            nn.initializers.xavier_normal(),
            (self.kernel, self.kernel, self.features),
        )
        gamma = self.param(
            "gamma",
            lambda key, shape: jnp.ones(shape) / math.sqrt(self.features),
            (self.features,),
        )
        # weight + sum_c(weight_c * gamma_c) broadcast to every channel
        w_eff = w + jnp.sum(w * gamma[None, None, :], axis=-1, keepdims=True)
        y = jax.lax.conv_general_dilated(
            x,
            w_eff[:, :, None, :].astype(x.dtype),  # HWIO with I=1 (depthwise)
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.features,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(x.dtype)
        return y


class DepthwiseConvBlock(nn.Module):
    """(large-k dwconv + reparam 3x3 dwconv) -> *mask -> BN -> act
    (RepLK structural reparam, network.py:557-640)."""

    features: int
    kernel: int
    use_gamma: bool
    activation: str
    rmax: float = 1.0
    dmax: float = 0.0

    @nn.compact
    def __call__(self, x, mask, train: bool):
        y = BroadcastDWConv(self.features, self.kernel, name="conv")(x)
        y = y + BroadcastDWConv(self.features, 3, name="rep3x3")(x)
        y = y * mask
        y = MaskedBatchNorm(
            self.features, use_gamma=self.use_gamma, rmax=self.rmax, dmax=self.dmax
        )(y, mask, train)
        return act_fn(self.activation)(y)


def global_pool(x, mask, mask_sum_hw, mask_sum_hw_sqrt, is_value_head=False):
    """[B,H,W,C] -> [B,3C] (network.py:132-175)."""
    xf = x.astype(jnp.float32)
    div = mask_sum_hw[:, None]
    mean = jnp.sum(xf, axis=(1, 2)) / div
    b_diff = mask_sum_hw_sqrt[:, None] - B_AVG
    if is_value_head:
        l0 = mean
        l1 = mean * (b_diff / 10.0)
        l2 = mean * (jnp.square(b_diff) / 100.0 - B_VARIANCE)
    else:
        raw = xf + (1.0 - mask) * CRAZY_NEGATIVE_VALUE
        l0 = mean
        l1 = mean * (b_diff / 10.0)
        l2 = jnp.max(raw, axis=(1, 2))
    return jnp.concatenate([l0, l1, l2], axis=1).astype(x.dtype)


class Dense(nn.Module):
    features: int
    activation: str = "identity"

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(
            self.features,
            dtype=x.dtype,
            kernel_init=nn.initializers.xavier_normal(),
        )(x)
        return act_fn(self.activation)(y)


class SqueezeExcite(nn.Module):
    """gpool -> squeeze FC -> excite FC -> sigmoid scale + bias
    (network.py:177-214)."""

    features: int
    se_size: int
    activation: str

    @nn.compact
    def __call__(self, x, mask, msum, msqrt):
        s = global_pool(x, mask, msum, msqrt, is_value_head=False)
        s = Dense(self.se_size, self.activation, name="squeeze")(s)
        s = Dense(self.features * 2, "identity", name="excite")(s)
        gammas, betas = jnp.split(s, 2, axis=1)
        out = jax.nn.sigmoid(gammas)[:, None, None, :] * x + betas[:, None, None, :]
        return out * mask


class ResidualBlock(nn.Module):
    features: int
    se_size: int | None
    activation: str
    rmax: float = 1.0
    dmax: float = 0.0

    @nn.compact
    def __call__(self, x, mask, msum, msqrt, train: bool):
        out = ConvBlock(
            self.features, 3, False, self.activation, self.rmax, self.dmax,
            name="conv1",
        )(x, mask, train)
        out = ConvBlock(
            self.features, 3, True, "identity", self.rmax, self.dmax,
            name="conv2",
        )(out, mask, train)
        if self.se_size:
            out = SqueezeExcite(
                self.features, self.se_size, self.activation, name="se"
            )(out, mask, msum, msqrt)
        return act_fn(self.activation)(out + x)


class BottleneckBlock(nn.Module):
    features: int
    bottleneck: int
    se_size: int | None
    activation: str
    rmax: float = 1.0
    dmax: float = 0.0

    @nn.compact
    def __call__(self, x, mask, msum, msqrt, train: bool):
        a = self.activation
        out = ConvBlock(self.bottleneck, 1, False, a, self.rmax, self.dmax,
                        name="pre")(x, mask, train)
        out = ConvBlock(self.bottleneck, 3, False, a, self.rmax, self.dmax,
                        name="conv1")(out, mask, train)
        out = ConvBlock(self.bottleneck, 3, False, a, self.rmax, self.dmax,
                        name="conv2")(out, mask, train)
        out = ConvBlock(self.features, 1, True, "identity", self.rmax,
                        self.dmax, name="post")(out, mask, train)
        if self.se_size:
            out = SqueezeExcite(self.features, self.se_size, a, name="se")(
                out, mask, msum, msqrt
            )
        return act_fn(a)(out + x)


class NestedBottleneckBlock(nn.Module):
    features: int
    bottleneck: int
    se_size: int | None
    activation: str
    rmax: float = 1.0
    dmax: float = 0.0

    @nn.compact
    def __call__(self, x, mask, msum, msqrt, train: bool):
        a = self.activation
        out = ConvBlock(self.bottleneck, 1, False, a, self.rmax, self.dmax,
                        name="pre")(x, mask, train)
        out = ResidualBlock(self.bottleneck, None, a, self.rmax, self.dmax,
                            name="block1")(out, mask, msum, msqrt, train)
        out = ResidualBlock(self.bottleneck, None, a, self.rmax, self.dmax,
                            name="block2")(out, mask, msum, msqrt, train)
        out = ConvBlock(self.features, 1, True, "identity", self.rmax,
                        self.dmax, name="post")(out, mask, train)
        if self.se_size:
            out = SqueezeExcite(self.features, self.se_size, a, name="se")(
                out, mask, msum, msqrt
            )
        return act_fn(a)(out + x)


class MixerBlock(nn.Module):
    """ConvNeXt-style depthwise + FFN block (network.py:843-919)."""

    features: int
    se_size: int | None
    activation: str
    kernel: int = 7
    ffn_ratio: float = 1.5
    version: int = 1
    rmax: float = 1.0
    dmax: float = 0.0

    @nn.compact
    def __call__(self, x, mask, msum, msqrt, train: bool):
        a = self.activation
        ffn_ch = int(self.ffn_ratio * self.features)
        dw = DepthwiseConvBlock(
            self.features, self.kernel, True, a, self.rmax, self.dmax,
            name="dw",
        )
        ffn1 = ConvBlock(ffn_ch, 1, False, a, self.rmax, self.dmax, name="ffn1")
        ffn2 = ConvBlock(self.features, 1, True, "identity", self.rmax,
                         self.dmax, name="ffn2")
        if self.version == 1:
            x = dw(x, mask, train) + x
            out = ffn1(x, mask, train)
            out = ffn2(out, mask, train)
        else:
            out = dw(x, mask, train)
            out = ffn1(out, mask, train)
            out = ffn2(out, mask, train)
        if self.se_size:
            out = SqueezeExcite(self.features, self.se_size, a, name="se")(
                out, mask, msum, msqrt
            )
        return act_fn(a)(out + x)


def _parse_block(spec: str, cfg: NetConfig):
    """'ResidualBlock-SE' etc -> (class, kwargs) (network.py:1038-1090)."""
    parts = spec.strip().split("-")
    se_size = None
    kind = None
    version = 1
    for p in parts:
        if p == "SE":
            se_size = cfg.residual_channels // cfg.se_ratio
        elif p in ("ResidualBlock", "BottleneckBlock", "NestedBottleneckBlock"):
            kind = p
        elif p in ("MixerBlock", "MixerBlockV1"):
            kind = "MixerBlock"
        elif p == "MixerBlockV2":
            kind, version = "MixerBlock", 2
        else:
            raise ValueError(f"unknown block component {p!r}")
    if kind is None:
        raise ValueError(f"no basic block in {spec!r}")
    common = dict(
        features=cfg.residual_channels,
        se_size=se_size,
        activation=cfg.activation,
        rmax=cfg.renorm_max_r,
        dmax=cfg.renorm_max_d,
    )
    if kind == "ResidualBlock":
        return ResidualBlock, common
    if kind == "BottleneckBlock":
        return BottleneckBlock, dict(common, bottleneck=cfg.residual_channels // 2)
    if kind == "NestedBottleneckBlock":
        return NestedBottleneckBlock, dict(
            common, bottleneck=cfg.residual_channels // 2
        )
    return MixerBlock, dict(common, version=version)


class SayuriNet(nn.Module):
    """Full policy/value network (network.py:921-1213).

    __call__(planes [B,H,W,43], train) -> dict of heads:
      prob/aux_prob/soft_prob/soft_aux_prob/optimistic_prob: [B, HW+1] logits
      ownership: [B, HW] tanh
      wdl: [B, 3] logits
      q_vals: [B, 5] tanh {final, current, short, middle, long}
      scores: [B, 5] (scaled x20)
      errors: [B, 2] {q_error x0.25, score_error x150}
    """

    cfg: NetConfig

    @nn.compact
    def __call__(self, planes, train: bool = False):
        cfg = self.cfg
        x = planes.astype(cfg.compute_dtype)
        mask = planes[..., cfg.input_channels - 1 :].astype(cfg.compute_dtype)
        msum = jnp.sum(
            mask.astype(jnp.float32), axis=(1, 2, 3)
        )  # [B] on-board cells
        msqrt = jnp.sqrt(msum)

        x = ConvBlock(
            cfg.residual_channels, 3, True, cfg.activation,
            cfg.renorm_max_r, cfg.renorm_max_d, name="input_conv",
        )(x, mask, train)

        for i, spec in enumerate(cfg.stack):
            cls, kwargs = _parse_block(spec, cfg)
            x = cls(**kwargs, name=f"tower{i}")(x, mask, msum, msqrt, train)

        # ---- policy head ----
        pol = ConvBlock(
            cfg.policy_head_channels, 1, False, cfg.activation,
            cfg.renorm_max_r, cfg.renorm_max_d, name="policy_conv",
        )(x, mask, train)
        if cfg.policy_head_type == "RepLK":
            pol = DepthwiseConvBlock(
                cfg.policy_head_channels, max(cfg.policy_head_kernel, 7),
                False, cfg.activation, cfg.renorm_max_r, cfg.renorm_max_d,
                name="policy_dw",
            )(pol, mask, train)
            pol = ConvBlock(
                cfg.policy_head_channels, 1, True, cfg.activation,
                cfg.renorm_max_r, cfg.renorm_max_d, name="policy_pw",
            )(pol, mask, train)
        pol_gpool = global_pool(pol, mask, msum, msqrt)
        pol_inter = Dense(
            cfg.policy_head_channels, cfg.activation, name="policy_inter"
        )(pol_gpool)
        pol = (pol + pol_inter[:, None, None, :]) * mask
        pol_spatial = nn.Conv(
            cfg.policy_outs, (1, 1), use_bias=True, dtype=pol.dtype,
            kernel_init=nn.initializers.xavier_normal(), name="pol_misc",
        )(pol)
        pol_spatial = pol_spatial * mask + (1.0 - mask) * CRAZY_NEGATIVE_VALUE
        b = planes.shape[0]
        hw = planes.shape[1] * planes.shape[2]
        pol_spatial = pol_spatial.reshape(b, hw, cfg.policy_outs)
        pol_pass = Dense(cfg.policy_outs, "identity", name="pol_pass")(pol_inter)
        pol_all = jnp.concatenate([pol_spatial, pol_pass[:, None, :]], axis=1)
        pol_all = pol_all.astype(jnp.float32)

        # ---- value head ----
        val = ConvBlock(
            cfg.value_head_channels, 1, False, cfg.activation,
            cfg.renorm_max_r, cfg.renorm_max_d, name="value_conv",
        )(x, mask, train)
        val_gpool = global_pool(val, mask, msum, msqrt, is_value_head=True)
        val_inter = Dense(
            cfg.value_head_channels * 3, cfg.activation, name="value_inter"
        )(val_gpool)
        ownership = nn.Conv(
            1, (1, 1), use_bias=True, dtype=val.dtype,
            kernel_init=nn.initializers.xavier_normal(), name="ownership_conv",
        )(val)
        ownership = jnp.tanh(
            (ownership * mask).reshape(b, hw).astype(jnp.float32)
        )
        val_misc = Dense(cfg.value_misc, "identity", name="value_misc")(
            val_inter
        ).astype(jnp.float32)

        wdl = val_misc[:, 0:3]
        q_vals = jnp.tanh(val_misc[:, 3:8])
        scores = 20.0 * val_misc[:, 8:13]
        errors = softplus_with_gradient_floor(val_misc[:, 13:15], 0.05, True)
        errors = jnp.stack(
            [0.25 * errors[:, 0], 150.0 * errors[:, 1]], axis=1
        )

        return {
            "prob": pol_all[:, :, 0],
            "aux_prob": pol_all[:, :, 1],
            "soft_prob": pol_all[:, :, 2],
            "soft_aux_prob": pol_all[:, :, 3],
            "optimistic_prob": pol_all[:, :, 4],
            "ownership": ownership,
            "wdl": wdl,
            "q_vals": q_vals,
            "scores": scores,
            "errors": errors,
        }
