"""Wave-U-Net for the speech-enhancement demo, in flax.linen.

Reference: the 12-level U-Net at `/root/reference/src/nomad_audio/
nomad_loss_test.py:212-306` (itself from the public
Wave-U-Net-for-Speech-Enhancement repo): DownSamplingLayer = Conv1d(k=15,
pad=7) + BatchNorm + LeakyReLU(0.1), decimation by slicing [..., ::2];
middle conv; decoder = linear interpolation x2 (align_corners=True) + skip
concat + Conv1d(k=5, pad=2) + BN + LeakyReLU; output = concat(input) ->
Conv1d(k=1) -> tanh. Fixed 16384-sample windows (quirk: `:196`).

The conv layout is channels-last ([B, T, C]) so XLA maps the convs onto the
MXU directly; decimation/interpolation are gather-free slices/blends.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def interpolate_linear_x2(x):
    """torch F.interpolate(scale_factor=2, mode='linear',
    align_corners=True) on [B, T, C]: out position i maps to input
    coordinate i*(T-1)/(2T-1)."""
    b, t, c = x.shape
    t_out = 2 * t
    pos = jnp.arange(t_out, dtype=jnp.float32) * (t - 1) / (t_out - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    w = (pos - lo.astype(jnp.float32))[None, :, None]
    return x[:, lo, :] * (1.0 - w) + x[:, hi, :] * w


class ConvBNLeaky(nn.Module):
    features: int
    kernel: int
    padding: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel,),
            padding=[(self.padding, self.padding)],
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            name="bn",
        )(x)
        return nn.leaky_relu(x, negative_slope=0.1)


class WaveUNet(nn.Module):
    n_layers: int = 12
    channels_interval: int = 24

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, T] or [B, 1, T] (reference feeds [B, 1, T])
        squeeze_back = False
        if x.ndim == 3:
            x = x[:, 0, :]
            squeeze_back = True
        inp = x[:, :, None]  # [B, T, 1]

        o = inp
        skips = []
        enc_out = [i * self.channels_interval for i in range(1, self.n_layers + 1)]
        for i in range(self.n_layers):
            o = ConvBNLeaky(enc_out[i], 15, 7, name=f"down_{i}")(o, train)
            skips.append(o)
            o = o[:, ::2, :]

        o = ConvBNLeaky(
            self.n_layers * self.channels_interval, 15, 7, name="middle"
        )(o, train)

        dec_out = enc_out[::-1]
        for i in range(self.n_layers):
            o = interpolate_linear_x2(o)
            o = jnp.concatenate([o, skips[self.n_layers - i - 1]], axis=-1)
            o = ConvBNLeaky(dec_out[i], 5, 2, name=f"up_{i}")(o, train)

        o = jnp.concatenate([o, inp], axis=-1)
        o = nn.Conv(1, kernel_size=(1,), name="out_conv")(o)
        o = jnp.tanh(o)
        o = o[:, :, 0]
        return o[:, None, :] if squeeze_back else o
