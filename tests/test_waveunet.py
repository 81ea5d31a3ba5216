"""Wave-U-Net parity vs a torch replica of the reference SE model
(`/root/reference/src/nomad_audio/nomad_loss_test.py:212-306`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nomad_tpu.models.waveunet import WaveUNet, interpolate_linear_x2


def torch_waveunet(n_layers=3, channels_interval=4):
    """Reference-architecture torch model (built here independently for the
    oracle: conv k15 p7 + BN + LeakyReLU(0.1) encoder with ::2 decimation,
    linear-x2 upsampling decoder with skip concat, 1x1 tanh head)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class Down(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.net = nn.Sequential(
                nn.Conv1d(cin, cout, 15, 1, 7),
                nn.BatchNorm1d(cout),
                nn.LeakyReLU(0.1),
            )

        def forward(self, x):
            return self.net(x)

    class Up(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.net = nn.Sequential(
                nn.Conv1d(cin, cout, 5, 1, 2),
                nn.BatchNorm1d(cout),
                nn.LeakyReLU(0.1),
            )

        def forward(self, x):
            return self.net(x)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            enc_in = [1] + [i * channels_interval for i in range(1, n_layers)]
            enc_out = [i * channels_interval for i in range(1, n_layers + 1)]
            self.encoder = nn.ModuleList(
                Down(enc_in[i], enc_out[i]) for i in range(n_layers)
            )
            self.middle = Down(
                n_layers * channels_interval, n_layers * channels_interval
            )
            dec_in = [
                (2 * i + 1) * channels_interval for i in range(1, n_layers)
            ] + [2 * n_layers * channels_interval]
            dec_in = dec_in[::-1]
            dec_out = enc_out[::-1]
            self.decoder = nn.ModuleList(
                Up(dec_in[i], dec_out[i]) for i in range(n_layers)
            )
            self.out = nn.Sequential(
                nn.Conv1d(1 + channels_interval, 1, 1, 1), nn.Tanh()
            )

        def forward(self, x):
            tmp = []
            o = x
            for i in range(n_layers):
                o = self.encoder[i](o)
                tmp.append(o)
                o = o[:, :, ::2]
            o = self.middle(o)
            for i in range(n_layers):
                o = F.interpolate(
                    o, scale_factor=2, mode="linear", align_corners=True
                )
                o = torch.cat([o, tmp[n_layers - i - 1]], dim=1)
                o = self.decoder[i](o)
            o = torch.cat([o, x], dim=1)
            return self.out(o)

    torch.manual_seed(0)
    return Net().eval()


def convert_waveunet_params(tnet, n_layers):
    """torch state_dict -> flax WaveUNet params/batch_stats."""

    def conv(m):
        return {
            "kernel": m.weight.detach().numpy().transpose(2, 1, 0),
            "bias": m.bias.detach().numpy(),
        }

    def bn(m):
        return (
            {"scale": m.weight.detach().numpy(), "bias": m.bias.detach().numpy()},
            {
                "mean": m.running_mean.detach().numpy(),
                "var": m.running_var.detach().numpy(),
            },
        )

    params, stats = {}, {}

    def block(name, seq):
        scale, st = bn(seq.net[1])
        params[name] = {"conv": conv(seq.net[0]), "bn": scale}
        stats[name] = {"bn": st}

    for i, m in enumerate(tnet.encoder):
        block(f"down_{i}", m)
    block("middle", tnet.middle)
    for i, m in enumerate(tnet.decoder):
        block(f"up_{i}", m)
    params["out_conv"] = conv(tnet.out[0])
    return {"params": params, "batch_stats": stats}


def test_interpolate_linear_x2_matches_torch():
    import torch
    import torch.nn.functional as F

    x = np.random.default_rng(0).standard_normal((2, 8, 3)).astype(np.float32)
    ours = np.asarray(interpolate_linear_x2(jnp.asarray(x)))
    theirs = (
        F.interpolate(
            torch.from_numpy(x.transpose(0, 2, 1)),
            scale_factor=2,
            mode="linear",
            align_corners=True,
        )
        .numpy()
        .transpose(0, 2, 1)
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_waveunet_matches_torch_reference():
    import torch

    n_layers, ci = 3, 4
    tnet = torch_waveunet(n_layers, ci)
    net = WaveUNet(n_layers=n_layers, channels_interval=ci)
    x = (
        0.3 * np.random.default_rng(1).standard_normal((2, 1, 256))
    ).astype(np.float32)
    variables = convert_waveunet_params(tnet, n_layers)
    ours = np.asarray(net.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        theirs = tnet(torch.from_numpy(x)).numpy()
    assert ours.shape == theirs.shape == (2, 1, 256)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_waveunet_output_range_and_grad():
    net = WaveUNet(n_layers=3, channels_interval=4)
    x = jnp.asarray(
        0.3 * np.random.default_rng(2).standard_normal((2, 512)).astype(np.float32)
    )
    variables = net.init(jax.random.key(0), x, train=False)
    y = net.apply(variables, x, train=False)
    assert y.shape == x.shape
    assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh head

    def loss(params):
        out, _ = net.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return jnp.mean((out - x) ** 2)

    g = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in flat)
