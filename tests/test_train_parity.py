"""Training-step parity vs torch: identical weights + data through one
triplet step (forward, backward, Adam update) must produce matching losses
and updated parameters. This pins the whole training path — model grads,
TripletMarginLoss semantics, Adam (optax scale_by_adam == torch.optim.Adam
with eps outside the sqrt) — not just the forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nomad_tpu.convert import canonicalize, merge_into, to_flax_params
from nomad_tpu.convert.oracle import TorchNomadOracle
from nomad_tpu.models import NomadModel, Wav2Vec2Config
from nomad_tpu.training import Training


@pytest.fixture(scope="module")
def pair():
    # dropout zeroed so torch eval-mode numerics == our deterministic path
    cfg = Wav2Vec2Config.tiny(
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0
    )
    oracle = TorchNomadOracle(cfg, emb_dim=16, seed=0)
    model = NomadModel(cfg, emb_dim=16, masked_pool=False)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 800)), method=NomadModel.init_all
    )
    params = merge_into(
        params,
        to_flax_params(
            canonicalize(oracle.state_dict()), cfg.num_layers, len(cfg.conv_dim)
        ),
    )
    return cfg, oracle, model, params


def torch_step(oracle, a, p, n, lr, margin=0.2):
    import torch

    backbone = oracle.backbone
    head = oracle.head
    for m in (backbone, head):
        for prm in m.parameters():
            prm.requires_grad_(True)
    opt = torch.optim.Adam(
        list(backbone.parameters()) + list(head.parameters()), lr=lr
    )

    def embed(w):
        x = backbone(torch.from_numpy(w)).last_hidden_state
        e = head(torch.mean(x, 1))
        return torch.nn.functional.normalize(e, dim=1)

    loss = torch.nn.TripletMarginLoss(margin=margin)(
        embed(a), embed(p), embed(n)
    )
    opt.zero_grad()
    loss.backward()
    opt.step()
    return float(loss)


def test_one_step_parity(pair):
    cfg, oracle, model, params = pair
    rng = np.random.default_rng(5)
    T = 800  # equal lengths: no padding, so pooling semantics align exactly
    a, p, n = (
        (0.2 * rng.standard_normal((2, T))).astype(np.float32) for _ in range(3)
    )

    config = {
        "experiment_name": "none",
        "lr": 1e-3,
        "freeze_convnet": False,  # single param group like the torch side
        "freeze_all": False,
        "margin": 0.2,
        "emb_dim": 16,
        "masked_pool": False,
        "remat": False,
    }
    tr = Training(config, params=params, model_config=cfg)
    tr.model = NomadModel(cfg, emb_dim=16, masked_pool=False)
    tr.margin = 0.2
    tr._build_optimizer()

    lengths = jnp.full((2,), T, jnp.int32)
    step = tr._get_step((2, T))
    new_params, _, loss = step(
        tr.params, tr.opt_state,
        jnp.asarray(a), jnp.asarray(p), jnp.asarray(n),
        lengths, lengths, lengths,
        jnp.float32(1e-3), jnp.float32(1e-3), jax.random.key(0),
    )
    t_loss = torch_step(oracle, a, p, n, lr=1e-3)

    assert abs(float(loss) - t_loss) < 1e-5, (float(loss), t_loss)

    # updated params match torch's post-step state_dict (the lossnet head is
    # frozen on our side and absent on torch's — skip it)
    t_after = to_flax_params(
        canonicalize(oracle.state_dict()), cfg.num_layers, len(cfg.conv_dim)
    )
    ours = jax.device_get(new_params["params"])

    def compare(t_tree, o_tree, path=""):
        for k, v in t_tree.items():
            if isinstance(v, dict):
                compare(v, o_tree[k], path + k + "/")
            elif "pos_conv/conv/kernel" in path + k:
                # documented divergence (PARITY.md): torch optimizes the
                # weight-norm (g, v) pair, we optimize the composed kernel —
                # one Adam step lands at a nearby but different point
                diff = np.max(np.abs(np.asarray(o_tree[k]) - v))
                assert 0 < diff < 1e-2, f"{path + k}: {diff}"
            else:
                d = np.abs(np.asarray(o_tree[k]) - v)
                # Adam's step-1 update is ~lr*sign(grad): components whose
                # gradient sits at f32 noise can flip sign between
                # frameworks, bounding any single entry by ~2*lr. Require
                # the bulk to match tightly and every entry within that
                # bound (lr = 1e-3).
                assert float(np.mean(d)) < 5e-6, f"{path + k}: mean {d.mean()}"
                assert float(np.max(d)) < 2.5e-3, f"{path + k}: max {d.max()}"

    compare(t_after["backbone"], ours["backbone"])
    compare(t_after["embedding"], ours["embedding"])
