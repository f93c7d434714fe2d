"""Tests for the flax policy/value network.

Checks shapes/ranges of all heads, mask invariance (off-board garbage cannot
leak into outputs — the property the reference enforces by multiplying every
conv by the board mask, network.py:1131-1134), symmetry equivariance, and
batch-stats mutation in train mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sayuri_tpu.models.network import NetConfig, SayuriNet
from sayuri_tpu.models import symmetry as S


def tiny_cfg(n=9, stack=("ResidualBlock", "ResidualBlock-SE")):
    return NetConfig(
        boardsize=n,
        residual_channels=32,
        stack=stack,
        se_ratio=2,
        policy_head_channels=16,
        value_head_channels=16,
    )


def fake_planes(key, b, n, size=None):
    """Random planes with a proper trailing mask channel."""
    size = size or n
    x = jax.random.uniform(key, (b, n, n, 43))
    mask = jnp.zeros((n, n))
    mask = mask.at[:size, :size].set(1.0)
    x = x * mask[None, :, :, None]
    x = x.at[..., 42].set(mask[None])
    return x


class TestNetwork:
    def test_shapes_and_ranges(self):
        n = 9
        cfg = tiny_cfg(n)
        net = SayuriNet(cfg)
        x = fake_planes(jax.random.PRNGKey(0), 2, n)
        variables = net.init(jax.random.PRNGKey(1), x, train=False)
        out = net.apply(variables, x, train=False)
        hw = n * n
        assert out["prob"].shape == (2, hw + 1)
        assert out["aux_prob"].shape == (2, hw + 1)
        assert out["ownership"].shape == (2, hw)
        assert out["wdl"].shape == (2, 3)
        assert out["q_vals"].shape == (2, 5)
        assert out["scores"].shape == (2, 5)
        assert out["errors"].shape == (2, 2)
        assert np.all(np.abs(np.asarray(out["q_vals"])) <= 1.0)
        assert np.all(np.asarray(out["errors"]) >= 0.0)
        assert np.all(np.abs(np.asarray(out["ownership"])) <= 1.0)

    def test_all_block_types_build(self):
        n = 5
        cfg = tiny_cfg(
            n,
            stack=(
                "ResidualBlock",
                "BottleneckBlock-SE",
                "NestedBottleneckBlock",
                "MixerBlock",
                "MixerBlockV2-SE",
            ),
        )
        net = SayuriNet(cfg)
        x = fake_planes(jax.random.PRNGKey(0), 1, n)
        variables = net.init(jax.random.PRNGKey(1), x, train=False)
        out = net.apply(variables, x, train=False)
        assert out["prob"].shape == (1, n * n + 1)

    def test_replk_policy_head(self):
        n = 9
        cfg = NetConfig(
            boardsize=n,
            residual_channels=32,
            stack=("ResidualBlock",),
            policy_head_channels=16,
            value_head_channels=16,
            policy_head_type="RepLK",
        )
        net = SayuriNet(cfg)
        x = fake_planes(jax.random.PRNGKey(0), 1, n)
        variables = net.init(jax.random.PRNGKey(1), x, train=False)
        out = net.apply(variables, x, train=False)
        assert out["prob"].shape == (1, n * n + 1)

    def test_mask_discipline_across_batch(self):
        """Mask discipline: in eval mode, a small-board game's outputs must
        not depend on what other games share its batch (each conv output is
        re-masked and pooling normalizes by mask_sum — the invariant the
        reference enforces via its mask plumbing, network.py:1131-1134).
        Inputs are zero off-board by encoder contract."""
        n, size = 9, 5
        cfg = tiny_cfg(n)
        net = SayuriNet(cfg)
        x_small = fake_planes(jax.random.PRNGKey(0), 1, n, size)
        x_big = fake_planes(jax.random.PRNGKey(5), 1, n, n)
        variables = net.init(jax.random.PRNGKey(1), x_small, train=False)

        o_alone = net.apply(variables, x_small, train=False)
        o_mixed = net.apply(
            variables, jnp.concatenate([x_small, x_big]), train=False
        )
        np.testing.assert_allclose(
            np.asarray(o_alone["prob"])[0],
            np.asarray(o_mixed["prob"])[0],
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(o_alone["wdl"])[0],
            np.asarray(o_mixed["wdl"])[0],
            atol=1e-4,
        )
        # off-board logits crushed
        p = np.asarray(o_alone["prob"])[0, : n * n].reshape(n, n)
        assert (p[size:, :] < -1000).all() and (p[:, size:] < -1000).all()

    def test_symmetry_transform_roundtrip(self):
        n = 9
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, n, n, 43))
        p = jax.random.uniform(jax.random.PRNGKey(1), (2, n * n + 1))
        for sym in range(8):
            xr = S.inverse_transform_planes(S.transform_planes(x, sym), sym)
            np.testing.assert_allclose(np.asarray(xr), np.asarray(x))
            pr = S.inverse_transform_policy(S.transform_policy(p, sym, n), sym, n)
            np.testing.assert_allclose(np.asarray(pr), np.asarray(p))

    def test_train_mode_updates_batch_stats(self):
        n = 5
        cfg = tiny_cfg(n, stack=("ResidualBlock",))
        net = SayuriNet(cfg)
        x = fake_planes(jax.random.PRNGKey(0), 4, n)
        variables = net.init(jax.random.PRNGKey(1), x, train=False)
        out, mutated = net.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        before = jax.tree.leaves(variables["batch_stats"])
        after = jax.tree.leaves(mutated["batch_stats"])
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(before, after)
        )
        assert changed
