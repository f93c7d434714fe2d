"""Weight-file interop tests: export -> import round-trip must reproduce
identical network outputs (the engine<->trainer file contract,
loader.cc:26-183 / network.py:1399-1481)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sayuri_tpu.models.network import NetConfig, SayuriNet
from sayuri_tpu.models import weights_io as W


def build(n=5, stack=("ResidualBlock", "ResidualBlock-SE")):
    cfg = NetConfig(
        boardsize=n,
        residual_channels=16,
        stack=stack,
        se_ratio=2,
        policy_head_channels=8,
        value_head_channels=8,
    )
    net = SayuriNet(cfg)
    x = jnp.zeros((2, n, n, 43))
    x = x.at[..., 42].set(1.0)
    x = x + jax.random.uniform(jax.random.PRNGKey(3), x.shape) * x[..., 42:43]
    x = x.at[..., 42].set(1.0)
    variables = net.init(jax.random.PRNGKey(1), x, train=False)
    return cfg, net, variables, x


@pytest.mark.parametrize("binary", [True, False])
def test_roundtrip_identical_outputs(tmp_path, binary):
    cfg, net, variables, x = build()
    path = str(tmp_path / "w.bin.txt")
    W.export_reference_weights(cfg, variables, path, binary=binary)

    cfg2, imported = W.import_reference_weights(path)
    assert tuple(cfg2.stack) == tuple(cfg.stack)
    cfg2, merged, net2 = W.finalize_imported_variables(
        cfg2, imported, boardsize=cfg.boardsize
    )

    o1 = net.apply(variables, x, train=False)
    o2 = net2.apply(merged, x, train=False)
    for k in ("prob", "wdl", "ownership", "scores", "q_vals"):
        np.testing.assert_allclose(
            np.asarray(o1[k]), np.asarray(o2[k]), atol=2e-4,
            err_msg=f"head {k} mismatch after weight round-trip",
        )


def test_mixer_and_replk_roundtrip(tmp_path):
    n = 5
    cfg = NetConfig(
        boardsize=n,
        residual_channels=16,
        stack=("MixerBlock", "NestedBottleneckBlock"),
        se_ratio=2,
        policy_head_channels=8,
        value_head_channels=8,
        policy_head_type="RepLK",
    )
    net = SayuriNet(cfg)
    x = jnp.zeros((1, n, n, 43)).at[..., 42].set(1.0)
    variables = net.init(jax.random.PRNGKey(2), x, train=False)
    path = str(tmp_path / "w2.bin.txt")
    W.export_reference_weights(cfg, variables, path, binary=True)
    cfg2, imported = W.import_reference_weights(path)
    cfg2, merged, net2 = W.finalize_imported_variables(
        cfg2, imported, boardsize=n
    )
    o1 = net.apply(variables, x, train=False)
    o2 = net2.apply(merged, x, train=False)
    np.testing.assert_allclose(
        np.asarray(o1["prob"]), np.asarray(o2["prob"]), atol=2e-4
    )
