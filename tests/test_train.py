"""Trainer tests: loss sanity, a real train step on the 8-device CPU mesh,
SWA, checkpoint round-trip, and dataset parsing round-trip through the
self-play chunk writer."""

import os
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sayuri_tpu.models.network import NetConfig
from sayuri_tpu.train.pipeline import TrainConfig, Trainer
from sayuri_tpu.train import dataset as DS


def tiny_net(n=5):
    return NetConfig(
        boardsize=n,
        residual_channels=16,
        stack=("ResidualBlock",),
        policy_head_channels=8,
        value_head_channels=8,
    )


def fake_batch(rng, b, n):
    hw = n * n
    planes = rng.rand(b, n, n, 43).astype(np.float32)
    planes[..., 42] = 1.0
    prob = rng.rand(b, hw + 1).astype(np.float32)
    prob /= prob.sum(-1, keepdims=True)
    aux = rng.rand(b, hw + 1).astype(np.float32)
    aux /= aux.sum(-1, keepdims=True)
    wdl = np.zeros((b, 3), np.float32)
    wdl[np.arange(b), rng.randint(0, 3, b)] = 1.0
    targets = {
        "prob": prob,
        "aux_prob": aux,
        "ownership": rng.choice([-1.0, 0.0, 1.0], (b, hw)).astype(np.float32),
        "wdl": wdl,
        "q_vals": rng.uniform(-1, 1, (b, 5)).astype(np.float32),
        "scores": rng.uniform(-10, 10, (b, 5)).astype(np.float32),
        "global_weight": np.ones(b, np.float32),
    }
    return planes, targets


class TestTrainer:
    def test_train_step_decreases_loss(self):
        n = 5
        trainer = Trainer(
            tiny_net(n),
            TrainConfig(batch_size=8, lr_schedule=((0, 0.02),), swa_steps=2),
        )
        rng = np.random.RandomState(0)
        planes, targets = fake_batch(rng, 8, n)
        first = trainer.train_batch(planes, targets)
        for _ in range(12):
            last = trainer.train_batch(planes, targets)
        assert last["loss"] < first["loss"], (first["loss"], last["loss"])
        assert int(trainer.state.steps) == 13
        assert int(trainer.state.samples) == 13 * 8
        # SWA accumulated at least once
        assert int(trainer.state.swa_count) >= 1

    def test_mesh_is_multi_device(self):
        trainer = Trainer(tiny_net(), TrainConfig())
        assert trainer.mesh.devices.size == 8  # conftest fake devices

    def test_checkpoint_roundtrip(self, tmp_path):
        n = 5
        trainer = Trainer(tiny_net(n), TrainConfig(batch_size=8))
        rng = np.random.RandomState(1)
        planes, targets = fake_batch(rng, 8, n)
        trainer.train_batch(planes, targets)
        path = str(tmp_path / "test.ckpt")
        trainer.save_checkpoint(path, extra={"run": 1})

        trainer2 = Trainer(tiny_net(n), TrainConfig(batch_size=8))
        extra = trainer2.load_checkpoint(path)
        assert extra["run"] == 1
        assert int(trainer2.state.steps) == 1
        a = jax.tree.leaves(trainer.state.params)
        b = jax.tree.leaves(trainer2.state.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_eval_matches_after_restore(self, tmp_path):
        n = 5
        trainer = Trainer(tiny_net(n), TrainConfig(batch_size=8))
        rng = np.random.RandomState(2)
        planes, targets = fake_batch(rng, 8, n)
        e1 = trainer.eval_batch(planes, targets)
        path = str(tmp_path / "e.ckpt")
        trainer.save_checkpoint(path)
        trainer2 = Trainer(tiny_net(n), TrainConfig(batch_size=8))
        trainer2.load_checkpoint(path)
        e2 = trainer2.eval_batch(planes, targets)
        assert abs(e1["loss"] - e2["loss"]) < 1e-5


class TestDataset:
    def test_window_formula(self):
        # growing window: sublinear growth (train.py:439-445)
        assert DS.compute_window_size(0) == 0
        assert DS.compute_window_size(5000) == 5000
        w = DS.compute_window_size(250000)
        assert 5000 < w < 250000

    @pytest.mark.slow
    def test_parse_roundtrip_via_selfplay_chunks(self, tmp_path):
        from tests.test_selfplay import small_setup
        from sayuri_tpu.selfplay.actor import assemble_targets
        from sayuri_tpu.selfplay import data as D

        env, actor = small_setup()
        states = env.new_batch(2, komi=4.5)
        final, records = actor.play_games(
            states, jax.random.PRNGKey(9), max_moves=40
        )
        targets = assemble_targets(env, final, records)
        games = D.games_to_text(env, records, targets)
        D.write_chunks(games, str(tmp_path), "rt", val_fraction=0.0)

        files = list(tmp_path.glob("tdata/rt/*.txt.gz"))
        assert files
        samples = []
        for f in files:
            for s in DS.read_chunk(f):
                s.parse()
                samples.append(s)
        assert samples
        s = samples[0]
        assert s.board_size == 5
        assert abs(s.prob.sum() - 1.0) < 1e-3
        assert s.result in (-1, 0, 1)

        # wrap into network buffers + batch
        planes, tg = DS.wrap_sample(s, nn_size=5)
        assert planes.shape == (5, 5, 43)
        assert tg["prob"].shape == (26,)
        assert tg["wdl"].sum() == 1.0

    @pytest.mark.slow
    def test_loader_stream(self, tmp_path):
        from tests.test_selfplay import small_setup
        from sayuri_tpu.selfplay.actor import assemble_targets
        from sayuri_tpu.selfplay import data as D

        env, actor = small_setup()
        states = env.new_batch(2, komi=4.5)
        final, records = actor.play_games(
            states, jax.random.PRNGKey(11), max_moves=40
        )
        targets = assemble_targets(env, final, records)
        games = D.games_to_text(env, records, targets)
        D.write_chunks(games, str(tmp_path), "rt", val_fraction=0.0)
        files = list(tmp_path.glob("tdata/rt/*.txt.gz"))

        loader = DS.ChunkLoader(
            files,
            nn_size=5,
            batch_size=4,
            down_sample_rate=1,
            policy_surprise_factor=0.0,
            shuffle_capacity=8,
            loop=False,
            virtual_buffsize=1,
        )
        batches = list(loader)
        assert batches
        planes, tg = batches[0]
        assert planes.shape == (4, 5, 5, 43)
        assert tg["q_vals"].shape == (4, 5)


class TestReferenceSetting:
    """setting.json importer vs the reference's own sample file
    (train/torch/config.py:23-90 schema)."""

    def test_parses_reference_sample(self):
        from sayuri_tpu.train.setting import load_setting

        path = "/root/reference/bash/configs/selfplay-setting.json"
        if not os.path.exists(path):
            pytest.skip("reference not mounted")
        s = load_setting(path)
        assert s.net.boardsize == 19
        assert s.net.residual_channels == 96
        assert s.net.policy_head_channels == 24
        assert s.net.value_head_channels == 24
        assert s.net.activation == "mish"
        assert len(s.net.stack) == 6
        assert s.net.stack[2] == "ResidualBlock-SE"
        assert s.net.renorm_max_r == 3.0
        assert s.net.renorm_max_d == 4.0
        assert s.train.optimizer == "SGD"
        assert s.train.batch_size == 256
        assert s.train.warmup_steps == 20000
        assert s.train.lr_schedule == ((0, 5e-3),)
        assert s.loop.down_sample_rate == 16
        assert s.loop.chunks_increasing_c == 5000
        assert s.loop.policy_surprise_factor == 0.5
        assert s.loop.train_dir == "selfplay/tdata"

    def test_v1_aliases_and_errors(self):
        import json

        from sayuri_tpu.train.setting import load_setting

        base = {
            "NeuralNetwork": {
                "MaxBoardSize": 9,
                "ResidualChannels": 32,
                "PolicyExtract": 8,      # v1~v4 alias
                "ValueExtract": 8,
                "PolicyHeadType": {"Type": "RepLK"},
                "Stack": ["ResidualBlock"],
            },
            "Train": {
                "TrainDirectory": "td",
                "StorePath": "sp",
            },
        }
        s = load_setting(json.dumps(base))
        assert s.net.policy_head_channels == 8
        assert s.net.policy_head_type == "RepLK"

        bad = dict(base)
        bad["Train"] = {"StorePath": "sp"}  # no TrainDirectory
        with pytest.raises(ValueError):
            load_setting(json.dumps(bad))
