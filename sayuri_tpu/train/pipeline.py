"""Training pipeline: pjit data-parallel learner with SWA and checkpoints.

Re-design of the reference TrainingPipe (/root/reference/train/torch/
train.py:233-708) for TPU:

- torch DataParallel -> params replicated + batch sharded over a
  jax.sharding.Mesh; XLA inserts gradient all-reduces over ICI
- SGD + Nesterov momentum + weight decay (train.py:328-343) via optax
- step-schedule LR with linear warmup (train.py:369-380)
- gradient clipping by global norm (clip 10000, train.py:665)
- macro-batch gradient accumulation (train.py:665-675)
- SWA running average of params, count-capped (network.py:1352-1365)
- checkpoint/resume with steps/samples metadata (train.py:382-433);
  NaN-loss abort (train.py:660-663)
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
import time
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from sayuri_tpu.models.network import NetConfig, SayuriNet
from sayuri_tpu.parallel import mesh as M
from sayuri_tpu.train.loss import compute_loss


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Learner knobs (the Train block of the reference's setting.json,
    bash/CONFIG.md)."""

    optimizer: str = "SGD"
    batch_size: int = 256
    macro_factor: int = 1          # gradient accumulation steps
    weight_decay: float = 1e-4
    lr_schedule: tuple = ((0, 5e-3),)
    warmup_steps: int = 0
    grad_clip: float = 10000.0
    swa_max_count: int = 16
    swa_steps: int = 100
    soft_loss_weight: float = 0.1


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    swa_params: Any
    swa_count: jnp.ndarray   # () int32
    steps: jnp.ndarray       # () int32
    samples: jnp.ndarray     # () int64-ish int32


def lr_at(cfg: TrainConfig, steps):
    """Step schedule + linear warmup (train.py:369-380)."""
    lr = cfg.lr_schedule[0][1]
    for s, v in cfg.lr_schedule:
        lr = jnp.where(steps >= s, v, lr)
    if cfg.warmup_steps > 0:
        lr = lr * jnp.minimum(
            1.0, (steps + 1.0) / cfg.warmup_steps
        )
    return lr


class Trainer:
    def __init__(
        self,
        net_cfg: NetConfig,
        cfg: TrainConfig,
        mesh=None,
        seed: int = 0,
    ):
        self.net_cfg = net_cfg
        self.cfg = cfg
        self.net = SayuriNet(net_cfg)
        self.mesh = mesh if mesh is not None else M.make_mesh()

        n = net_cfg.boardsize
        dummy = jnp.zeros((2, n, n, net_cfg.input_channels))
        dummy = dummy.at[..., -1].set(1.0)
        variables = self.net.init(jax.random.PRNGKey(seed), dummy, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        self.tx = self._make_optimizer()
        state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            swa_params=jax.tree.map(jnp.copy, params),
            swa_count=jnp.zeros((), jnp.int32),
            steps=jnp.zeros((), jnp.int32),
            samples=jnp.zeros((), jnp.int32),
        )
        self.state = M.replicate(self.mesh, state)
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    def _make_optimizer(self):
        cfg = self.cfg

        def lr_fn(step):
            return lr_at(cfg, step)

        if cfg.optimizer.lower() == "adam":
            opt = optax.adamw(lr_fn, weight_decay=cfg.weight_decay)
        else:
            opt = optax.chain(
                optax.add_decayed_weights(cfg.weight_decay),
                optax.sgd(lr_fn, momentum=0.9, nesterov=True),
            )
        tx = optax.chain(
            optax.clip_by_global_norm(self.cfg.grad_clip), opt
        )
        if cfg.macro_factor > 1:
            # macro-batch gradient accumulation (train.py:665-675)
            tx = optax.MultiSteps(tx, every_k_schedule=cfg.macro_factor)
        return tx

    # ------------------------------------------------------------------

    def _build_train_step(self):
        net, cfg, tx = self.net, self.cfg, self.tx

        def step_fn(state: TrainState, planes, targets):
            def loss_fn(params):
                outputs, mutated = net.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    planes,
                    train=True,
                    mutable=["batch_stats"],
                )
                mask = planes[..., -1:]
                loss, parts = compute_loss(
                    outputs, targets, mask, cfg.soft_loss_weight
                )
                return loss, (parts, mutated["batch_stats"])

            (loss, (parts, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, new_opt = tx.update(
                grads, state.opt_state, state.params,
            )
            new_params = optax.apply_updates(state.params, updates)

            # SWA running average every swa_steps (network.py:1352-1365):
            # weight = 1/(1+min(count, max)), count increments
            new_steps = state.steps + 1
            do_swa = (new_steps % cfg.swa_steps) == 0
            swa_count = jnp.minimum(state.swa_count + 1, cfg.swa_max_count)
            w = 1.0 / (1.0 + jnp.minimum(state.swa_count, cfg.swa_max_count))
            swa_params = jax.tree.map(
                lambda s, p: jnp.where(do_swa, s + w * (p - s), s),
                state.swa_params,
                new_params,
            )
            new_state = state.replace(
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
                swa_params=swa_params,
                swa_count=jnp.where(do_swa, swa_count, state.swa_count),
                steps=new_steps,
                samples=state.samples + planes.shape[0],
            )
            return new_state, parts

        batch_sh = M.batch_spec(self.mesh)
        rep_sh = M.replicated_spec(self.mesh)
        return jax.jit(
            step_fn,
            in_shardings=(rep_sh, batch_sh, batch_sh),
            out_shardings=(rep_sh, rep_sh),
            donate_argnums=(0,),
        )

    def _build_eval_step(self):
        net, cfg = self.net, self.cfg

        def eval_fn(state: TrainState, planes, targets):
            outputs = net.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                planes,
                train=False,
            )
            mask = planes[..., -1:]
            _, parts = compute_loss(outputs, targets, mask, cfg.soft_loss_weight)
            return parts

        batch_sh = M.batch_spec(self.mesh)
        rep_sh = M.replicated_spec(self.mesh)
        return jax.jit(
            eval_fn, in_shardings=(rep_sh, batch_sh, batch_sh)
        )

    # ------------------------------------------------------------------

    def train_batch(self, planes, targets):
        """One optimizer step on a host numpy batch; returns loss parts.
        Raises on NaN loss (train.py:660-663)."""
        planes = M.shard_batch(self.mesh, jnp.asarray(planes))
        targets = M.shard_batch(
            self.mesh, jax.tree.map(jnp.asarray, targets)
        )
        self.state, parts = self._train_step(self.state, planes, targets)
        loss = float(parts["loss"])
        if not np.isfinite(loss):
            raise FloatingPointError(f"NaN/inf loss at step {int(self.state.steps)}")
        return {k: float(v) for k, v in parts.items()}

    def eval_batch(self, planes, targets):
        planes = M.shard_batch(self.mesh, jnp.asarray(planes))
        targets = M.shard_batch(self.mesh, jax.tree.map(jnp.asarray, targets))
        parts = self._eval_step(self.state, planes, targets)
        return {k: float(v) for k, v in parts.items()}

    # ------------------------------------------------------------------
    # checkpointing (train.py:382-433 semantics, flax serialization)
    # ------------------------------------------------------------------

    def checkpoint_name(self, num_chunks=None, window=None) -> str:
        """Reference weight naming: <name>-s{steps}-c{chunks}[-w{window}]
        (train.py:409-412)."""
        blocks = len(self.net_cfg.stack)
        ch = self.net_cfg.residual_channels
        name = f"sayuri-tpu-b{blocks}xc{ch}-s{int(self.state.steps)}"
        if num_chunks is not None:
            name += f"-c{num_chunks}"
        if window is not None:
            name += f"-w{window}"
        return name

    def unreplicated_params(self):
        return jax.tree.map(np.asarray, self.state.params)

    def unreplicated_swa_params(self):
        return jax.tree.map(np.asarray, self.state.swa_params)

    def unreplicated_batch_stats(self):
        return jax.tree.map(np.asarray, self.state.batch_stats)

    def save_checkpoint(self, path: str, extra: dict | None = None):
        from flax import serialization

        host_state = jax.tree.map(np.asarray, self.state)
        blob = {
            "state": serialization.to_bytes(host_state),
            "net_cfg": dataclasses.asdict(self.net_cfg),
            "train_cfg": dataclasses.asdict(self.cfg),
            "extra": extra or {},
        }
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(blob, f)
        os.replace(tmp, path)

    def load_checkpoint(self, path: str):
        from flax import serialization

        with open(path, "rb") as f:
            blob = pickle.load(f)
        host_state = jax.tree.map(np.asarray, self.state)
        restored = serialization.from_bytes(host_state, blob["state"])
        self.state = M.replicate(self.mesh, restored)
        return blob.get("extra", {})

    @staticmethod
    def latest_checkpoint(ckpt_dir: str):
        files = sorted(
            Path(ckpt_dir).glob("*.ckpt"), key=os.path.getmtime
        )
        return str(files[-1]) if files else None
