"""Multi-host selfplay e2e: a REAL 2-process jax.distributed CPU job
running the actual SelfPlayPipe (SURVEY.md §2.10 P3/P7):

- lanes shard over a 2-host global mesh (2 local devices each)
- round 1 plays with the dummy net and each host writes ITS OWN chunk
  files (per-host run ids, pipe.cc:246-258 protocol)
- host 0 then drops a real checkpoint into weights_dir; both hosts see
  should_reload(), rebuild the actor, and the weights ride
  broadcast_from_host0 (learner -> actor refresh mid-run)
- round 2 plays with the loaded net and both hosts write again
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; work = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["SAYURI_COORDINATOR"] = f"localhost:{port}"
os.environ["SAYURI_NUM_PROCS"] = "2"
os.environ["SAYURI_PROC_ID"] = str(pid)
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from pathlib import Path
from sayuri_tpu.parallel import distributed as DI

assert DI.initialize_from_env()
assert jax.process_count() == 2 and jax.device_count() == 4
mesh = DI.global_mesh()

from sayuri_tpu.mcts.core import SearchConfig
from sayuri_tpu.selfplay.actor import SelfplayConfig
from sayuri_tpu.selfplay.pipe import SelfPlayPipe

weights_dir = Path(work) / "weights"
weights_dir.mkdir(exist_ok=True)
out_dir = Path(work) / "out"

pipe = SelfPlayPipe(
    out_dir=str(out_dir),
    boardsize=5,
    komi=6.5,
    parallel_games=4,                      # global: 1 lane per device
    search_cfg=SearchConfig(max_nodes=24, gumbel=True),
    sp_cfg=SelfplayConfig(
        playouts=8, fastsearch_playouts=4, random_moves_factor=0.0
    ),
    weights_dir=str(weights_dir),
    seed=3,
    mesh=mesh,
)
assert pipe.current_weights is None
n1 = pipe.play_round()
assert n1 > 0, "round 1 wrote no games"

# learner step: host 0 publishes a checkpoint (built host-locally —
# a Trainer would lay state out over the GLOBAL mesh and its device_puts
# would be collectives host 1 does not mirror)
if pid == 0:
    import dataclasses, pickle
    import jax.numpy as jnp
    from flax import serialization
    from sayuri_tpu.models.network import NetConfig, SayuriNet

    net_cfg = NetConfig(
        boardsize=5,
        residual_channels=8,
        stack=("ResidualBlock",),
        policy_head_channels=4,
        value_head_channels=4,
    )
    net = SayuriNet(net_cfg)
    dummy = jnp.zeros((1, 5, 5, net_cfg.input_channels), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), dummy, train=False)
    blob = {
        "state": serialization.msgpack_serialize(
            jax.tree.map(
                np.asarray,
                {
                    "params": variables["params"],
                    "batch_stats": variables["batch_stats"],
                },
            )
        ),
        "net_cfg": dataclasses.asdict(net_cfg),
    }
    tmp = weights_dir / "net_0001.ckpt.tmp"
    with open(tmp, "wb") as f:
        pickle.dump(blob, f)
    os.replace(tmp, weights_dir / "net_0001.ckpt")

# barrier so host 1 sees the file only when it is complete
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("weights_published")

assert pipe.should_reload(), "new weights not detected"
pipe._build_actor()
assert pipe.current_weights and pipe.current_weights.endswith("net_0001.ckpt")
n2 = pipe.play_round()
assert n2 > 0, "round 2 wrote no games"

# each host wrote its own chunks under its own run id
run_dirs = sorted(p.name for p in (out_dir / "tdata").iterdir())
mine = [d for d in run_dirs if d.endswith(f"p{pid}")]
assert mine, (pid, run_dirs)
files = list((out_dir / "tdata" / mine[0]).glob("*.txt.gz"))
assert files, mine
print(f"OK proc {pid} rounds={n1}+{n2} run={mine[0]}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_selfplay_e2e(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port),
             str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=repo,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("selfplay worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert f"OK proc {pid}" in out
