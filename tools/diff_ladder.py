"""Differential debug harness: vectorized ladder chases vs the Python
oracle (tests/ladder_oracle.py), per candidate chain, on golden games.

Usage: python tools/diff_ladder.py [size] [stride]
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "tests")
from ladder_oracle import OBoard, is_ladder  # noqa: E402

import sayuri_tpu.game.board as B  # noqa: E402
from sayuri_tpu.game import ladder as L  # noqa: E402
from sayuri_tpu.game.state import GoEnv  # noqa: E402
from sayuri_tpu.ops import ladder_kernel as LK  # noqa: E402


def lane_results(stones, size, ko):
    """Replicates ladder_planes_batch's lane assembly, returns raw
    per-(board, candidate, branch) chase results + prep arrays."""
    b, n = stones.shape[0], stones.shape[-1]
    prep = jax.vmap(L._prep_candidates)(stones, size, ko)
    M = L.max_chains(n)
    cand_v = prep["cand_v"]
    valid = cand_v >= 0
    nlibs = prep["nlibs"]
    color = prep["color"]
    l1, l2 = prep["l1"], prep["l2"]
    legal_a, legal_b = prep["legal_a"], prep["legal_b"]

    mask_b = jax.vmap(lambda z: B.board_mask(z, n))(size)
    bwords = LK.pack_bitboards((stones == 1) & mask_b)
    wwords = LK.pack_bitboards((stones == 2) & mask_b)
    own = jnp.where((color == 0)[:, :, None], bwords[:, None], wwords[:, None])
    opp = jnp.where((color == 0)[:, :, None], wwords[:, None], bwords[:, None])
    fh0 = jnp.where(nlibs == 1, -1, l1)
    ok0 = valid & ((nlibs == 1) | ((nlibs == 2) & legal_a))
    fh1 = l2
    ok1 = valid & (nlibs == 2) & legal_b

    own2 = jnp.broadcast_to(own[:, :, None], (b, M, 2, LK.ROWS)).reshape(
        b * M * 2, LK.ROWS
    )
    opp2 = jnp.broadcast_to(opp[:, :, None], (b, M, 2, LK.ROWS)).reshape(
        b * M * 2, LK.ROWS
    )
    size_l = jnp.broadcast_to(size[:, None, None], (b, M, 2)).reshape(-1)
    ko_l = jnp.broadcast_to(ko[:, None, None], (b, M, 2)).reshape(-1)
    prey_l = jnp.broadcast_to(
        jnp.maximum(cand_v, 0)[:, :, None], (b, M, 2)
    ).reshape(-1)
    fh_l = jnp.stack([fh0, fh1], axis=2).reshape(-1)
    ok_l = jnp.stack([ok0, ok1], axis=2).reshape(-1).astype(jnp.int32)
    res = LK.run_chases_xla(
        own2, opp2, size_l, ko_l, prey_l, fh_l, ok_l, n
    ).reshape(b, M, 2)
    return res, prep, ok0, ok1


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    stride = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    data = json.load(open(f"tests/goldens/go_goldens_{size}.json"))
    records = data["records"][::stride]
    env = GoEnv(n=size)
    step = jax.jit(env.step)
    states = []
    for r in records:
        s = env.new_state(size=None, komi=data["komi"])
        for mv in r["moves"]:
            a = env.pass_action if mv == "pass" else int(mv)
            s = step(s, a)
        states.append(s)
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    res, prep, ok0, ok1 = jax.jit(lane_results)(
        batch.stones, batch.size, batch.ko
    )
    res = np.asarray(res)
    cand_v = np.asarray(prep["cand_v"])
    nlibs = np.asarray(prep["nlibs"])
    l1 = np.asarray(prep["l1"])
    l2 = np.asarray(prep["l2"])
    ok0 = np.asarray(ok0)
    ok1 = np.asarray(ok1)

    nbad = 0
    for i, s in enumerate(states):
        stones_f = np.asarray(s.stones).reshape(-1).tolist()
        ko = int(s.ko)
        b = OBoard(stones_f, size, ko)
        for m in range(L.max_chains(size)):
            v = int(cand_v[i, m])
            if v < 0:
                continue
            ok, vital = is_ladder(b.copy(), v)
            nl = int(nlibs[i, m])
            if nl == 1:
                kvital = [int(l1[i, m])] if (ok0[i, m] and res[i, m, 0] == 2) else []
            else:
                kvital = []
                if ok0[i, m] and res[i, m, 0] == 2:
                    kvital.append(int(l1[i, m]))
                if ok1[i, m] and res[i, m, 1] == 2:
                    kvital.append(int(l2[i, m]))
            kok = bool(kvital)
            if (kok, sorted(kvital)) != (ok, sorted(vital)):
                nbad += 1
                print(
                    f"rec {i} cand {m} v={v} nl={nl} "
                    f"oracle=({ok},{sorted(vital)}) kernel=({kok},{sorted(kvital)}) "
                    f"l1={int(l1[i, m])} l2={int(l2[i, m])} "
                    f"ok=({bool(ok0[i, m])},{bool(ok1[i, m])}) ko={ko}"
                )
                if nbad >= 25:
                    print("...(truncated)")
                    return
    print("total bad:", nbad)


if __name__ == "__main__":
    main()
