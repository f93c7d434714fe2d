"""Input-plane encoder (v2, 43 channels).

Pure function of a GoState producing the network input, matching the
reference's Encoder::GetPlanes v2 layout exactly
(/root/reference/src/neural/encoder.h:20-55, encoder.cc:31-369):

  planes  0-23 : 8 history steps x (to-move stones, opponent stones,
                 one-hot last move), most recent first; steps beyond the
                 game start stay zero (encoder.cc:136-161)
  plane     24 : ko vertex one-hot
  planes 25-28 : area features, zero under territory rule (encoder.cc:193-222):
                 [safe & mine, safe & theirs, owner mine, owner theirs]
                 where safe = both colors' pass-alive/pass-dead area and
                 owner = score-area ownership
  planes 29-32 : stones whose chain has exactly 1 / 2 / 3 / 4 liberties
  planes 33-36 : ladder features [death, escapable, atari, take]
  plane     37 : scoring rule (0 area / 1 territory)
  plane     38 : wave (drawable-komi dither)
  plane     39 : komi/20   (komi-with-penalty, negated for white to move)
  plane     40 : -komi/20
  plane     41 : intersections/361
  plane     42 : ones

Output is NHWC ([n, n, 43]) — channels-last is the natural TPU layout.
Off-board cells are zero everywhere (the reference zero-pads small boards
into the network buffer, batch_forward_pipe.cc:12-33).
"""

from __future__ import annotations

import jax.numpy as jnp

from sayuri_tpu.game import analysis as A
from sayuri_tpu.game import board as B
from sayuri_tpu.game.state import GoEnv, GoState, HISTORY_LEN
from sayuri_tpu.game.types import AREA_RULE, EMPTY

NUM_PLANES = 43


def encode(
    env: GoEnv,
    state: GoState,
    ladder_planes=None,
    libs_map=None,
    safe_map=None,
    score_own_map=None,
) -> jnp.ndarray:
    """[n, n, NUM_PLANES] float32 input planes for one state (vmap me).

    `ladder_planes`: optional precomputed [n, n, 4] ladder features (plugged
    in separately because ladder search is the most expensive analysis;
    callers may disable it). Defaults to the engine's ladder module.
    `libs_map`: optional precomputed [n, n] per-chain liberty counts
    (capped >= 4) from the Pallas analysis kernel (ops/analysis.py).
    """
    n = env.n
    mask = B.board_mask(state.size, n)
    maskf = mask.astype(jnp.float32)
    to_move = state.to_move
    own_c = to_move + 1
    opp_c = 2 - to_move

    planes = []

    # --- history: 24 planes (encoder.cc:136-161) ---
    past = jnp.minimum(state.move_count + 1, HISTORY_LEN)
    flat = B.flat_iota(n)
    for p in range(HISTORY_LEN):
        hboard = state.history[p] if p > 0 else state.stones
        valid = (p < past).astype(jnp.float32)
        own = ((hboard == own_c) & mask).astype(jnp.float32) * valid
        opp = ((hboard == opp_c) & mask).astype(jnp.float32) * valid
        mv = state.last_moves[p]
        mv_plane = ((flat == mv) & mask).astype(jnp.float32) * valid
        planes += [own, opp, mv_plane]

    # --- ko (encoder.cc:163-174) ---
    planes.append(((flat == state.ko) & mask).astype(jnp.float32))

    # --- area x4 (encoder.cc:176-223); zero under territory scoring ---
    is_area = (state.rule == AREA_RULE).astype(jnp.float32)
    if safe_map is None or score_own_map is None:
        safe, owner = A.safe_and_ownership(state.stones, state.size)
    else:
        safe, owner = safe_map, score_own_map
    mine_val = jnp.where(to_move == 0, 1, -1)
    owner_mine = owner == mine_val
    owner_theirs = owner == -mine_val
    planes.append((safe & owner_mine).astype(jnp.float32) * is_area)
    planes.append((safe & owner_theirs).astype(jnp.float32) * is_area)
    planes.append(owner_mine.astype(jnp.float32) * is_area)
    planes.append(owner_theirs.astype(jnp.float32) * is_area)

    # --- liberties 1..4 (encoder.cc:225-246) ---
    stones_any = (state.stones != EMPTY) & mask
    if libs_map is None:
        empty = (state.stones == EMPTY) & mask
        lbl_b = B.chain_labels((state.stones == 1) & mask)
        lbl_w = B.chain_labels((state.stones == 2) & mask)
        libs = B.chain_liberty_map(
            (state.stones == 1) & mask, lbl_b, empty
        ) + B.chain_liberty_map((state.stones == 2) & mask, lbl_w, empty)
    else:
        libs = libs_map
    for k in (1, 2, 3, 4):
        planes.append((stones_any & (libs == k)).astype(jnp.float32))

    # --- ladders x4 (encoder.cc:248-265) ---
    if ladder_planes is None:
        from sayuri_tpu.game import ladder as L

        ladder_planes = L.ladder_planes(state.stones, state.size, state.ko)
    for k in range(4):
        planes.append(ladder_planes[..., k].astype(jnp.float32))

    # --- misc x6 (encoder.cc:267-320) ---
    env_wave = env.wave(state)
    komi = env.komi_with_penalty(state)
    komi = jnp.where(to_move == 1, -komi, komi)
    planes.append(maskf * (state.rule != AREA_RULE).astype(jnp.float32))
    planes.append(maskf * env_wave)
    planes.append(maskf * (komi / 20.0))
    planes.append(maskf * (-komi / 20.0))
    planes.append(
        maskf * (state.size * state.size).astype(jnp.float32) / 361.0
    )
    planes.append(maskf)

    return jnp.stack(planes, axis=-1)
