"""Array-based batched MCTS (the TPU-native replacement for the reference's
thread-parallel pointer-tree search, /root/reference/src/mcts/)."""

from sayuri_tpu.mcts.core import MCTS, SearchConfig, Tree, NetEvals
