"""Option store: CLI flags + config files.

Re-design of the reference's ArgsParser / option map
(/root/reference/src/config.cc:21-133, utils/option.h): a typed flat
option dict with defaults and bounds, fed by CLI flags and `--config FILE`
files using the same syntax (one `--flag value` pair per line, `#`
comments, config.cc:344-372). Multi-valued options (`--selfplay-query`)
accumulate into lists.
"""

from __future__ import annotations

import dataclasses
import shlex
from typing import Any


@dataclasses.dataclass
class Opt:
    default: Any
    lo: Any = None
    hi: Any = None
    multi: bool = False


# Option registry: names follow the reference (config.cc:21-133).
OPTIONS: dict[str, Opt] = {
    "mode": Opt("gtp"),
    "boardsize": Opt(19, 2, 25),
    "komi": Opt(7.5, -150.0, 150.0),
    "scoring_rule": Opt("area"),
    "playouts": Opt(400, 1, 100000000),
    "const_time": Opt(0, 0, 1000000),
    "batch_size": Opt(0, 0, 4096),
    "weights_file": Opt(""),
    "weights_dir": Opt(""),
    "quiet": Opt(False),
    "analysis_verbose": Opt(False),
    "reuse_tree": Opt(True),
    "ponder": Opt(False),
    "resign_threshold": Opt(0.1, 0.0, 1.0),
    # time-management extras (config.cc:81,113-114) and the opening book
    # (--book, config.cc:54,795)
    "lag_buffer": Opt(0.0, 0.0, 60.0),
    "kldgain_per_node": Opt(0.0, 0.0, 100.0),
    "kldgain_interval": Opt(0, 0, 1 << 30),
    "book_file": Opt(""),
    # NN eval cache entries per search lane (the reference sizes its cache
    # in MiB, --cache-memory-mib, network.cc:102-121; here the unit is
    # entries because the store is dense device arrays). 0 disables.
    "nn_cache_size": Opt(512, 0, 1 << 20),
    # legacy pattern system (config.cc:55,77)
    "patterns_file": Opt(""),
    "gammas_policy_factor": Opt(0.0, 0.0, 1.0),
    # MC-rollout ownership fallback (config.cc:88, rollout.h)
    "use_rollout": Opt(False),
    # endgame score bonus (config.cc:120, node.cc:813-869)
    "first_pass_bonus": Opt(False),
    # search knobs (parameters.h:14-84)
    "cpuct_init": Opt(0.5),
    "cpuct_base": Opt(19652.0),
    "cpuct_base_factor": Opt(1.0),
    "cpuct_dynamic": Opt(True),
    "fpu_reduction": Opt(0.25),
    "root_fpu_reduction": Opt(0.25),
    "score_utility_factor": Opt(0.1),
    "score_utility_div": Opt(20.0),
    "lcb_reduction": Opt(0.02, 0.0, 1.0),
    "forced_playouts_k": Opt(0.0),
    "gumbel": Opt(False),
    "gumbel_c_visit": Opt(50.0),
    "gumbel_c_scale": Opt(1.0),
    "gumbel_considered_moves": Opt(16),
    "always_completed_q_policy": Opt(False),
    "dirichlet_noise": Opt(False),
    "dirichlet_epsilon": Opt(0.25),
    "dirichlet_init": Opt(0.03),
    "dirichlet_factor": Opt(361.0),
    # selfplay (config.cc:95-128)
    "selfplay_query": Opt("", multi=True),
    "num_games": Opt(0, 0, 10000000),
    "parallel_games": Opt(32, 1, 4096),
    "random_moves_factor": Opt(0.0),
    "random_moves_temp": Opt(1.0, 0.0, 100.0),
    "random_fastsearch_prob": Opt(0.0, 0.0, 1.0),
    "komi_stddev": Opt(0.0),
    "komi_big_stddev": Opt(0.0),
    "komi_big_stddev_prob": Opt(0.0, 0.0, 1.0),
    "handicap_fair_komi_prob": Opt(0.0, 0.0, 1.0),
    "fastsearch_playouts": Opt(0),
    "fastsearch_playouts_prob": Opt(0.0, 0.0, 1.0),
    "resign_playouts": Opt(0),
    "resign_discard_prob": Opt(0.0, 0.0, 1.0),
    "target_directory": Opt(""),
    # benchmark
    "benchmark_query": Opt("", multi=True),
}

# reference CLI spellings that differ from the option name (config.cc)
_ALIASES = {
    "book": "book_file",
    "patterns": "patterns_file",
    "weights": "weights_file",
    "board_size": "boardsize",
    "noise": "dirichlet_noise",
    "reduce_playouts": "fastsearch_playouts",
    "reduce_playouts_prob": "fastsearch_playouts_prob",
}


class Options:
    def __init__(self):
        self._vals: dict[str, Any] = {}
        for k, o in OPTIONS.items():
            self._vals[k] = list() if o.multi else o.default

    def get(self, name):
        return self._vals[name]

    def set(self, name, value):
        o = OPTIONS[name]
        ref = o.default
        if isinstance(ref, bool):
            if isinstance(value, str):
                value = value.lower() in ("1", "true", "yes", "on")
        elif isinstance(ref, int):
            value = int(value)
        elif isinstance(ref, float):
            value = float(value)
        if o.lo is not None and not isinstance(ref, str):
            value = max(o.lo, min(o.hi, value))
        if o.multi:
            self._vals[name].append(value)
        else:
            self._vals[name] = value

    def parse_args(self, argv):
        """Parse `--flag [value]` pairs; `--config FILE` loads more flags
        with the same syntax (# comments), like config.cc:344-372."""
        i = 0
        while i < len(argv):
            tok = argv[i]
            if not tok.startswith("--"):
                raise ValueError(f"unexpected token {tok!r}")
            name = tok[2:].replace("-", "_")
            name = _ALIASES.get(name, name)
            if name == "config":
                self.parse_file(argv[i + 1])
                i += 2
                continue
            if name not in OPTIONS:
                raise ValueError(f"unknown option --{tok[2:]}")
            o = OPTIONS[name]
            if isinstance(o.default, bool) and (
                i + 1 >= len(argv) or argv[i + 1].startswith("--")
            ):
                self._vals[name] = True
                i += 1
            else:
                self.set(name, argv[i + 1])
                i += 2
        return self

    def parse_file(self, path):
        with open(path) as f:
            toks = []
            for line in f:
                line = line.split("#", 1)[0].strip()
                if line:
                    toks.extend(shlex.split(line))
        self.parse_args(toks)
        return self

    def search_config(self, max_nodes=None, **over):
        from sayuri_tpu.mcts.core import SearchConfig

        g = self.get
        return SearchConfig(
            max_nodes=max_nodes or (g("playouts") + 32),
            cpuct_init=g("cpuct_init"),
            cpuct_base=g("cpuct_base"),
            cpuct_base_factor=g("cpuct_base_factor"),
            cpuct_dynamic=g("cpuct_dynamic"),
            fpu_reduction=g("fpu_reduction"),
            root_fpu_reduction=g("root_fpu_reduction"),
            score_utility_factor=g("score_utility_factor"),
            score_utility_div=g("score_utility_div"),
            lcb_reduction=g("lcb_reduction"),
            forced_playouts_k=g("forced_playouts_k"),
            gumbel=g("gumbel"),
            gumbel_c_visit=g("gumbel_c_visit"),
            gumbel_c_scale=g("gumbel_c_scale"),
            gumbel_considered_moves=g("gumbel_considered_moves"),
            dirichlet_noise=g("dirichlet_noise"),
            dirichlet_epsilon=g("dirichlet_epsilon"),
            dirichlet_init=g("dirichlet_init"),
            dirichlet_factor=g("dirichlet_factor"),
            nn_cache_size=g("nn_cache_size"),
            first_pass_bonus=g("first_pass_bonus"),
            **over,
        )

    def selfplay_config(self):
        from sayuri_tpu.selfplay.actor import SelfplayConfig

        g = self.get
        return SelfplayConfig(
            playouts=g("playouts"),
            fastsearch_playouts=g("fastsearch_playouts"),
            fastsearch_playouts_prob=g("fastsearch_playouts_prob"),
            resign_threshold=g("resign_threshold"),
            resign_playouts=g("resign_playouts"),
            resign_discard_prob=g("resign_discard_prob"),
            random_moves_factor=g("random_moves_factor"),
            random_moves_temp=g("random_moves_temp"),
            random_fastsearch_prob=g("random_fastsearch_prob"),
            komi_stddev=g("komi_stddev"),
            komi_big_stddev=g("komi_big_stddev"),
            komi_big_stddev_prob=g("komi_big_stddev_prob"),
        )
