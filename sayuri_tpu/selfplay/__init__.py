"""Vectorized self-play actor + training data pipeline."""

from sayuri_tpu.selfplay.actor import SelfplayActor, SelfplayConfig
