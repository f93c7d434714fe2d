"""GTP v2 front-end (the reference's gtp.cc re-designed as a thin host loop
over the jitted engine)."""

from sayuri_tpu.gtp.engine import Agent
from sayuri_tpu.gtp.loop import GtpLoop
