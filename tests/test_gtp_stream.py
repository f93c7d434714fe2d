"""Live streaming-analyze session: the REAL GtpLoop.run path with a
reader thread, an unbounded `lz-analyze` search, and input-pending
interruption by the next command (gtp.cc:1166-1214 semantics).

This drives the StreamBody.run branch of GtpLoop.run (loop.py) that the
synchronous `collect()`-based tests never touch: the analysis must keep
emitting info lines while the input queue is empty, stop promptly when a
new command arrives, and the loop must then answer that command.
"""

import queue
import threading
import time

import pytest

from sayuri_tpu.gtp.loop import GtpLoop


class QueueStream:
    """File-like input: iterating blocks on a queue until the sentinel."""

    def __init__(self):
        self.q = queue.Queue()

    def push(self, line):
        self.q.put(line)

    def close(self):
        self.q.put(None)

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is None:
                return
            yield item


class LockedOut:
    def __init__(self):
        self.lock = threading.Lock()
        self.parts = []

    def write(self, text):
        with self.lock:
            self.parts.append(text)

    def flush(self):
        pass

    def text(self):
        with self.lock:
            return "".join(self.parts)


def test_streaming_analyze_interrupted_by_next_command():
    loop = GtpLoop(boardsize=5, komi=4.5, playouts=12, max_nodes=24)
    ins, outs = QueueStream(), LockedOut()
    t = threading.Thread(target=loop.run, args=(ins, outs), daemon=True)
    t.start()

    # unbounded analysis (centisecond interval 1): must stream info lines
    ins.push("lz-analyze b 1\n")
    deadline = time.time() + 240
    while time.time() < deadline:
        if outs.text().count("info move") >= 2:
            break
        time.sleep(0.2)
    else:
        pytest.fail(f"no streamed info lines; got: {outs.text()[:500]!r}")

    # next command arrives while the search is running: input_pending
    # must stop the stream and the command must be answered
    ins.push("name\n")
    deadline = time.time() + 120
    while time.time() < deadline:
        if "sayuri-tpu" in outs.text():
            break
        time.sleep(0.2)
    else:
        pytest.fail(
            f"analysis not interrupted by next command: "
            f"{outs.text()[-500:]!r}"
        )

    ins.push("quit\n")
    ins.close()
    t.join(timeout=60)
    assert not t.is_alive(), "loop did not exit on quit"

    text = outs.text()
    # protocol shape: '=' ack, streamed info lines, blank line, then the
    # interrupting command's own '=' response
    head, _, rest = text.partition("info move")
    assert head.rstrip().endswith("="), head[-50:]
    assert "= sayuri-tpu" in text
    # the stream stopped BEFORE the name response (ordering preserved)
    assert text.index("info move") < text.index("= sayuri-tpu")
