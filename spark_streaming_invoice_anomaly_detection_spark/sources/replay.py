"""S8: paced replay producer (reference InvoiceDataProducer.scala:10-45).

The reference replays a CSV file into Kafka one record at a time with a
5-10 ms sleep between sends (~100-200 rec/s). The Structured Streaming
stand-in feeds the *file* source the same way: a background thread drips
records into the watched directory in small chunk files, so a running
streaming query sees the data arrive over many micro-batches instead of one
big replay — the property the reference's operational envelope (20 s
batches, 2-tick expiry) depends on.

Files are written to a scratch dir and atomically renamed into the watched
dir, so the file-source listing never observes a half-written chunk.
"""

from __future__ import annotations

import os
import random
import threading


class PacedReplayProducer(threading.Thread):
    """Drip ``lines`` into ``out_dir`` with per-record pacing.

    delay_ms is the reference's (min, max) uniform inter-record delay
    (InvoiceDataProducer.scala:41: ``Thread.sleep(5 + 5*rand)``); seeded so
    tests replay deterministically. ``chunk_lines`` records are grouped per
    file — the file source's unit of pickup — at 50 records and ~7.5 ms
    pacing a chunk lands roughly every 0.4 s.
    """

    def __init__(
        self,
        lines: list[str],
        out_dir: str,
        delay_ms: tuple[float, float] = (5.0, 10.0),
        chunk_lines: int = 50,
        seed: int = 0,
    ) -> None:
        super().__init__(daemon=True)
        self.lines = list(lines)
        self.out_dir = out_dir
        self.delay_ms = delay_ms
        self.chunk_lines = chunk_lines
        self.seed = seed
        self.chunks_written = 0
        self._abort = threading.Event()

    def stop(self) -> None:
        """Abort the replay early (remaining buffered lines still flush)."""
        self._abort.set()

    def run(self) -> None:
        os.makedirs(self.out_dir, exist_ok=True)
        # scratch lives BESIDE the watched dir: rename into it is atomic on
        # the same filesystem, and the file-source listing never sees a
        # half-written chunk (nor the scratch dir itself).
        scratch = self.out_dir.rstrip("/") + ".inflight"
        os.makedirs(scratch, exist_ok=True)
        rng = random.Random(self.seed)
        lo, hi = self.delay_ms
        buf: list[str] = []

        def flush() -> None:
            if not buf:
                return
            name = f"chunk_{self.chunks_written:06d}.txt"
            tmp = os.path.join(scratch, name)
            with open(tmp, "w") as f:
                f.write("\n".join(buf) + "\n")
            os.rename(tmp, os.path.join(self.out_dir, name))
            self.chunks_written += 1
            buf.clear()

        for line in self.lines:
            if self._abort.is_set():
                break
            self._abort.wait(rng.uniform(lo, hi) / 1000.0)
            buf.append(line)
            if len(buf) >= self.chunk_lines:
                flush()
        flush()


def replay_file_paced(
    path: str,
    out_dir: str,
    delay_ms: tuple[float, float] = (5.0, 10.0),
    chunk_lines: int = 50,
    seed: int = 0,
) -> PacedReplayProducer:
    """Replay a CSV file's lines into a file-source directory, paced.

    Returns the started producer thread; ``join()`` it (or poll
    ``chunks_written``) to know when the replay has drained.
    """
    with open(path) as f:
        lines = [ln.rstrip("\n") for ln in f if ln.strip()]
    producer = PacedReplayProducer(lines, out_dir, delay_ms, chunk_lines, seed)
    producer.start()
    return producer
