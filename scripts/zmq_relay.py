#!/usr/bin/env python
"""ZMQ -> landing-directory relay: the non-Spark edge process that
closes the A1 ingest loop end-to-end.

The reference binds a ZMQ PULL socket and queues 2-frame
``(level, message)`` multiparts into its micro-batcher
(``venus/io/__init__.py:78-108``, ``venus/models.py:5-7``). Spark's
ingest edge is the same shape, split at the process boundary: this
relay PULL-binds, micro-batches frames with the reference's flush
policy (size >= max_batch_size OR age >= max_batch_age, mirroring
``venus/settings.py:36-41``), and atomically lands each batch as a
JSON-lines file in the directory ``streaming.read_log_stream``
watches. Queue overflow drops, like the reference's ``put_nowait``
(``venus/io/__init__.py:97-105``) — backpressure cannot reach an
application logger.

pyzmq is not installed in the build container, so the socket loop is
import-gated; ``--stdin`` exercises the identical batching/landing path
from standard input (one message per line) and is what the tests drive.

Both reference wire topologies are supported: the PULL-bind collector
(the main venus ingest edge) and the SUB-bind subscribe-all collector
of the contrib demos (``--socket-type sub``,
``contrib/zmqlog/stock_socket/collector_sub_bind.py:1-24``).

Usage:
    python scripts/zmq_relay.py --landing /tmp/landing --port 5555
    python scripts/zmq_relay.py --landing /tmp/landing --socket-type sub
    some-producer | python scripts/zmq_relay.py --landing /tmp/landing --stdin
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import uuid

MAX_BATCH_SIZE = 100  # reference MAX_BATCH_SIZE (venus/settings.py:36-38)
MAX_BATCH_AGE_SECONDS = 5.0  # reference MAX_BATCH_AGE_SECONDS (:39-41)
QUEUE_MAX = 65536  # reference pull_queue maxsize (venus/main.py:36)


class AdmissionQueue:
    """Bounded handoff between the wire/reader thread and the batching
    loop — the analog of the reference's ``asyncio.Queue(maxsize=65536)``
    (``venus/main.py:36``). Overflow DROPS, never blocks
    (``put_nowait`` posture, ``venus/io/__init__.py:97-105``): the
    producer is application logging and backpressure cannot reach it,
    so admission is at-most-once BY DESIGN. Every admitted message
    lands exactly once (the drain side is single-threaded into the
    batcher); every dropped message is counted and reported, so the
    loss is visible in ops instead of silent. Drop logging is
    rate-limited (1st/10th/100th/1000th then every 10000th) — the
    reference logs each drop, but at a 65k-burst a per-drop line would
    itself become the bottleneck."""

    def __init__(self, maxsize: int = QUEUE_MAX) -> None:
        import queue

        self.q: "queue.Queue[bytes | None]" = queue.Queue(maxsize=maxsize)
        self.dropped = 0
        self.admitted = 0

    def admit(self, raw: bytes | None, block: bool = False) -> bool:
        """Non-blocking enqueue; returns False (and counts) on overflow.
        The EOF sentinel ``None`` must never be lost, so it alone uses a
        blocking put — by the time EOF arrives the producer has stopped,
        so the drain side is strictly catching up and the put terminates.

        ``block=True`` is the LOSSLESS admission mode (ADVICE r13 #4):
        a blocking put that applies backpressure to the producer
        instead of dropping. Only correct when backpressure is
        acceptable — the stdin pipeline, where the OS pipe already
        blocks the producer for free — never for the wire loop, where
        a stalled recv lets the kernel buffer overflow invisibly."""
        import queue

        if raw is None:
            self.q.put(None)
            return True
        if block:
            self.q.put(raw)
            self.admitted += 1
            return True
        try:
            self.q.put_nowait(raw)
        except queue.Full:
            self.dropped += 1
            d = self.dropped
            if d in (1, 10, 100, 1000) or d % 10000 == 0:
                print(
                    f"relay: receive queue full; dropped {d} message(s) "
                    "so far (at-most-once admission)",
                    file=sys.stderr,
                )
            return False
        self.admitted += 1
        return True

    def get(self, timeout: float) -> bytes | None:
        return self.q.get(timeout=timeout)


def frame_to_line(level: bytes, message: bytes) -> str:
    """One ZMQ multipart -> one landing line.

    The reference treats ``message`` as the JSON log record and
    ``level`` as transport metadata (``venus/models.py:5-7``); the line
    we land IS the raw record so Spark's decode-then-validate split
    (``venus_spark.ingest.parse_records``) sees exactly what the wire
    carried. Non-UTF8 payloads are preserved via surrogateescape so the
    quarantine path still receives (and can log) the bad bytes.
    """
    del level  # transport metadata; the record itself carries its level
    return message.decode("utf-8", errors="surrogateescape").rstrip("\n")


def land_batch(lines: list[str], landing_dir: str, seq: int) -> str:
    """Atomically write one micro-batch as a JSON-lines file.

    tmp-write + rename: the Spark file source lists the directory
    between triggers, so a half-written file must never be visible under
    its final name. The uuid component keeps relay restarts (seq reset)
    from colliding with already-landed files."""
    name = f"batch-{seq:08d}-{uuid.uuid4().hex[:8]}.jsonl"
    final = os.path.join(landing_dir, name)
    tmp = os.path.join(landing_dir, f"._tmp-{name}")
    with open(tmp, "w", encoding="utf-8", errors="surrogateescape") as fh:
        fh.write("\n".join(lines) + "\n")
    os.rename(tmp, final)
    return final


class MicroBatcher:
    """The reference's flush policy: emit when size or age trips."""

    def __init__(
        self,
        landing_dir: str,
        max_size: int = MAX_BATCH_SIZE,
        max_age: float = MAX_BATCH_AGE_SECONDS,
    ) -> None:
        self.landing_dir = landing_dir
        self.max_size = max_size
        self.max_age = max_age
        self.buf: list[str] = []
        self.seq = 0
        self.oldest: float | None = None

    def add(self, line: str, now: float | None = None) -> str | None:
        now = time.monotonic() if now is None else now
        if not self.buf:
            self.oldest = now
        self.buf.append(line)
        if len(self.buf) >= self.max_size:
            return self.flush()
        return None

    def due(self, now: float | None = None) -> bool:
        now = time.monotonic() if now is None else now
        # self.oldest is always set while buf is non-empty; `oldest or
        # now` would misread a legitimate monotonic clock value of 0.0
        # as unset and never age that batch out.
        return bool(self.buf) and (now - self.oldest) >= self.max_age

    def flush(self) -> str | None:
        if not self.buf:
            return None
        path = land_batch(self.buf, self.landing_dir, self.seq)
        self.buf = []
        self.oldest = None
        self.seq += 1
        return path


def run_stdin(
    batcher: MicroBatcher,
    queue_max: int = QUEUE_MAX,
    lossless: bool = False,
) -> None:
    """Drive the batching/landing path from stdin (no zmq needed).

    Lines are read on a helper thread feeding the bounded
    :class:`AdmissionQueue` so the main loop can poll with a timeout —
    the stdin twin of the zmq branch's 250 ms poll: a producer that
    goes quiet WITHOUT closing the pipe must still see its buffered
    batch land once the age trigger passes, not sit in memory until the
    next line arrives. By default a burst beyond the queue bound DROPS
    (counted, reported) exactly like the reference's ``put_nowait``
    admission — the relay must never apply backpressure to an
    application logger. ``lossless=True`` (``--lossless``, ADVICE r13
    #4) flips admission to a blocking put: on stdin the producer is a
    PIPE, whose kernel buffer already blocks the writer for free, so
    backpressure is both acceptable and already happening one hop
    upstream — pipelines that relied on the pre-r13 never-drop
    behavior opt back into it explicitly. Bytes are read from
    ``sys.stdin.buffer`` (the binary layer) and decoded with
    surrogateescape, so a non-UTF8 byte is preserved for downstream
    quarantine instead of killing the relay with UnicodeDecodeError."""
    import queue
    import threading

    aq = AdmissionQueue(maxsize=queue_max)

    def reader() -> None:
        for raw in sys.stdin.buffer:
            aq.admit(raw, block=lossless)
        aq.admit(None)  # EOF sentinel

    threading.Thread(target=reader, daemon=True).start()
    while True:
        try:
            raw = aq.get(timeout=0.25)
        except queue.Empty:
            if batcher.due():
                batcher.flush()
            continue
        if raw is None:
            break
        batcher.add(raw.decode("utf-8", "surrogateescape").rstrip("\n"))
        if batcher.due():
            batcher.flush()
    batcher.flush()  # graceful EOF flush (A12)
    if aq.dropped:
        print(
            f"relay: TOTAL dropped {aq.dropped} message(s) on queue "
            f"overflow; {aq.admitted} admitted and landed",
            file=sys.stderr,
        )


def run_zmq(
    batcher: MicroBatcher,
    port: int,
    socket_type: str = "pull",
    zmq_module=None,
    connect: str | None = None,
) -> None:
    """Socket loop for the reference wire topologies:

    - ``pull`` (default): PULL-bind collector — the main venus ingest
      edge (``venus/io/__init__.py:78-108``); producers PUSH-connect.
    - ``sub``: SUB-bind, subscribe-all collector — the contrib demo
      topology (``contrib/zmqlog/stock_socket/collector_sub_bind.py:
      1-24``); producers PUB-connect (e.g. pyzmq's PUBHandler, whose
      frames are the same 2-part (topic/level, message) shape, so
      ``frame_to_line`` applies unchanged). PUB/SUB drops while no
      subscriber is bound and on slow-subscriber HWM — strictly
      at-most-once, exactly the wire contract the reference's
      queue-overflow drop already accepts (A3).
    - ``connect=ENDPOINT`` flips either type to the CONNECT side:
      ``sub`` + connect is the stock SUB-connect/PUB-bind demo
      (``contrib/zmqlog/stock/collector_sub_connect.py:12-14`` —
      collector connects to a producer that owns the bound port);
      ``pull`` + connect is the matching PULL-connect/PUSH-bind
      fan-in. Only the socket wiring changes — the poll/batch/land
      loop is identical, and reconnects are zmq-transparent.

    ``zmq_module`` injects a stand-in for tests (pyzmq is absent in
    the build container; the import gate below serves deployments)."""
    if socket_type not in ("pull", "sub"):
        # argparse guards the CLI; this guards programmatic callers — a
        # silent fallthrough to SUB would bind a socket PUSH producers
        # cannot reach and drop 100% of traffic with no error
        raise ValueError(f"socket_type must be 'pull' or 'sub', got {socket_type!r}")
    zmq = zmq_module
    if zmq is None:
        try:
            import zmq  # type: ignore[no-redef]
        except ImportError:
            sys.exit(
                "pyzmq is not installed. Install it on the ingest edge host, "
                "or use --stdin to exercise the landing path without a socket."
            )

    ctx = zmq.Context.instance()
    sock = ctx.socket(zmq.PULL if socket_type == "pull" else zmq.SUB)
    sock.setsockopt(zmq.LINGER, 1)
    if connect:
        sock.connect(connect)
    else:
        sock.bind(f"tcp://*:{port:d}")
    if socket_type == "sub":
        # subscribe-all, like the reference demos' sock.subscribe(b'')
        sock.subscribe(b"")
    poller = zmq.Poller()
    poller.register(sock, zmq.POLLIN)
    where = (
        f"connected to {connect}" if connect else f"bound on tcp://*:{port}"
    )
    print(f"relay: {socket_type.upper()} {where}", file=sys.stderr)
    try:
        while True:
            # Poll with a short timeout so the age trigger fires even
            # when the wire goes quiet (the reference's batch-age timer).
            if poller.poll(timeout=250):
                raw = sock.recv_multipart()
                if len(raw) != 2:
                    print(f"relay: unexpected multipart {raw!r}", file=sys.stderr)
                    continue
                batcher.add(frame_to_line(raw[0], raw[1]))
            if batcher.due():
                batcher.flush()
    except KeyboardInterrupt:
        batcher.flush()
    finally:
        sock.close(1)
        ctx.term()


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--landing", required=True, help="landing directory")
    # default applied after the --connect conflict check: an EXPLICIT
    # --port alongside --connect is an error (the socket connects to
    # ENDPOINT and never binds, so the port would be silently unused —
    # review r12 ADVICE #4)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=MAX_BATCH_SIZE)
    ap.add_argument("--batch-age", type=float, default=MAX_BATCH_AGE_SECONDS)
    # default applied after the mode check: the admission queue exists
    # on the stdin reader-thread handoff only (the zmq loop feeds the
    # batcher synchronously; its bound is the socket HWM), so an
    # explicit --queue-max in zmq mode would be silently unused — the
    # same loud-refusal posture as --port with --connect
    ap.add_argument(
        "--queue-max",
        type=int,
        default=None,
        help="admission queue bound for --stdin (reference pull_queue "
        "maxsize, venus/main.py:36); a burst beyond it drops, "
        "at-most-once",
    )
    ap.add_argument(
        "--stdin", action="store_true", help="read lines from stdin instead of zmq"
    )
    ap.add_argument(
        "--lossless",
        action="store_true",
        help="with --stdin: block (pipe backpressure) instead of "
        "dropping when the admission queue fills — for pipelines "
        "where the producer tolerates backpressure; never available "
        "on the wire loop, whose contract is at-most-once",
    )
    ap.add_argument(
        "--socket-type",
        choices=("pull", "sub"),
        default="pull",
        help="pull = PULL-bind collector (the main venus topology); "
        "sub = SUB-bind subscribe-all collector (the contrib "
        "PUB/SUB demo topology)",
    )
    ap.add_argument(
        "--connect",
        metavar="ENDPOINT",
        help="CONNECT to this endpoint (e.g. tcp://127.0.0.1:12345) "
        "instead of binding --port: with --socket-type sub this is "
        "the stock SUB-connect/PUB-bind demo topology "
        "(collector_sub_connect.py); with pull it is PULL-connect/"
        "PUSH-bind fan-in",
    )
    args = ap.parse_args()
    if args.connect and args.port is not None:
        ap.error(
            "--port and --connect are mutually exclusive: with "
            "--connect the relay connects to ENDPOINT and never binds, "
            "so --port would be silently ignored"
        )
    if args.port is None:
        args.port = 5555
    if args.queue_max is not None and not args.stdin:
        ap.error(
            "--queue-max applies to --stdin only: the zmq loop feeds "
            "the batcher synchronously (the socket HWM is its bound), "
            "so the flag would be silently ignored"
        )
    if args.lossless and not args.stdin:
        ap.error(
            "--lossless applies to --stdin only: the wire loop's "
            "contract is at-most-once (PUB/SUB and kernel buffers drop "
            "regardless), so the flag would promise what the transport "
            "cannot deliver"
        )
    if args.queue_max is None:
        args.queue_max = QUEUE_MAX
    os.makedirs(args.landing, exist_ok=True)
    batcher = MicroBatcher(args.landing, args.batch_size, args.batch_age)
    if args.stdin:
        run_stdin(batcher, queue_max=args.queue_max, lossless=args.lossless)
    else:
        run_zmq(
            batcher,
            args.port,
            socket_type=args.socket_type,
            connect=args.connect,
        )


if __name__ == "__main__":
    main()
