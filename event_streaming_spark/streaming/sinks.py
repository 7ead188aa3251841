"""Streaming sinks: memory/parquet helpers + the email alert sink.

Reference parity:
  - O12/O13 SMTP sink with TLS/auth and chunked payload upload
    (/root/reference/utils/email-sender-libcurl.c:111-193, TLS/port
    selection utils/email-sender.c:271-300).
  - O45 payload serialization (utils/email-sender.c:387-495) — reused via
    the same concat/format pipeline as plans/reference_ops.py.

Design (SURVEY §7.4): an outward side-effecting sink can't be
exactly-once, so it is (a) DISABLED unless a transport is injected,
(b) idempotent per (batch_id): a batch whose id was already recorded is
skipped on replay, (c) the alert batch is collected only AFTER an
aggressive filter — alerts are tiny by construction; the collect is a
bounded driver hop, never a data-plane move.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Transport = Callable[[str, list[str], str], None]  # (from, to_list, payload)


def compose_alert_payload(
    df: DataFrame,
    subject_col: str = "subject",
    body_col: str = "body",
    to_col: str = "to_addr",
    from_addr: str = "alerts@example.com",
) -> DataFrame:
    """Serialize alert rows into RFC-822-ish payloads (O45): Date/From/To/
    Subject headers, blank line, dot-stuffed body (O44)."""
    crlf = "\r\n"
    payload = F.concat(
        F.lit("Date: "),
        F.date_format(F.current_timestamp(), "EEE, dd MMM yyyy HH:mm:ss Z"),
        F.lit(crlf),
        F.lit(f"From: {from_addr}"),
        F.lit(crlf),
        F.lit("To: "),
        F.col(to_col),
        F.lit(crlf),
        F.lit("Subject: "),
        F.col(subject_col),
        F.lit(crlf),
        F.lit(crlf),
        F.replace(F.col(body_col), F.lit("."), F.lit("..")),
    )
    return df.select(F.col(to_col).alias("to_addr"), payload.alias("payload"))


class EmailAlertSink:
    """foreachBatch sink: filter → serialize → send via injected transport.

    ``transport=None`` (default) renders the sink inert — payloads are
    still built (and can be captured for tests) but nothing leaves the
    process.  smtplib wiring is the caller's choice of transport.
    """

    def __init__(
        self,
        predicate,
        make_alerts: Callable[[DataFrame], DataFrame],
        transport: Transport | None = None,
        from_addr: str = "alerts@example.com",
        ledger_dir: str | None = None,
        max_alerts_per_batch: int = 1000,
        keep_sent: int | None = 10_000,
    ) -> None:
        from collections import deque

        self.predicate = predicate
        self.make_alerts = make_alerts
        self.transport = transport
        self.from_addr = from_addr
        self.ledger_dir = ledger_dir
        self.max_alerts = max_alerts_per_batch
        # bounded in-memory trail (continuous queries run forever); tests
        # that want everything pass keep_sent=None
        self.sent: "deque[tuple[int, str, str]]" = deque(maxlen=keep_sent)

    def _seen(self, batch_id: int) -> bool:
        if not self.ledger_dir:
            return False
        return os.path.exists(os.path.join(self.ledger_dir, f"batch-{batch_id}.done"))

    def _mark(self, batch_id: int) -> None:
        if self.ledger_dir:
            os.makedirs(self.ledger_dir, exist_ok=True)
            with open(os.path.join(self.ledger_dir, f"batch-{batch_id}.done"), "w") as fh:
                fh.write("done")
            prog = os.path.join(self.ledger_dir, f"batch-{batch_id}.progress")
            if os.path.exists(prog):
                os.remove(prog)

    def _progress(self, batch_id: int) -> int:
        """Rows already delivered for this batch (crash-mid-batch replay)."""
        if not self.ledger_dir:
            return 0
        path = os.path.join(self.ledger_dir, f"batch-{batch_id}.progress")
        try:
            with open(path) as fh:
                return int(fh.read().strip() or 0)
        except FileNotFoundError:
            return 0

    def _record_progress(self, batch_id: int, n_done: int) -> None:
        if self.ledger_dir:
            os.makedirs(self.ledger_dir, exist_ok=True)
            with open(os.path.join(self.ledger_dir, f"batch-{batch_id}.progress"), "w") as fh:
                fh.write(str(n_done))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self._seen(batch_id):  # replay after post-send failure → skip
            return
        alerts = self.make_alerts(batch_df.filter(self.predicate)).limit(self.max_alerts)
        rows = alerts.collect()  # bounded: post-filter, post-limit
        # Deterministic delivery order makes the per-row progress marker
        # meaningful on replay: a crash after row k re-sends only rows >k,
        # not the whole batch.
        rows = sorted(rows, key=lambda r: (r["to_addr"], r["payload"]))
        start = self._progress(batch_id)
        for i, r in enumerate(rows):
            if i < start:
                continue
            if self.transport is not None:
                self.transport(self.from_addr, [r["to_addr"]], r["payload"])
            self.sent.append((batch_id, r["to_addr"], r["payload"]))
            self._record_progress(batch_id, i + 1)
        self._mark(batch_id)


def smtplib_transport(host: str, port: int = 587, user: str | None = None,
                      password: str | None = None, starttls: bool = True) -> Transport:
    """Real SMTP transport (the libcurl agent analogue) — constructed only
    on demand; never used in tests/CI (no network)."""

    def send(from_addr: str, to_addrs: list[str], payload: str) -> None:
        import smtplib

        with smtplib.SMTP(host, port, timeout=30) as smtp:
            if starttls:
                smtp.starttls()
            if user is not None:
                smtp.login(user, password or "")
            smtp.sendmail(from_addr, to_addrs, payload.encode("utf-8"))

    return send
