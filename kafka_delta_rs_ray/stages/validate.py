"""Batch validation + quarantine routing (the reference's dead-letter
path: parse error → dead-letter topic with error string + metric,
src/kafka/mod.rs:47-81, 288-300; empty payload silently dropped,
src/utils/mod.rs:132-134).

``ValidateImages`` is an actor-pool map_batches stage: rows whose
``bytes`` decode under their declared ``fmt`` (and match the declared
w×h) pass through; corrupt/unknown rows are written to the table's
``quarantine/`` directory with an ``error`` column and never reach a
fragment. The stage outputs only valid rows, so it composes directly
with FragmentWriter in an ingest pipeline.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..codecs import decode
from ..errors import FormatError
from ..functions.binview import binary_views


RETRY_ATTEMPTS = 3       # reference dead-letter retry policy
RETRY_BACKOFF_SECS = 5.0  # (3 attempts / 5 s sleep, src/kafka/mod.rs:52-80)


class ValidateImages:
    """Stateful stage (actor pool): decode-validate each row's bytes.

    Decode is per-row by necessity (opaque binary payloads), but all
    row-level work is numpy inside a long-lived actor; quarantine
    writes are batched per input batch.
    """

    RETRY_ATTEMPTS = RETRY_ATTEMPTS       # back-compat class aliases
    RETRY_BACKOFF_SECS = RETRY_BACKOFF_SECS

    def __init__(self, table_root: str | None = None, run_id: str = "adhoc",
                 check_pixels: bool = False,
                 retry_attempts: int = RETRY_ATTEMPTS,
                 retry_backoff_secs: float = RETRY_BACKOFF_SECS):
        self.root = table_root
        self.run_id = run_id
        self.check_pixels = check_pixels
        self.retry_attempts = retry_attempts
        self.retry_backoff_secs = retry_backoff_secs
        self.quarantined = 0  # per-actor dead-letter counter (A1 analog)
        self.quarantine_write_failures = 0

    def _quarantine(self, batch: pa.Table, mask: np.ndarray,
                    errors: list) -> None:
        if self.root is None or not mask.any():
            return
        bad = batch.filter(pa.array(mask))
        bad = bad.append_column(
            "error", pa.array([e for e, m in zip(errors, mask) if m],
                              pa.string()))
        if write_quarantine_table(self.root, self.run_id, bad,
                                  retry_attempts=self.retry_attempts,
                                  retry_backoff_secs=self.retry_backoff_secs):
            self.quarantined += int(mask.sum())
        else:
            self.quarantine_write_failures += int(mask.sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        bad = np.zeros(n, dtype=bool)
        errors: list[str | None] = [None] * n
        bufs = binary_views(batch["bytes"])  # zero-copy memoryviews
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        for i in range(n):
            if bufs[i] is None or len(bufs[i]) == 0:
                bad[i] = True  # empty payload: dropped (ref: Ok(None) arm)
                errors[i] = "empty payload"
                continue
            try:
                img = decode(bufs[i], fmts[i])
                # modality gate: the registry spans audio/video too, so
                # a decodable non-image payload (1-D pcmz samples, 4-D
                # vraw frames) must dead-letter, not slip through or
                # crash the shape checks below
                if img.ndim != 3 or img.shape[2] != 3:
                    raise FormatError(
                        f"{fmts[i]}: not an image payload "
                        f"(shape {img.shape})")
                if self.check_pixels and (img.shape[0] != hs[i]
                                          or img.shape[1] != ws[i]):
                    raise FormatError(
                        f"dimension mismatch: {img.shape[:2]} != ({hs[i]}, {ws[i]})")
            except FormatError as e:
                bad[i] = True
                errors[i] = str(e)
        self._quarantine(batch, bad, errors)
        return batch.filter(pa.array(~bad))


def write_quarantine_table(table_root: str, run_id: str, rows: pa.Table,
                           retry_attempts: int = RETRY_ATTEMPTS,
                           retry_backoff_secs: float = RETRY_BACKOFF_SECS,
                           ) -> bool:
    """Write one dead-letter parquet (rows must carry an ``error``
    column) with the reference's retry policy (3 attempts, backoff,
    src/kafka/mod.rs:52-80). A final failure logs and returns False —
    the rows are still withheld from the table, only the audit record
    is lost, so callers continue (the reference does the same). Every
    dead-letter producer (decode validation, JSON parse errors) goes
    through here so the policy can't drift."""
    import logging
    import time

    from ..tablefmt.fragments import (fragment_compression,
                                      fragment_compression_level)

    dest = os.path.join(table_root, "quarantine",
                        f"q-{run_id}-{uuid.uuid4().hex[:12]}.parquet")
    for attempt in range(1, retry_attempts + 1):
        try:
            pq.write_table(
                rows, dest,
                compression=fragment_compression(rows.schema),
                compression_level=fragment_compression_level(rows.schema))
            return True
        except OSError as e:
            if attempt == retry_attempts:
                logging.getLogger(__name__).warning(
                    "quarantine write failed after %d attempts: %s "
                    "(%d rows withheld from table but not recorded)",
                    retry_attempts, e, rows.num_rows)
                return False
            time.sleep(retry_backoff_secs)
    return False


def quarantine_report(table_root: str, run_id: str | None = None) -> dict:
    """Dead-letter audit (the reference counts dead letters as a
    first-class metric, src/monitoring/mod.rs:150-202): total
    quarantined rows and a per-error breakdown, optionally scoped to
    one run_id. Metadata + error column only — payload bytes are
    never loaded."""
    import glob as _glob
    from collections import Counter

    pattern = f"q-{run_id}-*.parquet" if run_id else "q-*.parquet"
    errors: Counter = Counter()
    total = 0
    files = sorted(_glob.glob(os.path.join(table_root, "quarantine", pattern)))
    for p in files:
        t = pq.read_table(p, columns=["error"])
        total += t.num_rows
        errors.update(t["error"].to_pylist())
    return {"files": len(files), "rows": total,
            "errors": dict(sorted(errors.items()))}
