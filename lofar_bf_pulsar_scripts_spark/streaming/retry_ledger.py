"""Stateful streaming retry ledger (SURVEY §2.9).

The reference's staging loop keeps a retry ledger for failed
downloads across poll iterations (/root/reference/LTA/
lta-retrieve.py:414-420,550-555: failures append to a retry file that
seeds the next run). Streaming dual: a per-file state machine over an
attempt-event stream via ``applyInPandasWithState`` — custom stateful
operator territory, where watermarked dropDuplicates is not enough
because the ledger must COUNT and CLASSIFY attempts.

State per filename: (attempts, failures, done). Emits one row per
state transition; files reaching ``max_retries`` failures emit a
'dead_letter' status (the reference's retry file is exactly the
dead-letter queue).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "filename string, attempts int, failures int, status string"
STATE_SCHEMA = "attempts int, failures int, done boolean"


def make_ledger_fn(max_retries: int = 3):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (filename,) = key
        if state.exists:
            attempts, failures, done = state.get
        else:
            attempts, failures, done = 0, 0, False
        for pdf in pdfs:
            for ok in pdf["ok"]:
                attempts += 1
                if bool(ok):
                    done = True
                else:
                    failures += 1
        state.update((attempts, failures, done))
        if done:
            status = "done"
        elif failures >= max_retries:
            status = "dead_letter"
        else:
            status = "retrying"
        yield pd.DataFrame(
            [
                {
                    "filename": filename,
                    "attempts": attempts,
                    "failures": failures,
                    "status": status,
                }
            ]
        )

    return update


def retry_ledger(stream: DataFrame, max_retries: int = 3) -> DataFrame:
    """``stream`` needs (filename STRING, ok BOOLEAN) columns."""
    return stream.groupBy("filename").applyInPandasWithState(
        make_ledger_fn(max_retries),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
