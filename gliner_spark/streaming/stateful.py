"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no streaming at all (SURVEY.md §2.9); these are the
net-new stateful surfaces a continuously-ingesting KG pipeline needs:

* :func:`streaming_exact_dedup` — cross-micro-batch exact dedup: a doc
  whose content hash was emitted in ANY earlier micro-batch (of this or
  a previous run — state lives in the checkpoint) is dropped. This is
  the streaming analog of ``operators.dedup.exact_duplicates`` and the
  standard guard in front of an append-only triples sink.
* :func:`streaming_first_seen` — the generalized first-wins keyed
  filter over an arbitrary key column.

Scale notes: state is partitioned by the group key (the content hash —
uniform by construction, no skew), one state row per distinct key, and
the HDFS/RocksDB state store handles spill. The state never stores
documents, only the key and a count — state size is O(distinct keys).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_first_seen(
    stream_df: DataFrame,
    key_col: str,
    output_schema: str | None = None,
) -> DataFrame:
    """Keep only the FIRST row ever seen per ``key_col`` across all
    micro-batches (including after restart — state is checkpointed).

    Within a single micro-batch, ties break deterministically by the
    smallest value of the remaining columns (pandas sort), so replays
    of the same batch emit the same winner.
    """
    cols = stream_df.columns
    if output_schema is None:
        output_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in stream_df.schema
        )
    state_schema = "n long"

    def dedup_group(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        batches = [p for p in pdfs if len(p)]
        if state.exists:
            (n,) = state.get
            state.update((n + sum(len(p) for p in batches),))
            return iter(())  # key already emitted in an earlier batch
        if not batches:
            return iter(())
        all_rows = pd.concat(batches, ignore_index=True)
        winner = all_rows.sort_values(by=list(all_rows.columns)).head(1)
        state.update((len(all_rows),))
        return iter([winner[cols]])

    return stream_df.groupBy(key_col).applyInPandasWithState(
        dedup_group,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_exact_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Cross-batch exact dedup by md5(text) (streaming analog of
    ``exact_duplicates``): emits each distinct content exactly once
    over the stream's whole lifetime, resumable from checkpoint."""
    with_hash = stream_df.withColumn(hash_col, F.md5(F.col(text_col)))
    return streaming_first_seen(with_hash, hash_col)
