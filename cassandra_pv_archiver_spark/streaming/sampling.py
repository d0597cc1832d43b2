"""Streaming deterministic weighted sampling: the replication race of
operators/sampling.weighted_sample run ONLINE.

Because the race key is a pure function of (salt, id, weight), a
streaming top-k is just a running maximum: GroupState holds each
group's current k best (key, id, w) triples, every micro-batch merges
its candidates in, and the emitted sample after the LAST batch equals
the batch operator over the union of all batches — bit-for-bit
(parity-pinned in tests/test_streaming.py). This is the reservoir a
live ingest keeps so "give me a weighted sample of everything so far"
never rescans the corpus.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_SCHEMA = (
    "group string, rank int, doc_id long, weight int, sample_key string"
)
_STATE_SCHEMA = "ks array<string>, ids array<long>, ws array<int>"


def stream_weighted_sample(
    stream: DataFrame,
    k: int,
    weight: F.Column,
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Per micro-batch, emit each updated group's CURRENT top-k sample
    (rank, id, weight, winning ticket). Rows with weight <= 0 hold no
    ticket (the batch convention); an id replayed into a later batch
    merges idempotently (same id => same tickets => same key)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    tickets = F.expr(
        f"array_max(transform(sequence(0, CAST(_w AS INT) - 1),"
        f" r -> md5(concat('{salt}:', CAST({id_col} AS STRING), ':',"
        " CAST(r AS STRING)))))"
    )
    keyed = (
        stream.select(
            F.col(group_col).cast("string").alias("group"),
            F.col(id_col).cast("long").alias("doc_id"),
            weight.cast("int").alias("_w"),
        )
        .filter(F.col("_w") >= 1)
        .withColumn("sample_key", tickets.alias("sample_key"))
    )

    def _fn(key_, pdf_iter, state: GroupState):
        if state.exists:
            ks, ids, ws = state.get
            best = {i: (s, i, w) for s, i, w in zip(ks, ids, ws)}
        else:
            best = {}
        for pdf in pdf_iter:
            for s, i, w in zip(
                pdf["sample_key"], pdf["doc_id"], pdf["_w"]
            ):
                best[int(i)] = (str(s), int(i), int(w))
        top = sorted(best.values(), key=lambda r: r[1])
        top.sort(key=lambda r: r[0], reverse=True)  # key DESC, id ASC
        top = top[:k]
        state.update((
            [s for s, _, _ in top],
            [i for _, i, _ in top],
            [w for _, _, w in top],
        ))
        yield pd.DataFrame(
            {
                "group": [key_[0]] * len(top),
                "rank": list(range(1, len(top) + 1)),
                "doc_id": [i for _, i, _ in top],
                "weight": [w for _, _, w in top],
                "sample_key": [s for s, _, _ in top],
            }
        )

    return keyed.groupBy("group").applyInPandasWithState(
        _fn,
        OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
