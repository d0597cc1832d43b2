"""Streaming-native sequence packing: the continuous analog of
``operators/sampling.sequence_packing``.

A training-data service packs documents into fixed-size context windows
as they arrive; the pack a new document lands in depends on every token
that came before it in its shard stream. That running offset is held in
``GroupState`` keyed by (lang, shard), so pack ids keep increasing
seamlessly across micro-batches — when the stream is replayed in the
same order, the assignment is identical to the batch operator
(test-pinned parity).

State is one long per (lang, shard): O(#langs x #shards) cluster-wide,
hash partitioned — no skew concern at any corpus size.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sampling import hash_bucket16


def sequence_packing_stream(
    docs: DataFrame,
    window_tokens: int = 2048,
    n_shards: int = 16,
    salt: str = "pack",
) -> DataFrame:
    """``docs`` is a STREAMING frame with doc_id, lang, n_tokens. Within a
    micro-batch, documents pack in doc_id order (the batch operator's
    order); across micro-batches the per-shard token offset carries via
    GroupState. Returns doc_id, lang, shard, start_offset, n_tokens,
    pack_id — same columns as the batch operator."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    d = docs.select("doc_id", "lang", "n_tokens").withColumn(
        "shard", hash_bucket16("doc_id", salt) % n_shards
    )
    out_schema = (
        "doc_id long, lang string, shard int, start_offset long, "
        "n_tokens long, pack_id long"
    )

    def _fn(key, pdf_iter, state: GroupState):
        lang, shard = key
        offset = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            pdf = pdf.sort_values("doc_id")
            starts = offset + pdf["n_tokens"].cumsum() - pdf["n_tokens"]
            offset = int(offset + pdf["n_tokens"].sum())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang": lang,
                    "shard": shard,
                    "start_offset": starts.astype("int64"),
                    "n_tokens": pdf["n_tokens"],
                    "pack_id": (starts // window_tokens).astype("int64"),
                }
            )
        state.update((int(offset),))

    return d.groupBy("lang", "shard").applyInPandasWithState(
        _fn,
        out_schema,
        "offset long",
        "append",
        GroupStateTimeout.NoTimeout,
    )
