"""Deterministic sampling / dataset splitting for training pipelines.

Assignment is a pure function of the row id (md5 hash-threshold), never
``rand()``: the split is reproducible across runs, engines, partition
counts, and cluster sizes — the property a train/val/test split actually
needs — and it requires NO shuffle (embarrassingly parallel map), so it
costs one scan at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket16(id_col: str, salt: str) -> Column:
    """First 16 bits of md5(salt ':' id) as an int in [0, 65536) —
    uniform, deterministic, engine-portable (same construction is
    expressible in DuckDB for the oracles). Column API, not an
    interpolated SQL string: a quote in the salt must be data, never
    expression text."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
            ),
            1,
            4,
        ),
        16,
        10,
    ).cast("int")


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "split",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Add a ``split`` column ('train' | 'val' | 'test') by hash
    threshold: bucket < 80% -> train, < 90% -> val, else test.
    Stratification comes for free: the hash is independent of any
    feature, so expected per-stratum fractions match the global ones;
    use a different ``salt`` to draw an independent re-split."""
    b = hash_bucket16(id_col, salt)
    t_thr = 65536 * train_pct // 100
    v_thr = 65536 * (train_pct + val_pct) // 100
    split = (
        F.when(b < t_thr, F.lit("train"))
        .when(b < v_thr, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def sequence_packing(
    docs: DataFrame,
    n_tokens: Column | str = "n_tokens",
    window_tokens: int = 2048,
    n_shards: int = 16,
    salt: str = "pack",
) -> DataFrame:
    """GPT-style sequence-packing audit: documents are concatenated in a
    deterministic order and split into fixed-size context windows; each
    doc is assigned the pack its FIRST token lands in (docs straddle
    boundaries, as concatenation packing does).

    100 TB shape: packing is sequential by definition, so the stream is
    sharded first (deterministic md5 shard per doc — the per-worker
    packing real pipelines do) and the running token offset is ONE
    cumulative-sum window per (lang, shard): a single hash exchange, no
    iteration, no Python. Determinism: order within a shard is
    (doc_id) — reproducible across engines/partitionings, so pack ids
    are stable cluster-wide.

    Returns one row per doc: doc_id, lang, shard, pack_id, n_tokens,
    start_offset (token offset of the doc within its shard stream).
    """
    nt = F.col(n_tokens) if isinstance(n_tokens, str) else n_tokens
    from pyspark.sql import Window

    shard = hash_bucket16("doc_id", salt) % n_shards
    d = docs.select("doc_id", "lang", nt.alias("n_tokens")).withColumn(
        "shard", shard
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return d.select(
        "doc_id",
        "lang",
        "shard",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_offset"),
        "n_tokens",
    ).withColumn(
        "pack_id", (F.col("start_offset") / F.lit(window_tokens)).cast("long")
    )


def mix_to_ratios(
    df: DataFrame,
    weights: dict[str, int],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Data-recipe mixing: draw the LARGEST corpus whose strata follow the
    integer ratio ``weights`` exactly (e.g. {en: 4, zh: 1, ...} -> four
    English docs for every Chinese doc), selecting members by
    deterministic md5 order.

    The pretraining "data recipe" operator: mixtures are specified as
    ratios, and the binding stratum (the one whose supply runs out first)
    caps the total. Math stays in INTEGERS end-to-end — the scale factor
    is ``m = min_l floor(n_l / w_l)`` and each quota is ``w_l * m`` — so
    quotas are bit-identical on any engine (no float shares to round).

    Two passes, both skew-tolerant: a partial-combined count per stratum
    (tiny, broadcast back), then one md5-order rank window per stratum to
    take the quota. Strata absent from ``weights`` are dropped.

    Returns: id, stratum, rank (1-based within stratum), quota.
    """
    spark = df.sparkSession
    # counts LEFT-join from the WEIGHTS spine: a weighted stratum with
    # ZERO rows must still bind the minimum (m = 0 -> empty corpus is the
    # largest one honoring the ratio); computing min only over present
    # strata would silently return a corpus violating the recipe
    wdf = spark.createDataFrame(
        [(k, int(v)) for k, v in weights.items()], f"{stratum_col} string, _w int"
    )
    counts = (
        df.filter(F.col(stratum_col).isin(list(weights)))
        .groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    scaled = (
        wdf.join(counts, stratum_col, "left")
        .withColumn("_n", F.coalesce("_cnt", F.lit(0)))
        .withColumn("_m", F.expr("_n div _w"))
    )
    # the binding stratum: one tiny global agg, joined back broadcast
    m = scaled.agg(F.min("_m").alias("_mmin"))
    quotas = (
        scaled.crossJoin(F.broadcast(m))
        .select(
            stratum_col, (F.col("_w") * F.col("_mmin")).alias("quota")
        )
    )
    h = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    w_rank = Window.partitionBy(stratum_col).orderBy("_h", id_col)
    return (
        df.select(id_col, stratum_col)
        .join(F.broadcast(quotas), stratum_col)
        .withColumn("_h", h)
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= F.col("quota"))
        .select(id_col, stratum_col, "rank", "quota")
    )


def context_chunks(
    docs: DataFrame,
    n_tokens: Column | str = "n_tokens",
    id_col: str = "doc_id",
    window_tokens: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Overlapping context-window chunking: every document splits into
    windows of ``window_tokens`` tokens starting every ``stride`` tokens
    (the RAG-passage / long-context training-example splitter — the
    sibling of :func:`sequence_packing`, which CONCATENATES short docs;
    this SPLITS long ones).

    Chunk starts are ``k * stride`` for ``k = 0 .. (n-1) div stride``
    (every token is covered; the final chunk is short). Pure per-row
    arithmetic + one ``sequence``/``explode`` fan-out: no shuffle at all
    — the operator is embarrassingly parallel at any scale, and the
    output inherits the input's partitioning for the downstream
    tokenizer stage. Token-less docs emit no chunks.

    Returns: id, chunk_idx, tok_start, tok_len.
    """
    if stride <= 0 or window_tokens <= 0:
        raise ValueError("window_tokens and stride must be positive")
    n = F.col(n_tokens) if isinstance(n_tokens, str) else n_tokens
    d = docs.select(F.col(id_col), n.cast("long").alias("_n"))
    return (
        d.filter(F.col("_n") > 0)
        .select(
            id_col,
            "_n",
            F.explode(
                F.expr(f"sequence(0L, (_n - 1) div {stride})")
            ).alias("_k"),
        )
        .select(
            id_col,
            F.col("_k").cast("int").alias("chunk_idx"),
            (F.col("_k") * stride).alias("tok_start"),
            F.least(
                F.lit(window_tokens).cast("long"),
                F.col("_n") - F.col("_k") * stride,
            ).alias("tok_len"),
        )
    )


def group_split_assign(
    df: DataFrame,
    group_col: str = "source",
    salt: str = "gsplit",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """GROUP-level split: the hash threshold is applied to the group key
    (source/domain/url-host), so every document of a group lands in ONE
    split — the leakage guard a row-level split cannot give (near-
    duplicate documents cluster within a source; letting a source
    straddle train/val leaks). Same engine-portable md5 threshold as
    :func:`split_assign`, same zero-shuffle map-only cost."""
    b = hash_bucket16(group_col, salt)
    t_thr = 65536 * train_pct // 100
    v_thr = 65536 * (train_pct + val_pct) // 100
    split = (
        F.when(b < t_thr, F.lit("train"))
        .when(b < v_thr, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def temperature_alloc(
    docs: DataFrame,
    budget_tokens: int = 1_000_000,
    group_col: str = "lang",
    size_col: str = "n_chars",
) -> DataFrame:
    """Temperature-scaled sampling allocation across corpus groups
    (the multilingual-LM mixture rule p_i ∝ c_i^α with α = 1/2, as in
    the public mBERT/XLM-R exponent-smoothing scheme): big languages
    are down-weighted, small ones boosted, and a fixed token budget is
    split proportionally to √(group size).

    Exactness: √ goes through the INTEGER square root (floor(sqrt(c))
    corrected by one exact comparison on each side, so the IEEE sqrt's
    ±1-ulp slack at perfect-square boundaries can never flip it), and
    the budget split is largest-remainder apportionment in pure integer
    arithmetic — allocations always sum to exactly the budget, ties
    break on the group key, and every number is bit-identical on any
    engine and any cluster size.

    100 TB shape: one map-side-combined groupBy over the corpus; the
    apportionment runs on the collapsed per-group table (a handful of
    rows), where the global windows cost nothing.

    Degenerate input: if every group's weight is 0 (all group sizes 0,
    so there is nothing to apportion), every group gets alloc_tokens=0
    and share=0.0 — an explicit convention instead of the NULLs a bare
    division by the zero weight-sum would produce.

    Returns: group_col, group_size, weight, alloc_tokens, share.
    """
    g = docs.groupBy(group_col).agg(
        F.sum(size_col).cast("long").alias("group_size")
    )
    s0 = F.expr("CAST(floor(sqrt(CAST(group_size AS DOUBLE))) AS BIGINT)")
    g = g.withColumn("_s0", s0).withColumn(
        "weight",
        F.expr(
            "_s0 - CAST(_s0 * _s0 > group_size AS BIGINT)"
            " + CAST((_s0 + 1) * (_s0 + 1) <= group_size AS BIGINT)"
        ),
    )
    # post-aggregation table: one row per group — global windows are free
    wall = Window.partitionBy()
    worder = Window.partitionBy().orderBy(
        F.col("_rem").desc(), F.col(group_col)
    )
    b = F.lit(int(budget_tokens))
    g = (
        g.withColumn("_w", F.sum("weight").over(wall))
        # all-zero weights: nothing to apportion — allocate 0 everywhere
        # rather than letting div-by-zero NULLs escape
        .withColumn(
            "_base",
            F.expr(
                f"CASE WHEN _w = 0 THEN CAST(0 AS BIGINT)"
                f" ELSE ({budget_tokens} * weight) div _w END"
            ),
        )
        .withColumn(
            "_rem",
            F.expr(
                f"CASE WHEN _w = 0 THEN CAST(0 AS BIGINT)"
                f" ELSE ({budget_tokens} * weight) % _w END"
            ),
        )
        .withColumn(
            "_deficit",
            F.when(F.col("_w") == 0, F.lit(0)).otherwise(
                b - F.sum("_base").over(wall)
            ),
        )
        .withColumn("_rn", F.row_number().over(worder))
    )
    return g.select(
        group_col,
        "group_size",
        "weight",
        (F.col("_base") + (F.col("_rn") <= F.col("_deficit")).cast("long"))
        .alias("alloc_tokens"),
        (
            (F.col("_base") + (F.col("_rn") <= F.col("_deficit")).cast("long"))
            .cast("double")
            / float(budget_tokens)
        ).alias("share"),
    ).orderBy(group_col)


def epoch_shuffle(
    docs: DataFrame,
    n_shards: int,
    seed: str = "epoch0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic training-order shuffle: every document gets a
    (shard, pos) address for one training epoch — reproducible on any
    cluster, any partitioning, any run.

    A naive global ``ORDER BY random()`` is neither reproducible nor
    scalable (one total sort, nondeterministic tiebreaks). Instead the
    address is pure hashing: ``shard = first-16-md5-bits(seed:id) mod
    n_shards`` (a map-only column), and ``pos`` ranks ``(md5(seed:id),
    id)`` WITHIN the shard — per-shard windows over ~N/n_shards rows,
    the same partitioned-window discipline as everything else here. A
    new ``seed`` reshuffles everything; the same seed replays the exact
    epoch order byte-for-byte (the reproducibility a training run's
    data-order ablation or crash-resume needs).

    Returns: id_col, shard (int), pos (long, 0-based within shard).
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return (
        docs.select(F.col(id_col), h.alias("_h"))
        .withColumn(
            "shard", (hash_bucket16(id_col, seed) % n_shards).cast("int")
        )
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .select(id_col, "shard", "pos")
        .orderBy("shard", "pos")
    )


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight: Column,
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "wsample",
    n_buckets: int = 32,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: per group,
    the ``k`` winners of a replication race. An item with integer
    weight ``w`` holds ``w`` independent lottery tickets —
    ``md5(salt:id:r)`` for r in [0, w) — and races with its best
    ticket; the top ``k`` keys win. Inclusion odds grow with ``w``
    exactly as if the item appeared ``w`` times (the classic
    replication reduction of weighted sampling), yet each item can win
    at most once, and the whole draw is a pure function of (salt, id,
    w): reproducible across engines, partitionings, and cluster sizes,
    like every sampler in this module (no ``rand()``).

    Scale shape: the race key is an ``array_max`` over a generated
    per-row array — a map-only column, NO explode, NO shuffle. The
    top-k itself is TWO-PHASE so a billion-row group never lands in
    one window task: phase 1 takes a local top-k per (group, hash
    bucket) — bounding survivors at ``n_buckets * k`` per group —
    phase 2 ranks only those survivors. Any item outside its bucket's
    top-k cannot be in the group's top-k, so the two-phase result is
    exactly the single-window result.

    ``weight`` must be an integer-valued Column; rows with weight <= 0
    hold no tickets and are never sampled (documented convention).

    Returns: group_col, rank (1-based int), id_col, weight (int),
    sample_key (the winning ticket, hex).
    """
    keyed = (
        docs.select(group_col, id_col, weight.cast("int").alias("_w"))
        .filter(F.col("_w") >= 1)
        .withColumn("_salt", F.lit(salt))
    )
    return _replication_race(keyed, k, group_col, id_col, n_buckets).select(
        group_col, "rank", id_col, "weight", "sample_key"
    ).orderBy(group_col, "rank")


def weighted_sample_multi(
    docs: DataFrame,
    k: int,
    weight: Column,
    salts: list[str],
    group_col: str = "lang",
    id_col: str = "doc_id",
    n_buckets: int = 32,
) -> DataFrame:
    """Every salt's :func:`weighted_sample` draw in ONE corpus scan —
    the bias-audit entry point (r12): N independent draws previously
    cost N full scans + 2N window shuffles; here the salt list explodes
    onto the scanned rows and the identical replication race runs with
    the salt as one more window key. Each (salt) slice is the SAME pure
    function of (salt, id, w) as the single-salt sampler — the race
    core is literally shared (this is the production sampler, not a
    reimplementation; slice equality is pinned by an operator test).

    Returns: salt, group_col, rank, id_col, weight, sample_key.
    """
    keyed = (
        docs.select(group_col, id_col, weight.cast("int").alias("_w"))
        .filter(F.col("_w") >= 1)
        .withColumn("_salt", F.explode(F.array(*[F.lit(s) for s in salts])))
    )
    return _replication_race(keyed, k, group_col, id_col, n_buckets).select(
        F.col("_salt").alias("salt"),
        group_col, "rank", id_col, "weight", "sample_key",
    )


def _replication_race(
    keyed: DataFrame, k: int, group_col: str, id_col: str, n_buckets: int
) -> DataFrame:
    """The shared race core: ``keyed`` carries (group, id, _w >= 1,
    _salt); tickets, bucketed two-phase top-k and ranks are computed per
    (_salt, group) — with a literal ``_salt`` this is exactly the
    pre-r12 single-salt plan (the constant folds into the md5 strings).
    """
    tickets = F.expr(
        f"array_max(transform(sequence(0, CAST(_w AS INT) - 1),"
        f" r -> md5(concat(_salt, ':', CAST({id_col} AS STRING), ':',"
        " CAST(r AS STRING)))))"
    )
    # hash_bucket16(id, salt + ":bkt") spelled with the salt as a
    # column: md5(salt || ':bkt:' || id) — byte-identical input string
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(
                    F.col("_salt"), F.lit(":bkt:"),
                    F.col(id_col).cast("string"),
                )),
                1,
                4,
            ),
            16,
            10,
        ).cast("int") % n_buckets
    ).cast("int")
    keyed = keyed.withColumn("sample_key", tickets)
    w_local = Window.partitionBy("_salt", group_col, "_bkt").orderBy(
        F.desc("sample_key"), id_col
    )
    survivors = (
        keyed.withColumn("_bkt", bucket)
        .withColumn("_rn", F.row_number().over(w_local))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_bkt")
    )
    w_global = Window.partitionBy("_salt", group_col).orderBy(
        F.desc("sample_key"), id_col
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w_global).cast("int"))
        .filter(F.col("rank") <= k)
        .withColumnRenamed("_w", "weight")
    )
