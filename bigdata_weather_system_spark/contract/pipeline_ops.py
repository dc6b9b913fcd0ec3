"""Contract queries: training-data assembly operators.

The steps between a deduplicated corpus and a training run: packing
documents into fixed token budgets, chunking long documents into
overlapping windows, and measuring vocabulary coverage — each a
first-class 100 TB-shaped operator (scan-local token math, one bounded
shuffle, no Python in the row path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..operators.text import tokens
from .core import register, _t

#: DuckDB-side whitespace tokenization — identical to llm_ops._TOKS.
_TOKS = "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"


@register(
    "doc_sequence_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, len({_TOKS}) AS n_tokens FROM documents
    ),
    packed AS (
      SELECT doc_id, source, n_tokens,
             CAST(floor(
               (sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - n_tokens) / 2048.0) AS BIGINT) AS bin
      FROM t
    )
    SELECT source, bin,
           count(*)                  AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM packed GROUP BY source, bin
    """,
)
def doc_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming concat-and-pack: documents are laid end-to-end per source
    in doc_id order and cut into 2048-token bins — bin = exclusive-prefix
    token offset div budget, the deterministic streaming packer training
    pipelines use (greedy best-fit packing needs global state; offset
    packing is order-stable, one window + one aggregate). Per-source
    window partitioning keeps the prefix sums parallel; the doc_id
    ordering makes the layout reproducible across runs and engines."""
    d = _t(spark, sf_dir, "documents")
    t = d.select("doc_id", "source", F.size(tokens(F.col("text"))).alias("n_tokens"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = t.withColumn(
        "bin",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(2048.0)),
    )
    return packed.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


@register(
    "doc_chunk_windows",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    c AS (
      SELECT doc_id,
             unnest(range(0, CAST(floor((len(toks) - 1) / 24.0) AS BIGINT) + 1))
               AS chunk_idx,
             toks
      FROM t WHERE len(toks) > 0
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(len(list_slice(toks, 1 + chunk_idx * 24,
                               least(chunk_idx * 24 + 32, len(toks)))) AS INT)
             AS chunk_tokens,
           array_to_string(list_slice(toks, 1 + chunk_idx * 24,
                                      least(chunk_idx * 24 + 32, len(toks))), ' ')
             AS chunk_text
    FROM c
    """,
)
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window chunking (RAG / long-context prep): 32-token
    chunks at stride 24 (8-token overlap), one row per chunk. The chunk
    index range explodes from pure column math — no UDF, no shuffle at
    all: chunking is scan-local and the operator stays a projection at
    any corpus size. Tail chunks are kept (shorter than 32) so every
    token lands in ≥1 chunk."""
    chunk, stride = 32, 24
    d = _t(spark, sf_dir, "documents")
    t = d.select("doc_id", tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") > 0
    )
    idx = F.sequence(
        F.lit(0), F.floor((F.size("toks") - 1) / F.lit(float(stride))).cast("int")
    )
    c = t.select("doc_id", F.explode(idx).alias("chunk_idx"), "toks")
    sliced = F.slice(
        F.col("toks"),
        F.col("chunk_idx") * stride + 1,
        F.least(
            F.lit(chunk),
            F.size("toks") - F.col("chunk_idx") * stride,
        ),
    )
    return c.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(sliced).cast("int").alias("chunk_tokens"),
        F.concat_ws(" ", sliced).alias("chunk_text"),
    )


@register(
    "doc_vocab_coverage",
    oracle=f"""
    WITH tok AS (SELECT doc_id, lang, unnest({_TOKS}) AS token FROM documents),
    vocab AS (
      SELECT token FROM (
        SELECT token, count(*) AS freq,
               row_number() OVER (ORDER BY count(*) DESC, token ASC) AS rn
        FROM tok GROUP BY token
      ) WHERE rn <= 500
    ),
    per_doc AS (
      SELECT t.doc_id, t.lang,
             count(*) AS n_tokens,
             CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov
      FROM tok t LEFT JOIN vocab v ON t.token = v.token
      GROUP BY t.doc_id, t.lang
    )
    SELECT lang,
           count(*)                            AS n_docs,
           round(avg(n_oov * 1.0 / n_tokens), 6) AS avg_oov_rate,
           CAST(sum(n_oov) AS BIGINT)          AS total_oov
    FROM per_doc GROUP BY lang
    """,
)
def doc_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage: build the corpus top-500 token vocabulary
    (count desc, token asc — deterministic), then per-language
    out-of-vocabulary rates. The vocab is top-k over a partial-aggregated
    token count (TakeOrdered, no full sort) and is broadcast back —
    the corpus-side pass stays a map-side join however large the corpus;
    only the bounded token histogram shuffles."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(tokens(F.col("text"))).alias("token"))
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(500)
        .select("token")
    )
    marked = tok.join(
        F.broadcast(vocab.withColumn("_in_vocab", F.lit(1))), on="token", how="left"
    )
    per_doc = marked.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.col("n_oov") / F.col("n_tokens")), 6).alias("avg_oov_rate"),
        F.sum("n_oov").cast("long").alias("total_oov"),
    )


@register(
    "doc_length_bucketed_shards",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, len({_TOKS}) AS n_tokens,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 8 AS shard
      FROM documents
    )
    SELECT doc_id, shard, n_tokens,
           cast(row_number() OVER (PARTITION BY shard
                                   ORDER BY n_tokens, doc_id) AS BIGINT)
             AS position
    FROM t
    """,
)
def doc_length_bucketed_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed shard layout for training-batch efficiency:
    deterministic content-hash shard assignment (same md5-derived uniform
    as the split/sampling family — reshuffling-proof across reruns), then
    a length-sorted position WITHIN each shard so batches drawn
    sequentially have near-uniform lengths (minimal padding waste). One
    shuffle on the shard id; the within-shard sort is the window's local
    sort, never a global orderBy."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
               16, 10).cast("bigint") % 8
    )
    t = docs.select(
        "doc_id",
        shard.alias("shard"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("n_tokens", "doc_id")
    return t.withColumn(
        "position", F.row_number().over(w).cast("long")
    )


def _hrw_case_sql(n_shards: int, id_expr: str = "doc_id") -> str:
    """HRW (rendezvous) shard pick as portable SQL: the shard whose
    per-(key, shard) hash is the maximum, first-match ascending."""
    h = lambda s: (  # noqa: E731
        f"CAST(('0x' || substring(md5(CAST({id_expr} AS VARCHAR) "
        f"|| '#' || '{s}'), 1, 15)) AS BIGINT)"
    )
    mx = "greatest(" + ", ".join(h(s) for s in range(n_shards)) + ")"
    return (
        "CASE "
        + " ".join(
            f"WHEN {h(s)} = {mx} THEN {s}" for s in range(n_shards)
        )
        + " END"
    )


@register(
    "shard_rebalance_delta",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h,
             {_hrw_case_sql(16)} AS hrw16,
             {_hrw_case_sql(20)} AS hrw20
      FROM documents
    )
    SELECT 'mod' AS strategy,
           cast(count(*) AS BIGINT) AS n_docs,
           cast(sum(CASE WHEN h % 16 <> h % 20 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_moved,
           round(sum(CASE WHEN h % 16 <> h % 20 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS moved_frac
    FROM d
    UNION ALL
    SELECT 'rendezvous',
           cast(count(*) AS BIGINT),
           cast(sum(CASE WHEN hrw16 <> hrw20 THEN 1 ELSE 0 END) AS BIGINT),
           round(sum(CASE WHEN hrw16 <> hrw20 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6)
    FROM d
    """,
)
def shard_rebalance_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-rebalance impact analysis, 16 → 20 shards: under mod-hash
    nearly every key moves (expected 1 − 1/lcm-ish ≈ 80%+ churn — every
    moved key is cache/locality loss and re-replication traffic); under
    rendezvous (highest-random-weight) hashing only keys whose argmax
    lands on a NEW shard move — the theoretical minimum 4/20 = 20%.
    Both assignments are pure hash expressions evaluated in one scan;
    this is the planning query run before any resharding of a 100 TB
    keyed layout."""
    docs = _t(spark, sf_dir, "documents")

    def h(salt: str | None = None):
        e = F.col("doc_id").cast("string")
        if salt is not None:
            e = F.concat(e, F.lit("#"), F.lit(salt))
        return F.conv(F.substring(F.md5(e), 1, 15), 16, 10).cast("long")

    def hrw(n: int):
        hashes = [h(str(s)) for s in range(n)]
        mx = F.greatest(*hashes)
        pick = F.when(hashes[0] == mx, 0)
        for s in range(1, n):
            pick = pick.when(hashes[s] == mx, s)
        return pick

    d = docs.select(
        h().alias("hv"),
        hrw(16).alias("hrw16"),
        hrw(20).alias("hrw20"),
    )
    mod_moved = (F.col("hv") % 16 != F.col("hv") % 20).cast("long")
    hrw_moved = (F.col("hrw16") != F.col("hrw20")).cast("long")
    agg = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(mod_moved).alias("mod_moved"),
        F.sum(hrw_moved).alias("hrw_moved"),
    )
    mod_row = agg.select(
        F.lit("mod").alias("strategy"),
        "n_docs",
        F.col("mod_moved").alias("n_moved"),
        F.round(F.col("mod_moved").cast("double") / F.col("n_docs"), 6).alias(
            "moved_frac"
        ),
    )
    hrw_row = agg.select(
        F.lit("rendezvous").alias("strategy"),
        "n_docs",
        F.col("hrw_moved").alias("n_moved"),
        F.round(F.col("hrw_moved").cast("double") / F.col("n_docs"), 6).alias(
            "moved_frac"
        ),
    )
    return mod_row.unionByName(hrw_row)


@register(
    "daily_content_digests",
    oracle="""
    WITH r AS (
      SELECT CAST(ts AS DATE) AS day,
             md5(coalesce(CAST(event_id AS VARCHAR), '<NULL>') || '|'
                 || coalesce(CAST(user_id AS VARCHAR), '<NULL>') || '|'
                 || coalesce(event_type, '<NULL>') || '|'
                 || coalesce(CAST(CAST(round(value, 6) AS DECIMAL(20,6))
                                  AS VARCHAR), '<NULL>'))
               AS row_md5
      FROM events
    )
    SELECT day,
           cast(count(*) AS BIGINT) AS n_rows,
           md5(string_agg(row_md5, '' ORDER BY row_md5)) AS content_digest
    FROM r GROUP BY day
    """,
)
def daily_content_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style per-partition content digests: every row hashes to a
    canonical md5, and each day's digest is the md5 of its SORTED row
    hashes — order-insensitive, so two snapshots of a day match iff
    their content matches, regardless of file layout or row order. This
    is the change-detection primitive behind incremental syncs and
    cache invalidation: compare 30 digests instead of re-reading 30 days.
    Floats are canonicalized through DECIMAL(20,6) so both engines print
    identical tokens; per-day sort happens inside each group (bounded by
    the day's rows), never globally. NULL fields are canonicalized to an
    explicit '<NULL>' sentinel on BOTH sides — concat_ws silently skips
    NULLs while SQL '||' nulls the whole row hash, so without the
    sentinel a single NULL event_type would silently diverge the two
    digests."""
    ev = _t(spark, sf_dir, "events")
    nn = lambda c: F.coalesce(c, F.lit("<NULL>"))  # noqa: E731
    row_md5 = F.md5(
        F.concat_ws(
            "|",
            nn(F.col("event_id").cast("string")),
            nn(F.col("user_id").cast("string")),
            nn(F.col("event_type")),
            nn(F.round(F.col("value"), 6).cast("decimal(20,6)").cast("string")),
        )
    )
    return (
        ev.select(F.to_date("ts").alias("day"), row_md5.alias("row_md5"))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.md5(
                F.array_join(F.array_sort(F.collect_list("row_md5")), "")
            ).alias("content_digest"),
        )
    )


@register(
    "user_erasure_audit",
    oracle="""
    WITH del AS (SELECT DISTINCT user_id FROM events WHERE user_id % 37 = 0),
    after AS (
      SELECT e.* FROM events e
      WHERE e.user_id NOT IN (SELECT user_id FROM del)
    )
    SELECT (SELECT cast(count(*) AS BIGINT) FROM events)  AS rows_before,
           (SELECT cast(count(*) AS BIGINT) FROM after)   AS rows_after,
           (SELECT cast(count(*) AS BIGINT) FROM del)     AS n_erased_users,
           (SELECT cast(count(*) AS BIGINT) FROM after
             WHERE user_id % 37 = 0)                      AS residual_rows
    """,
)
def user_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure (GDPR Art. 17) propagation + audit: given a
    deletion list (here: every 37th user), rewrite the fact table with a
    broadcast anti-join — untouched rows stream through without a
    shuffle — and emit the audit row a compliance pipeline records:
    before/after counts, erased-key count, and residual rows (MUST be
    zero). At 100 TB the deletion list is always broadcast-sized and the
    rewrite is a narrow scan per partition; combine with the
    date-partitioned layout to rewrite only partitions that contain the
    keys (manifest min/max pruning)."""
    ev = _t(spark, sf_dir, "events")
    del_keys = (
        ev.filter(F.col("user_id") % 37 == 0).select("user_id").distinct()
    )
    after = ev.join(F.broadcast(del_keys), "user_id", "left_anti").cache()
    return (
        ev.agg(F.count(F.lit(1)).alias("rows_before"))
        .crossJoin(after.agg(F.count(F.lit(1)).alias("rows_after")))
        .crossJoin(del_keys.agg(F.count(F.lit(1)).alias("n_erased_users")))
        .crossJoin(
            after.filter(F.col("user_id") % 37 == 0).agg(
                F.count(F.lit(1)).alias("residual_rows")
            )
        )
    )


@register(
    "lineitem_column_stats",
    oracle="""
    WITH s AS (
      SELECT 'l_quantity' AS column_name,
             count(*) AS n_rows,
             cast(count(*) - count(l_quantity) AS BIGINT) AS n_nulls,
             cast(count(DISTINCT l_quantity) AS BIGINT)   AS ndv,
             round(min(l_quantity), 4) AS min_value,
             round(max(l_quantity), 4) AS max_value,
             round(quantile_cont(l_quantity, 0.25), 4) AS p25,
             round(median(l_quantity), 4)              AS p50,
             round(quantile_cont(l_quantity, 0.75), 4) AS p75
      FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', count(*),
             cast(count(*) - count(l_extendedprice) AS BIGINT),
             cast(count(DISTINCT l_extendedprice) AS BIGINT),
             round(min(l_extendedprice), 4), round(max(l_extendedprice), 4),
             round(quantile_cont(l_extendedprice, 0.25), 4),
             round(median(l_extendedprice), 4),
             round(quantile_cont(l_extendedprice, 0.75), 4)
      FROM lineitem
      UNION ALL
      SELECT 'l_discount', count(*),
             cast(count(*) - count(l_discount) AS BIGINT),
             cast(count(DISTINCT l_discount) AS BIGINT),
             round(min(l_discount), 4), round(max(l_discount), 4),
             round(quantile_cont(l_discount, 0.25), 4),
             round(median(l_discount), 4),
             round(quantile_cont(l_discount, 0.75), 4)
      FROM lineitem
    )
    SELECT * FROM s
    """,
)
def lineitem_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics (the optimizer-stats collection an
    engine runs before CBO): per column — row/null counts, exact NDV,
    min/max, and EXACT interpolated quartiles — unpivoted to a row per
    column. The quartiles are exact (they hash-match quantile_cont) yet
    fully distributed: instead of `percentile(value, q, freq)` — whose
    final aggregation buffers the whole value histogram in ONE task, an
    O(NDV) single-reducer state for near-unique columns like
    l_extendedprice — the plan buckets the histogram by a deterministic
    monotone function of the value (floor((v-min)/span*P)),
    builds a global prefix-sum of frequencies (per-bucket window
    + a P-row partition-offset relation, P = shuffle parallelism, never
    data-sized), and reads each quantile's bracketing values with plain
    partial-aggregating MAX(CASE) passes. Largest per-task state is one
    range partition of the histogram (~NDV/P), so the same plan survives
    a 100× scale-up; the only single-task window runs over the P-row
    offsets relation."""
    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    # ONE scan: unpivot the measured columns map-side (stack — no
    # shuffle, rows × n_cols) so every downstream consumer keys on
    # column_name instead of being a per-column subplan crossJoined at
    # the end (the previous shape compiled to 21 parquet scans and 42
    # exchanges; per-query wall time at sf0.1 was ~90% stage-scheduling
    # overhead, identical at sf0.01).
    stack_args = ", ".join(f"'{c}', {c}" for c in cols)
    stacked = li.select(
        F.expr(f"stack({len(cols)}, {stack_args})").alias(
            "column_name", "_v"
        )
    )
    # Value histogram per column: groupBy combines map-side; result is
    # NDV-sized per column, the relation every statistic derives from.
    g = stacked.groupBy("column_name", "_v").agg(
        F.count(F.lit(1)).alias("_n")
    )
    nn = F.col("_v").isNotNull()
    base = g.groupBy("column_name").agg(
        F.sum("_n").alias("n_rows"),
        F.sum(F.when(~nn, F.col("_n")).otherwise(0)).alias("n_nulls"),
        F.sum(nn.cast("long")).alias("ndv"),
        F.round(F.min("_v"), 4).alias("min_value"),
        F.round(F.max("_v"), 4).alias("max_value"),
    )
    # Bucket the not-null histogram with a DETERMINISTIC monotone
    # function of the value: _pid = floor((v - min) / span * P). The
    # offset and rank consumers below must agree on every row's bucket;
    # a pure column function guarantees that even if the subplan is
    # recomputed, where a sampled repartitionByRange drew different
    # bounds per evaluation and needed an eager localCheckpoint to pin
    # them (round-4 ADVICE #3 / round-5 What's-wrong #3). Monotone ⇒
    # bucket order == value order, so prefix-sum rank algebra holds.
    # Value-skew makes buckets uneven (worst case one bucket = NDV
    # rows); uniform-ish optimizer-stats columns sit near NDV/P.
    npart = 32
    mm = g.filter(nn).groupBy("column_name").agg(
        F.min(F.col("_v").cast("double")).alias("_vmin"),
        F.max(F.col("_v").cast("double")).alias("_vmax"),
    )
    span = F.col("_vmax") - F.col("_vmin")
    pid = F.when(
        span > 0,
        F.least(
            F.lit(npart - 1),
            F.floor(
                (F.col("_v").cast("double") - F.col("_vmin"))
                / span
                * npart
            ).cast("int"),
        ),
    ).otherwise(F.lit(0))
    hist = (
        g.filter(nn)
        .join(F.broadcast(mm), "column_name")
        .withColumn("_pid", pid)
        .drop("_vmin", "_vmax")
    )
    ptot = hist.groupBy("column_name", "_pid").agg(
        F.sum("_n").alias("_ptot")
    )
    # Exclusive prefix over the ≤P-row per-bucket totals, per column —
    # the window partitions by column_name, so state is bounded by
    # parallelism, not data.
    offs = ptot.withColumn(
        "_off",
        F.coalesce(
            F.sum("_ptot").over(
                Window.partitionBy("column_name")
                .orderBy("_pid")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("column_name", "_pid", "_off")
    ntot = ptot.groupBy("column_name").agg(F.sum("_ptot").alias("_nt"))
    # Per-value exclusive cumulative frequency: bucket-local window
    # (~NDV/P rows per task) + broadcast bucket offsets.
    cum = (
        hist.join(F.broadcast(offs), ["column_name", "_pid"])
        .withColumn(
            "_cum_excl",
            F.col("_off")
            + F.coalesce(
                F.sum("_n").over(
                    Window.partitionBy("column_name", "_pid")
                    .orderBy("_v")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .join(F.broadcast(ntot), "column_name")
    )
    quartiles = [("p25", 0.25), ("p50", 0.50), ("p75", 0.75)]
    aggs = []
    for name, q in quartiles:
        pos = (F.col("_nt") - F.lit(1)).cast("double") * F.lit(q)

        def in_rank(r):
            return (F.col("_cum_excl") <= r) & (
                r < F.col("_cum_excl") + F.col("_n")
            )

        aggs.append(
            F.max(F.when(in_rank(F.floor(pos)), F.col("_v"))).alias(
                f"_{name}_lo"
            )
        )
        aggs.append(
            F.max(F.when(in_rank(F.ceil(pos)), F.col("_v"))).alias(
                f"_{name}_hi"
            )
        )
    qrow = cum.groupBy("column_name").agg(F.max("_nt").alias("_nt"), *aggs)
    sel = [F.col("column_name")]
    for name, q in quartiles:
        pos = (F.col("_nt") - F.lit(1)).cast("double") * F.lit(q)
        frac = pos - F.floor(pos)
        sel.append(
            F.round(
                F.col(f"_{name}_lo")
                + frac * (F.col(f"_{name}_hi") - F.col(f"_{name}_lo")),
                4,
            ).alias(name)
        )
    return base.join(qrow.select(*sel), "column_name", "left").select(
        "column_name",
        "n_rows",
        "n_nulls",
        "ndv",
        "min_value",
        "max_value",
        "p25",
        "p50",
        "p75",
    )


@register(
    "label_leakage_audit",
    oracle="""
    WITH cutoff AS (SELECT min(ts) + INTERVAL 20 DAY AS c FROM events),
    labels AS (
      SELECT user_id, min(ts) AS label_ts
      FROM events, cutoff
      WHERE ts >= c AND event_type = 'purchase'
      GROUP BY user_id
    ),
    feat AS (
      SELECT e.user_id, l.label_ts,
             max(CASE WHEN e.ts < l.label_ts THEN e.ts END)
               AS exact_feature_ts,
             max(CASE WHEN CAST(e.ts AS DATE) < CAST(l.label_ts AS DATE)
                      THEN e.ts END) AS day_grain_feature_ts,
             max(CASE WHEN CAST(e.ts AS DATE) = CAST(l.label_ts AS DATE)
                       AND e.ts > l.label_ts
                      THEN 1 ELSE 0 END) AS day_grain_would_leak
      FROM events e JOIN labels l ON l.user_id = e.user_id
      WHERE e.ts < l.label_ts
            OR CAST(e.ts AS DATE) = CAST(l.label_ts AS DATE)
      GROUP BY e.user_id, l.label_ts
    )
    SELECT CAST(count(*) AS BIGINT)                    AS n_labeled_users,
           CAST(sum(CASE WHEN exact_feature_ts >= label_ts
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_leaks,
           CAST(sum(day_grain_would_leak) AS BIGINT)   AS n_day_grain_leaks,
           round(sum(day_grain_would_leak) * 1.0 / count(*), 6)
                                                       AS day_grain_leak_rate,
           round(avg(CASE WHEN exact_feature_ts < label_ts
                          THEN epoch(label_ts) - epoch(exact_feature_ts)
                     END) / 3600, 6)                   AS avg_lead_hours
    FROM feat
    """,
)
def label_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time hygiene audit for a feature-store join: labels =
    each user's first post-cutoff purchase; features = that user's
    event history. The EXACT as-of join (strict ts < label_ts, the shape
    `feature_store_pit_join` implements) must never leak — n_exact_leaks
    is structurally 0 and the audit proves it — while a DAY-GRAIN
    snapshot join (features valid per calendar day, the common feature-
    store cadence) leaks whenever a same-day event lands after the
    label: n_day_grain_leaks counts the users whose training rows would
    silently contain the future at day cadence, the thing this audit
    exists to catch before a model trains on it. One equi-join on
    user_id + one groupBy; the label relation is per-user (≪ events);
    lead time summarizes how much margin the exact join has. Scale: the
    join keys on user_id with per-user fan-in bounded by history length;
    no window, no pair stage."""
    ev = _t(spark, sf_dir, "events")
    cutoff = ev.agg(
        (F.min("ts") + F.expr("INTERVAL 20 DAYS")).alias("c")
    )
    labels = (
        ev.crossJoin(F.broadcast(cutoff))
        .filter(
            (F.col("ts") >= F.col("c"))
            & (F.col("event_type") == "purchase")
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("label_ts"))
    )
    e = ev.select("user_id", "ts")
    joined = e.join(labels, "user_id").filter(
        (F.col("ts") < F.col("label_ts"))
        | (F.to_date("ts") == F.to_date("label_ts"))
    )
    feat = joined.groupBy("user_id", "label_ts").agg(
        F.max(
            F.when(F.col("ts") < F.col("label_ts"), F.col("ts"))
        ).alias("exact_feature_ts"),
        F.max(
            F.when(
                F.to_date("ts") < F.to_date("label_ts"), F.col("ts")
            )
        ).alias("day_grain_feature_ts"),
        F.max(
            F.when(
                (F.to_date("ts") == F.to_date("label_ts"))
                & (F.col("ts") > F.col("label_ts")),
                1,
            ).otherwise(0)
        ).alias("day_grain_would_leak"),
    )
    lead_h = F.when(
        F.col("exact_feature_ts") < F.col("label_ts"),
        F.col("label_ts").cast("double")
        - F.col("exact_feature_ts").cast("double"),
    )
    return feat.agg(
        F.count(F.lit(1)).cast("long").alias("n_labeled_users"),
        F.sum(
            (F.col("exact_feature_ts") >= F.col("label_ts")).cast("long")
        ).alias("n_exact_leaks"),
        F.sum("day_grain_would_leak").cast("long").alias(
            "n_day_grain_leaks"
        ),
        F.round(
            F.sum("day_grain_would_leak") * 1.0 / F.count(F.lit(1)), 6
        ).alias("day_grain_leak_rate"),
        F.round(F.avg(lead_h) / 3600, 6).alias("avg_lead_hours"),
    )


_FD_CANDIDATES = [
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("lineitem", "l_orderkey", "l_shipdate"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("orders", "o_orderkey", "o_orderstatus"),
]


def _fd_oracle() -> str:
    selects = []
    for table, x, y in _FD_CANDIDATES:
        selects.append(f"""
    SELECT '{table}' AS tbl, '{x}' AS determinant, '{y}' AS dependent,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_groups,
           CAST(sum(CASE WHEN ndv > 1 THEN n ELSE 0 END) AS BIGINT)
             AS n_rows_in_violation,
           round(1.0 - sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS fd_strength
    FROM (SELECT {x}, count(DISTINCT {y}) AS ndv, count(*) AS n
          FROM {table} GROUP BY {x})""")
    return " UNION ALL ".join(selects)


@register("functional_dependency_audit", oracle=_fd_oracle())
def functional_dependency_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Functional-dependency profiling — the schema-inference /
    data-quality pass that tells a modeler which columns are really
    determined by which keys: for each candidate X→Y, the share of
    X-groups carrying more than one distinct Y (an exact FD has
    strength 1.0; `l_orderkey → o_orderstatus`-style dimension FDs hold,
    fact-to-fact candidates like `l_partkey → l_suppkey` measurably
    don't). One groupBy + distinct-count per candidate, unioned — each
    partial-aggregates per key; candidates are a static audit list, so
    the plan is a fixed-width union, linear per candidate."""
    pieces = []
    for table, x, y in _FD_CANDIDATES:
        t = _t(spark, sf_dir, table)
        g = t.groupBy(x).agg(
            F.countDistinct(y).alias("ndv"), F.count(F.lit(1)).alias("n")
        )
        pieces.append(
            g.agg(
                F.lit(table).alias("tbl"),
                F.lit(x).alias("determinant"),
                F.lit(y).alias("dependent"),
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                F.sum((F.col("ndv") > 1).cast("long"))
                .cast("long")
                .alias("n_violating_groups"),
                F.sum(F.when(F.col("ndv") > 1, F.col("n")).otherwise(0))
                .cast("long")
                .alias("n_rows_in_violation"),
                F.round(
                    1.0
                    - F.sum((F.col("ndv") > 1).cast("long"))
                    * 1.0
                    / F.count(F.lit(1)),
                    6,
                ).alias("fd_strength"),
            )
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out
