"""Distributed BPE tokenizer training (Sennrich et al. 2016).

The tokenizer-training stage of an LLM data pipeline, shaped for a 100 TB
corpus: the corpus collapses ONCE into a (word, count) relation (the only
corpus-sized shuffle — vocabulary is tiny relative to the token stream),
and every merge round after that runs on the word table only:

1. count adjacent symbol pairs weighted by word frequency — one
   ``zip_with`` bigram explode + map-side-combining groupBy;
2. pick the most frequent pair (deterministic tie-break: count desc,
   then lexicographic) — a 1-row collect, exactly like broadcasting a
   join side;
3. apply the merge to every word's symbol sequence with a greedy
   left-to-right ``F.aggregate`` fold (pure column expression — no
   Python row path), lineage-truncated per round because the word table
   feeds both the next count and the next apply.

Driver state is the merge table itself (what the trainer exists to
produce); per-round cost is O(|vocabulary|), independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over lowercased whitespace tokens — the one
    corpus-sized aggregation of BPE training."""
    from .text import tokens

    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _apply_merge(syms, a: str, b: str):
    """Greedy left-to-right application of merge (a, b) → ab to a symbol
    array, as a single fold: carry the previous unmerged symbol; when
    (prev, cur) == (a, b) emit the merged token and clear the carry (a
    merged token cannot immediately re-merge within the same round —
    standard BPE single-pass semantics)."""
    ab = a + b
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(acc, s):
        hit = (acc["prev"] == F.lit(a)) & (s == F.lit(b))
        return (
            F.when(
                hit,
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(ab))).alias("out"),
                    F.lit(None).cast("string").alias("prev"),
                ),
            )
            .when(
                acc["prev"].isNotNull(),
                F.struct(
                    F.concat(acc["out"], F.array(acc["prev"])).alias("out"),
                    s.alias("prev"),
                ),
            )
            .otherwise(F.struct(acc["out"].alias("out"), s.alias("prev")))
        )

    def finish(acc):
        return F.when(
            acc["prev"].isNotNull(), F.concat(acc["out"], F.array(acc["prev"]))
        ).otherwise(acc["out"])

    return F.aggregate(syms, init, step, finish)


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merge rules from a document corpus.

    Returns (merge list [(rank, left, right, pair_count)], the same as a
    DataFrame, the final word table with its symbol sequences).
    Deterministic: ties break on (count desc, left asc, right asc), so
    two runs — and the pytest reference implementation — agree exactly.
    """
    spark = df.sparkSession
    words = word_counts(df, text_col).select(
        "word",
        "cnt",
        F.filter(F.split("word", ""), lambda c: c != "").alias("syms"),
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        n_sym = F.size("syms")
        bigrams = words.filter(n_sym >= 2).select(
            "cnt",
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, n_sym - 1),
                    F.slice("syms", 2, n_sym - 1),
                    lambda x, y: F.struct(x.alias("l"), y.alias("r")),
                )
            ).alias("p"),
        )
        counts = bigrams.groupBy("p.l", "p.r").agg(F.sum("cnt").alias("n"))
        best = counts.orderBy(
            F.col("n").desc(), F.col("l").asc(), F.col("r").asc()
        ).limit(1).collect()
        if not best:
            break
        a, b, n = best[0]["l"], best[0]["r"], int(best[0]["n"])
        merges.append((r, a, b, n))
        # the word table feeds both this round's counts and the next
        # round's apply — truncate lineage so the fold chain doesn't
        # re-evaluate (and deepen) every round
        words = words.withColumn(
            "syms", _apply_merge(F.col("syms"), a, b)
        ).localCheckpoint(eager=True)
    merge_df = spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count bigint"
    )
    return merges, merge_df, words


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge table to new text: per word, fold the merges
    in rank order (the standard encode; each rule is one column fold, so
    the whole encode is a single narrow projection)."""
    from .text import tokens

    out = df.select("*", tokens(F.col(text_col)).alias("_words"))
    enc = F.transform(
        "_words",
        lambda w: F.filter(F.split(w, ""), lambda c: c != ""),
    )
    def rule(a: str, b: str):
        # closure factory, NOT default-arg lambda: PySpark reads lambda
        # arity to pick the HOF signature, and default args count
        return lambda s: _apply_merge(s, a, b)

    col = enc
    for _, a, b, _n in merges:
        col = F.transform(col, rule(a, b))
    return out.withColumn("bpe_tokens", F.flatten(col)).drop("_words")
