"""Text-analysis operators for training-data pipelines.

All pure column expressions (JVM-side, whole-stage codegen) — no Python UDFs
anywhere in this module, so the hot path scales to 100 TB of documents
without Arrow transfer costs.

Operators: tokenization, token counting, quality scoring
(length/punctuation/stopword/digit ratios), n-gram-heuristic language ID,
document fingerprinting (normalized md5 + shingle set).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Marker stopwords per language for the n-gram/stopword language heuristic.
#: Small on purpose: the heuristic is a scoring scaffold — swap in real lists
#: (or fastText) for production quality; the Spark plumbing is identical.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "nicht", "ist"),
    "en": ("the", "and", "of", "to", "is", "a"),
    "es": ("el", "la", "de", "que", "los", "es"),
    "fr": ("le", "la", "les", "des", "est", "une"),
    "zh": ("de", "shi", "le", "bu", "wo", "zai"),
}

_PUNCT_RE = r"[.,;:!?'\"()\[\]{}<>-]"
_WS_RE = r"\s+"


def tokens(text: Column) -> Column:
    """Lower-cased whitespace tokens with empties removed."""
    return F.filter(F.split(F.lower(text), _WS_RE), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: split on whitespace AND word/non-word
    boundaries (a cheap BPE proxy — counts punctuation and digit runs as
    their own tokens, ~what a byte-level BPE does to clean text)."""
    pieces = F.split(text, r"(?<=\W)(?=\w)|(?<=\w)(?=\W)|\s+")
    return F.size(F.filter(pieces, lambda t: F.trim(t) != ""))


def char_ratio(text: Column, pattern: str) -> Column:
    """Fraction of characters matching ``pattern`` (regex char class)."""
    clen = F.length(text)
    removed = F.length(F.regexp_replace(text, pattern, ""))
    return F.when(clen > 0, (clen - removed) / clen).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, stopwords: tuple[str, ...] | None = None) -> Column:
    sw = stopwords or LANG_MARKERS["en"]
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*sw)))
    n = F.size(toks)
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append document-quality features: counts + ratios used by C4/Gopher
    style filters. Pure column math — one narrow stage."""
    t = F.col(text_col)
    toks = tokens(t)
    n_toks = F.size(toks)
    return df.withColumns(
        {
            "n_chars_q": F.length(t),
            "n_tokens": n_toks,
            "avg_token_len": F.when(
                n_toks > 0, F.length(F.regexp_replace(t, _WS_RE, "")) / n_toks
            ).otherwise(F.lit(0.0)),
            "punct_ratio": char_ratio(t, _PUNCT_RE),
            "digit_ratio": char_ratio(t, r"[0-9]"),
            "stopword_ratio": stopword_ratio(t),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite 0..1 quality score from the features (heuristic weights)."""
    feat = quality_features(df, text_col)
    score = (
        F.least(F.col("n_tokens") / 50.0, F.lit(1.0)) * 0.4
        + (1 - F.least(F.col("punct_ratio") * 5, F.lit(1.0))) * 0.2
        + (1 - F.least(F.col("digit_ratio") * 5, F.lit(1.0))) * 0.2
        + F.least(F.col("stopword_ratio") * 4, F.lit(1.0)) * 0.2
    )
    return feat.withColumn("quality_score", F.round(score, 4))


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-hit counts (the language-ID signal)."""
    toks = tokens(text)

    def hit(markers):
        # NB: the lambda must take exactly one arg — PySpark reads lambda
        # arity to decide between (value) and (value, index) HOF signatures.
        return lambda t: t.isin(*markers)

    return {
        lang: F.size(F.filter(toks, hit(markers)))
        for lang, markers in sorted(LANG_MARKERS.items())
    }


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "predicted_lang") -> DataFrame:
    """Argmax language by marker hits; ties → alphabetically first language.

    Decision = greatest(scores) + first-match coalesce, all codegen'd column
    math, trivially reproducible in ANSI SQL for the oracle.
    """
    scores = lang_scores(F.col(text_col))
    max_score = F.greatest(*scores.values())
    best = F.coalesce(
        *[
            F.when(scores[lang] == max_score, F.lit(lang))
            for lang in sorted(scores)
        ]
    )
    out = df
    for lang, score in scores.items():
        # long, matching the BIGINT the SQL-side len() yields in the oracle
        out = out.withColumn(f"score_{lang}", score.cast("long"))
    return out.withColumn(out_col, best)


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lower, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(text), _WS_RE, " "))


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Deterministic content fingerprint = md5 of the normalized text.

    md5 is chosen (over xxhash64) because it is bit-identical across engines
    — the DuckDB oracle can reproduce it; use ``F.xxhash64`` internally when
    only Spark-side identity is needed (it's faster)."""
    return df.withColumn(out_col, F.md5(normalize_text(F.col(text_col))))


def rolling_hash(text: Column, base: int = 31, mod: int = 2147483647) -> Column:
    """Polynomial (Rabin-Karp) rolling hash over character code points —
    the classic incremental document fingerprint. Left-fold
    ``acc*base + code (mod m)`` via a codegen'd higher-order function; with
    base=31 this reproduces Java's String.hashCode stream mod m, and the
    same fold is expressible in ANSI-ish SQL (list_reduce) so it is
    oracle-checkable, unlike engine-specific hash builtins."""
    chars = F.filter(F.split(text, ""), lambda c: c != "")
    codes = F.transform(chars, lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + c) % mod,
    )


def rolling_fingerprint(
    df: DataFrame, text_col: str = "text", out_col: str = "rolling_fp"
) -> DataFrame:
    """Rolling-hash fingerprint of the normalized text (the cheap
    incremental cousin of the md5 ``fingerprint``)."""
    return df.withColumn(out_col, rolling_hash(normalize_text(F.col(text_col))))


def kgram_hashes(text: Column, k: int = 5, hash: str = "xxhash64") -> Column:
    """Hash of every character k-gram, one array per row.

    ``hash='xxhash64'`` (default) is the production path — one JVM hash
    per gram, no string materialization beyond the substring.
    ``hash='md5'`` keys the gram by the top 60 bits of its md5 — ~3×
    the cost, but bit-identical in DuckDB
    (``('0x' || substring(md5(g), 1, 15))::BIGINT``), which makes every
    downstream selection (winnowing, sketches) value-checkable by the
    oracle. Same int64 range either way; the winnowing guarantee only
    needs a deterministic hash."""
    empty = F.array().cast("array<bigint>")
    n_grams = F.length(text) - F.lit(k - 1)

    def h(g: Column) -> Column:
        if hash == "md5":
            return F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
        return F.xxhash64(g)

    # sequence(1, n) DESCENDS when n < 1 — guard short texts explicitly
    return F.when(n_grams < 1, empty).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
            lambda i: h(text.substr(i, F.lit(k))),
        )
    )


def sliding_min(hashes: Column, window: int) -> Column:
    """Per-position minimum over a sliding window of ``window`` elements.

    Formulated as a chain of ``window-1`` zip_with(least) merges of shifted
    slices — O(window·n) per row. The naive nested form
    ``transform(sequence(...), j -> array_min(slice(hashes, j, w)))``
    re-evaluates the whole ``hashes`` expression for EVERY window position
    (higher-order lambdas inline their free variables), which turns a 2 KB
    document into millions of hash evaluations — O(n²) and unusable.
    ``hashes`` here is referenced ``window`` times, which also stops
    CollapseProject from re-inlining an expensive upstream expression.
    """
    out_len = F.greatest(F.size(hashes) - F.lit(window - 1), F.lit(0))
    cur = F.slice(hashes, F.lit(1), out_len)
    for off in range(1, window):
        shifted = F.slice(hashes, F.lit(1 + off), out_len)
        cur = F.zip_with(cur, shifted, lambda a, b: F.least(a, b))
    return cur


def winnow_fingerprints(
    text: Column, k: int = 5, window: int = 4, hash: str = "xxhash64"
) -> Column:
    """Winnowing fingerprint set (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    the MOSS algorithm): hash every character k-gram, slide a window of
    ``window`` consecutive hashes, keep each window's minimum, dedupe.

    Guarantees: every match of length ≥ k+window-1 between two documents
    shares a fingerprint, while only ~2/(window+1) of hashes are kept.
    Entirely codegen'd array expressions — no explode, no shuffle; the set
    stays one array per row until the caller explodes it for an inverted
    index.
    """
    return F.array_distinct(
        sliding_min(kgram_hashes(text, k, hash=hash), window)
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles (the unit set for Jaccard/MinHash).

    Built by zipping ``n`` shifted views of the token array
    (``zip_with(toks[0:], toks[1:], concat)`` …) instead of the obvious
    ``transform(sequence(...), i -> concat_ws(slice(toks, i, n)))`` —
    per-index ``slice`` inside an interpreted lambda re-copies a sub-array
    per shingle and measured ~10× slower end-to-end; the shifted-zip form
    does one linear pass per shingle word. Same positional order, same
    ``array_distinct`` first-occurrence semantics.

    Texts with fewer than ``n`` tokens yield an empty array (the
    ``greatest`` guard keeps ``slice`` lengths positive for short docs).
    """
    toks = tokens(text)
    n_shingles = F.size(toks) - F.lit(n - 1)
    width = F.greatest(n_shingles, F.lit(1))
    acc = F.slice(toks, 1, width)
    for k in range(2, n + 1):
        acc = F.zip_with(
            acc,
            F.slice(toks, k, width),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(n_shingles < 1, F.array().cast("array<string>")).otherwise(
        F.array_distinct(acc)
    )


def hash_split(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "split",
    train_pct: int = 80,
    valid_pct: int = 10,
) -> DataFrame:
    """Deterministic content-hash train/valid/test split.

    Bucket = top 60 bits of md5(normalized text) mod 100 — stable across
    runs, partitionings, and engines (no ``rand()``), and keyed on CONTENT
    so byte-identical duplicates always land in the same split (the
    train/test-leakage guard a sampling split doesn't give). Pure column
    math; at 100 TB this is a free projection on the scan.
    """
    bucket = (
        F.conv(F.substring(F.md5(normalize_text(F.col(text_col))), 1, 15), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + valid_pct, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn(out_col, split)


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k TF-IDF terms per document.

    tf = raw term count per (doc, term); idf = ln((N+1)/(df+1)) + 1
    (smoothed); rank per doc on the ROUNDED score (desc) with term-asc
    tie-break so the cut is deterministic at compare precision.

    Shape: explode → two hash aggs (doc-term, term) → broadcast of the
    1-row corpus count → per-doc window top-k (``top_n_per_key``). The
    term-df side aggregates BEFORE joining back, so the join carries one
    row per distinct term, not one per posting.
    """
    from .latest import top_n_per_key

    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
    tf = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfc = tf.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("_n_docs"))
    scored = (
        tf.join(dfc, on="token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.col("_n_docs") + 1.0) / (F.col("_df") + 1.0)) + 1.0),
                6,
            ),
        )
    )
    return top_n_per_key(
        scored, [id_col], [F.desc("tfidf"), F.asc("token")], n=k
    ).select(id_col, "token", "tf", "tfidf")


def word_ngrams(text: Column, n: int = 2) -> Column:
    """All n-word grams IN ORDER, duplicates kept (unlike ``word_shingles``
    which dedupes into a set) — the unit for repetition statistics, where
    the duplicate count IS the signal. Same short-text guard, same
    shifted-zip construction (per-index ``slice`` in an interpreted lambda
    re-copies a sub-array per gram and measured ~10× slower)."""
    toks = tokens(text)
    n_grams = F.size(toks) - F.lit(n - 1)
    width = F.greatest(n_grams, F.lit(1))
    acc = F.slice(toks, 1, width)
    for k in range(2, n + 1):
        acc = F.zip_with(
            acc,
            F.slice(toks, k, width),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(n_grams < 1, F.array().cast("array<string>")).otherwise(acc)


def repetition_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document: distinct-token ratio,
    most-frequent-token fraction, most-frequent-bigram fraction.

    Shape: two explode → (doc, gram) hash-agg → per-doc hash-agg pipelines
    joined on doc id. Each shuffle carries one row per DISTINCT gram per
    doc (partial counts combine map-side), so a 100 TB corpus shuffles its
    vocabulary, not its text. Documents with zero tokens drop out (no
    repetition signal is defined for them).
    """
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w"))
    uni = (
        tok.groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens_r"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("max_tf"),
        )
    )
    big = df.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), 2)).alias("b")
    )
    bagg = (
        big.groupBy(id_col, "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.sum("c").alias("n_bigrams"), F.max("c").alias("max_bf"))
    )
    out = uni.join(bagg, on=id_col, how="left")
    return out.select(
        F.col(id_col),
        F.col("n_tokens_r"),
        F.round(F.col("n_distinct") / F.col("n_tokens_r"), 6).alias("distinct_ratio"),
        F.round(F.col("max_tf") / F.col("n_tokens_r"), 6).alias("top_token_frac"),
        F.round(
            F.coalesce(F.col("max_bf") / F.col("n_bigrams"), F.lit(0.0)), 6
        ).alias("top_bigram_frac"),
    )


def bm25_scores(
    df,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
):
    """Okapi BM25 (Robertson/Lucene idf variant) of every document against
    a bag of query terms — the lexical-retrieval scorer a corpus-curation
    or RAG pipeline runs before any embedding stage.

    score(d) = Σ_t ln(1 + (N − df_t + 0.5)/(df_t + 0.5))
                 · tf_td·(k1+1) / (tf_td + k1·(1 − b + b·|d|/avgdl))

    Plan shape for 100 TB: one explode filtered to the query terms ONLY
    (predicate on the token before any aggregation, so the shuffled
    relation is |docs ∩ terms| rows, not the corpus token stream), one
    groupBy (doc, term) for tf, one tiny per-term df aggregate that
    broadcast-joins back, and the corpus-level (N, avgdl) scalars ride in
    via a 1-row broadcast cross join. No UDF anywhere.
    """
    from pyspark.sql import functions as F

    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col), toks.alias("_toks")
    ).withColumn("dl", F.size("_toks"))
    corpus = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    terms = [t.lower() for t in query_terms]
    hits = (
        base.select(id_col, "dl", F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = hits.groupBy("term").agg(
        F.count(F.lit(1)).alias("df_t")
    )
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "_idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df_t") + 0.5)
                / (F.col("df_t") + 0.5)
            ),
        )
        .withColumn(
            "_w",
            F.col("_idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    # fold the per-term weights in TERM order instead of F.sum: float
    # addition is order-sensitive, and partial aggregation would add the
    # 2-3 term weights in partition-dependent order — a run-to-run
    # nondeterminism a correctness gate cannot tolerate. The sorted fold
    # is exact and matches a SQL list_reduce over the same ordering.
    return scored.groupBy(id_col).agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "_w"))),
            F.lit(0.0),
            lambda acc, s: acc + s["_w"],
        ).alias("bm25"),
        F.count(F.lit(1)).alias("n_matched_terms"),
    )

