"""Corpus-curation wave 2: CCNet line dedup, DSIR, UniMax allocation —
unit pins beyond the oracle parity harness. (PII redaction is covered
by the cleaning family's tests.)"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from bigdata_weather_system_spark.operators.curation import (
    dsir_logweights,
    line_dedup,
    unimax_allocation,
)


def test_line_dedup_keeps_first_corpus_occurrence(spark):
    # 8-token lines; doc 2's first line repeats doc 1's first line
    # verbatim, doc 2's second line is unique; doc 3 repeats ITSELF.
    l_a = "a b c d e f g h"
    l_b = "i j k l m n o p"
    l_c = "q r s t u v w x"
    df = spark.createDataFrame(
        [
            (1, f"{l_a} {l_b}"),
            (2, f"{l_a} {l_c}"),
            (3, f"{l_c} {l_c}"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}
    assert (out[1]["n_lines"], out[1]["kept_lines"]) == (2, 2)
    # doc 2 loses the copy of l_a but keeps l_c (first corpus occurrence)
    assert (out[2]["n_lines"], out[2]["kept_lines"]) == (2, 1)
    # doc 3's l_c already appeared in doc 2 (smaller doc_id) — both drop
    assert (out[3]["n_lines"], out[3]["kept_lines"]) == (2, 0)
    assert out[2]["clean_md5"] == hashlib.md5(l_c.encode()).hexdigest()
    assert out[3]["clean_md5"] == hashlib.md5(b"").hexdigest()
    assert (
        out[1]["clean_md5"]
        == hashlib.md5(f"{l_a}\n{l_b}".encode()).hexdigest()
    )


def test_dsir_separates_target_vocabulary(spark):
    # Target docs use a disjoint vocabulary from raw docs — target-vocab
    # docs must score strictly higher than raw-vocab docs.
    rows = []
    for i in range(10):
        rows.append((i, "tgt", "alpha beta gamma delta alpha beta"))
    for i in range(10, 40):
        rows.append((i, "raw", "one two three four five six"))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    w = dsir_logweights(df, target=F.col("source") == "tgt")
    got = {r["doc_id"]: r["dsir_logweight"] for r in w.collect()}
    tgt = [got[i] for i in range(10)]
    raw = [got[i] for i in range(10, 40)]
    assert min(tgt) > max(raw)
    assert all(v > 0 for v in tgt) and all(v < 0 for v in raw)


def _unimax_sequential(counts: dict[str, int], budget: int, epochs: int):
    """The paper's greedy loop, verbatim (ascending by cap)."""
    order = sorted(counts, key=lambda k: (counts[k] * epochs, k))
    remaining, out = float(budget), {}
    for i, lang in enumerate(order):
        cap = counts[lang] * epochs
        share = remaining / (len(order) - i)
        out[lang] = min(float(cap), share)
        remaining -= out[lang]
    return out


def test_unimax_closed_form_matches_sequential_greedy(spark):
    # Skewed counts: tiny languages get capped, the big one absorbs the
    # remainder. One word == one token.
    counts = {"aa": 10, "bb": 40, "cc": 400, "dd": 2000, "ee": 12000}
    rows = [
        (i, lang, " ".join(["w"] * n))
        for i, (lang, n) in enumerate(counts.items())
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r["lang"]: r
        for r in unimax_allocation(
            df, budget_divisor=2, max_epochs=2
        ).collect()
    }
    budget = sum(counts.values()) // 2
    want = _unimax_sequential(counts, budget, 2)
    for lang, n in counts.items():
        assert abs(got[lang]["alloc_tokens"] - want[lang]) < 1e-6, lang
        assert abs(
            got[lang]["epochs_used"] - want[lang] / n
        ) < 1e-6, lang
        assert got[lang]["capped"] == int(want[lang] == 2.0 * n), lang
    # budget fully spent (nothing capped-out here: budget < sum of caps)
    assert abs(sum(r["alloc_tokens"] for r in got.values()) - budget) < 1e-4


def test_unimax_all_capped_when_budget_exceeds_caps(spark):
    counts = {"aa": 100, "bb": 100}
    rows = [
        (i, lang, " ".join(["w"] * n))
        for i, (lang, n) in enumerate(counts.items())
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    # budget_divisor=1 → budget == total == sum(counts); caps are 1×
    got = {
        r["lang"]: r
        for r in unimax_allocation(
            df, budget_divisor=1, max_epochs=1
        ).collect()
    }
    for lang in counts:
        assert got[lang]["capped"] == 1
        assert got[lang]["alloc_tokens"] == float(counts[lang])
        assert got[lang]["epochs_used"] == 1.0
