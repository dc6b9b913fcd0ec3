"""Contract queries: URL / domain curation (round 5).

The first pass of a web-scale text pipeline is URL hygiene — canonical
keys for exact dedup, per-domain caps against crawl skew, and domain
concentration diagnostics. The testdata has no URL column, so the
family fabricates deterministic messy URLs from ``(doc_id, source)``
closed-form (the fabricate→operate discipline of the media codec
family, `operators/multimodal.py fabricate_bmp_media`) and the DuckDB
oracles regenerate the identical strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .core import register, _t
from ..operators.web import (
    canonicalize_urls,
    extract_html_text,
    fabricate_doc_html,
    fabricate_doc_urls,
    has_tracking_params,
)

#: DuckDB twin of `operators/web.fabricate_doc_urls` + `canonicalize_urls`
#: — every CASE arm mirrors the Spark column expression verbatim.
_URL_CTES = r"""
    u0 AS (
      SELECT doc_id, source,
             (['com','org','net','io','edu'])[CAST(doc_id % 5 AS INT) + 1]
               AS tld
      FROM documents
    ),
    urls AS (
      SELECT doc_id, source,
        (CASE doc_id % 3 WHEN 0 THEN 'HTTPS' WHEN 1 THEN 'http'
              ELSE 'https' END)
        || '://'
        || (CASE doc_id % 4
              WHEN 0 THEN 'WWW.' || upper(source || '.example.' || tld)
              WHEN 1 THEN 'www.' || source || '.example.' || tld
              WHEN 2 THEN upper(source || '.example.' || tld)
              ELSE source || '.example.' || tld END)
        || (CASE doc_id % 6 WHEN 0 THEN ':443' WHEN 1 THEN ':80'
                 WHEN 2 THEN ':8080' ELSE '' END)
        || (CASE WHEN doc_id % 7 = 0 THEN ''
                 ELSE '/a/' || (doc_id % 50) || '/item' END)
        || (CASE WHEN doc_id % 5 = 4 THEN ''
                 WHEN doc_id % 2 = 0 THEN
                   '?utm_source=feed' || (doc_id % 4) || '&id=' || doc_id
                   || '&page=' || (doc_id % 9) || '&ref=tw'
                 ELSE '?page=' || (doc_id % 9) || '&id=' || doc_id END)
        || (CASE WHEN doc_id % 2 = 0 THEN '#sec' || (doc_id % 7)
                 ELSE '' END)
          AS raw_url
      FROM u0
    ),
    parts AS (
      SELECT doc_id, source, raw_url,
        lower(regexp_extract(raw_url,
              '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        lower(regexp_extract(raw_url,
              '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS hostport,
        coalesce(regexp_extract(raw_url,
              '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '')
          AS rawpath,
        -- DuckDB regexp_extract returns '' on no match (same as Spark);
        -- the coalesce is belt-and-braces only. The REAL NULL hazard in
        -- this oracle is array_to_string([]) below.
        coalesce(regexp_extract(raw_url, '\?([^#]*)', 1), '') AS rawq
      FROM urls
    ),
    canon AS (
      SELECT doc_id, source, raw_url, scheme, rawq,
        CASE WHEN rawpath = '' THEN '/' ELSE rawpath END AS path,
        regexp_replace(regexp_replace(hostport, ':[0-9]+$', ''),
                       '^www\.', '') AS domain,
        scheme || '://'
          || regexp_replace(regexp_replace(hostport, ':[0-9]+$', ''),
                            '^www\.', '')
          || (CASE
                WHEN regexp_extract(hostport, ':([0-9]+)$', 1) = '' THEN ''
                WHEN scheme = 'https'
                     AND regexp_extract(hostport, ':([0-9]+)$', 1) = '443'
                  THEN ''
                WHEN scheme = 'http'
                     AND regexp_extract(hostport, ':([0-9]+)$', 1) = '80'
                  THEN ''
                ELSE ':' || regexp_extract(hostport, ':([0-9]+)$', 1) END)
          || (CASE WHEN rawpath = '' THEN '/' ELSE rawpath END)
          || (CASE WHEN qs = '' THEN '' ELSE '?' || qs END)
          AS canonical_url
      FROM (
        SELECT *,
          -- DuckDB array_to_string(empty list) IS NULL (verified), not
          -- '' — every tracker-only or query-less URL needs this
          -- coalesce or the whole canonical concat goes NULL
          coalesce(array_to_string(list_sort(list_filter(
            str_split(rawq, '&'),
            x -> x <> '' AND NOT regexp_matches(x,
              '^(utm_[A-Za-z0-9_]*|ref|fbclid|gclid)='))), '&'), '') AS qs
        FROM parts
      )
    )
"""


def _canon(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return canonicalize_urls(fabricate_doc_urls(docs))


@register(
    "doc_url_canonicalize",
    oracle=f"""
    WITH {_URL_CTES}
    SELECT doc_id, raw_url, canonical_url, domain FROM canon
    """,
)
def doc_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization — the exact-dedup key of a crawl pipeline:
    lowercase scheme/host, www strip, scheme-default port strip (other
    ports kept), empty path → '/', tracking params dropped, surviving
    query keys sorted, fragment removed. Pure regexp/array column
    algebra fused into the scan (no shuffle, no UDF); the messy input
    side is fabricated closed-form so the oracle replays both the
    generator and the canonicalizer."""
    return _canon(spark, sf_dir).select(
        "doc_id", "raw_url", "canonical_url", "domain"
    )


@register(
    "domain_cap_survivors",
    oracle=f"""
    WITH {_URL_CTES}
    SELECT domain, doc_id, CAST(rk AS BIGINT) AS rk FROM (
      SELECT domain, doc_id,
             row_number() OVER (
               PARTITION BY domain
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM canon
    ) WHERE rk <= 3
    """,
)
def domain_cap_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (K=3) with deterministic survivor
    selection — the crawl-balance policy that stops one hot domain from
    dominating the training mix. Survivors are the K smallest by
    md5(doc_id): a content-independent pseudo-random draw that is
    reproducible across engines and runs (no rand() seed drift). The
    rank ≤ K predicate compiles to WindowGroupLimit, so each shuffle
    partition retains only K rows per domain before the window runs —
    the plan never materializes a hot domain's full posting list."""
    c = _canon(spark, sf_dir)
    w = Window.partitionBy("domain").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        c.select("domain", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
        .select("domain", "doc_id", F.col("rk").cast("long").alias("rk"))
    )


@register(
    "domain_concentration_metrics",
    oracle=f"""
    WITH {_URL_CTES},
    dc AS (SELECT domain, count(*) AS cnt FROM canon GROUP BY domain),
    tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot,
                   count(*) AS nd FROM dc),
    r AS (SELECT cnt,
                 row_number() OVER (ORDER BY cnt, domain) AS i FROM dc),
    gini_num AS (SELECT sum(i * cnt) AS s FROM r),
    top AS (
      SELECT sum(cnt) FILTER (WHERE rnk <= 1) AS t1,
             sum(cnt) FILTER (WHERE rnk <= 5) AS t5
      FROM (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, domain)
                     AS rnk FROM dc)
    ),
    hhi AS (
      SELECT sum((cnt / t.tot) * (cnt / t.tot)) AS h
      FROM dc CROSS JOIN tot t
    )
    SELECT CAST(t.tot AS BIGINT)           AS n_docs,
           CAST(t.nd AS BIGINT)            AS n_domains,
           round(top.t1 / t.tot, 6)        AS top1_share,
           round(top.t5 / t.tot, 6)        AS top5_share,
           round(hhi.h, 6)                 AS hhi,
           round(2.0 * gini_num.s / (t.nd * t.tot)
                 - (t.nd + 1.0) / t.nd, 6) AS gini
    FROM tot t CROSS JOIN top CROSS JOIN hhi CROSS JOIN gini_num
    """,
)
def domain_concentration_metrics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Domain-share concentration of the corpus — top-1/top-5 share,
    HHI, and Gini over per-domain document counts: the diagnostic that
    says whether the crawl is a broad web sample or three hot domains
    wearing a trenchcoat. Everything derives from the domain histogram
    (one groupBy). The Gini needs a GLOBAL rank of that histogram; at
    web scale n_domains is ~1e8 and under Zipf most of them are TIED at
    cnt=1, so neither a single-partition window nor a per-domain bucketed
    rank survives — instead the rank sum per tied-cnt GROUP is computed
    closed-form (ranks off+1..off+g sum to g·off+g(g+1)/2) over the
    distinct-cnt relation, bucketed by a deterministic log1p bucket with
    P-row cross-bucket offsets. Largest task state = distinct cnt values
    per bucket — tie-skew- and domain-shape-independent. Top-k shares
    are TakeOrderedAndProject (never a global sort)."""
    dc = (
        _canon(spark, sf_dir)
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # The Gini numerator is Σ i·cnt over the (cnt, domain) rank order —
    # but the per-domain rank inside a TIED-cnt group only enters through
    # the group's rank SUM, which is closed-form: ranks off+1..off+g sum
    # to g·off + g(g+1)/2, and the group's contribution is
    # cnt·(g·off + g(g+1)/2) regardless of how ties order internally. So
    # rank DISTINCT-cnt groups, never domains: under a Zipf histogram the
    # cnt=1 tail (typically most domains) is one tied group, and a
    # per-domain window would run ~O(n_domains) rows in a single task —
    # the previous shape's blind spot. Group rows are bucketed by a
    # deterministic monotone log1p bucket of cnt (same discipline as
    # contract/pipeline_ops.py's quantile histogram: every evaluation
    # must read identical bucket ids, and a pure column function of cnt
    # guarantees that; log1p spacing because counts are Zipfian), with
    # P-row offsets carrying domain counts ACROSS buckets and a
    # cumulative-g window WITHIN each bucket. Largest task state =
    # distinct cnt values per bucket — independent of tie skew and of
    # domain-name shape (a domain-prefix sub-bucket would have been
    # defeated by common prefixes).
    npart = 32
    grp = dc.groupBy("cnt").agg(F.count(F.lit(1)).alias("g"))
    mm = grp.agg(
        F.min(F.log1p("cnt")).alias("_lmin"),
        F.max(F.log1p("cnt")).alias("_lmax"),
    )
    lspan = F.col("_lmax") - F.col("_lmin")
    pid = F.when(
        lspan > 0,
        F.least(
            F.lit(npart - 1),
            F.floor(
                (F.log1p("cnt") - F.col("_lmin")) / lspan * npart
            ).cast("int"),
        ),
    ).otherwise(F.lit(0))
    hist = (
        grp.crossJoin(F.broadcast(mm))
        .withColumn("_pid", pid)
        .drop("_lmin", "_lmax")
    )
    ptot = hist.groupBy("_pid").agg(F.sum("g").alias("_pn"))
    offs = ptot.withColumn(
        "_off",
        F.coalesce(
            F.sum("_pn").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("_pid", "_off")
    cum_g_before = F.coalesce(
        F.sum("g").over(
            Window.partitionBy("_pid")
            .orderBy("cnt")
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    ranked = hist.join(F.broadcast(offs), "_pid").withColumn(
        "_goff", F.col("_off") + cum_g_before
    )
    tot = dc.agg(
        F.sum("cnt").cast("double").alias("tot"),
        F.count(F.lit(1)).alias("nd"),
    )
    group_rank_sum = (
        F.col("_goff") * F.col("g")
        + F.col("g") * (F.col("g") + 1) / 2
    ).cast("long")
    gini_num = ranked.agg(
        F.sum(F.col("cnt") * group_rank_sum).alias("s")
    )
    top5 = (
        dc.orderBy(F.col("cnt").desc(), F.col("domain"))
        .limit(5)
        .agg(
            F.max(F.col("cnt")).alias("t1"),
            F.sum("cnt").alias("t5"),
        )
    )
    hhi = (
        dc.crossJoin(F.broadcast(tot))
        .agg(
            F.sum((F.col("cnt") / F.col("tot")) * (F.col("cnt") / F.col("tot")))
            .alias("h")
        )
    )
    return (
        tot.crossJoin(F.broadcast(top5))
        .crossJoin(F.broadcast(hhi))
        .crossJoin(F.broadcast(gini_num))
        .select(
            F.col("tot").cast("long").alias("n_docs"),
            F.col("nd").cast("long").alias("n_domains"),
            F.round(F.col("t1") / F.col("tot"), 6).alias("top1_share"),
            F.round(F.col("t5") / F.col("tot"), 6).alias("top5_share"),
            F.round(F.col("h"), 6).alias("hhi"),
            F.round(
                2.0 * F.col("s") / (F.col("nd") * F.col("tot"))
                - (F.col("nd") + 1.0) / F.col("nd"),
                6,
            ).alias("gini"),
        )
    )


@register(
    "url_tracking_prevalence",
    oracle=f"""
    WITH {_URL_CTES}
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(sum(CASE WHEN len(list_filter(str_split(rawq, '&'),
                  x -> regexp_matches(x,
                    '^(utm_[A-Za-z0-9_]*|ref|fbclid|gclid)='))) > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_tracking,
           CAST(sum(CASE WHEN scheme = 'https' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_secure,
           round(sum(CASE WHEN len(list_filter(str_split(rawq, '&'),
                  x -> regexp_matches(x,
                    '^(utm_[A-Za-z0-9_]*|ref|fbclid|gclid)='))) > 0
                THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS pct_tracking
    FROM canon GROUP BY source
    """,
)
def url_tracking_prevalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source share of URLs carrying tracking parameters (and the
    https share) — the provenance-hygiene report that tells a curation
    team which feeds need the canonicalizer most. One narrow projection
    + one groupBy on the source key; the tracker test is an EXISTS over
    the split query string, still whole-stage-codegen column algebra."""
    c = _canon(spark, sf_dir).withColumn(
        "has_trk", has_tracking_params("raw_url")
    )
    scheme = F.lower(
        F.regexp_extract(F.col("raw_url"), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    return (
        c.withColumn("is_https", scheme == "https")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.sum(F.col("has_trk").cast("long")).alias("n_tracking"),
            F.sum(F.col("is_https").cast("long")).alias("n_secure"),
            F.round(
                F.sum(F.col("has_trk").cast("long")) * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("pct_tracking"),
        )
    )


#: DuckDB twin of `operators/web.fabricate_doc_html` — ONE copy, shared
#: by both oracles that replay the page generator (`doc_html_extract`,
#: `doc_warc_extract_pipeline`), so the generator can never drift
#: between them.
_PAGES_CTES = r"""
    h0 AS (
      SELECT doc_id, source, text,
        CASE WHEN doc_id % 5 = 0 THEN 'Doc ' || doc_id || ' &amp; notes'
             ELSE source || ' - doc ' || doc_id END AS title_raw,
        replace(replace(replace(text, '&', '&amp;'),
                        '<', '&lt;'), '>', '&gt;') AS esc_text
      FROM documents
    ),
    pages AS (
      SELECT doc_id,
        '<!DOCTYPE html><html><head><title>' || title_raw
        || '</title><script type="text/javascript">var id=' || doc_id
        || ';track("' || source
        || '");</script><style>.nav a{color:#00f}</style></head><body>'
        || '<nav><a href="/">Home</a> <a href="/' || source || '">'
        || source || '</a></nav>'
        || CASE WHEN doc_id % 3 = 0
                THEN '<aside class="promo">Subscribe to ' || source
                     || ' updates &amp; offers!</aside>' ELSE '' END
        || '<div id="main"><h1>Doc ' || doc_id || '</h1>'
        || CASE WHEN doc_id % 4 = 1
                THEN '<script>inlineTrack();</script>' ELSE '' END
        || '<p>' || esc_text || '</p></div><footer>&copy; 2026 ' || source
        || ' &middot; All rights reserved</footer></body></html>' AS html
      FROM h0
    )
"""


def _strip_blocks_sql(col: str) -> str:
    """SQL for the boilerplate block drop (DuckDB twin of
    `operators/web.extract_html_text`'s block pass): nest one
    regexp_replace per dropped tag, innermost first — shared by both
    HTML-consuming oracles so the strip chain cannot drift."""
    out = col
    for tag in ("head", "script", "style", "nav", "aside", "footer"):
        out = (
            f"regexp_replace({out}, "
            f"'(?s)<{tag}(\\s[^>]*)?>.*?</{tag}>', ' ', 'g')"
        )
    return out


def _decode_entities_sql(col: str) -> str:
    return (
        f"replace(replace(replace({col}, "
        "'&lt;', '<'), '&gt;', '>'), '&amp;', '&')"
    )


def _clean_text_sql(deblocked: str) -> str:
    """Tag strip → entity decode → whitespace normalize → trim."""
    tagless = f"regexp_replace({deblocked}, '<[^>]*>', ' ', 'g')"
    return (
        f"trim(regexp_replace({_decode_entities_sql(tagless)}, "
        "'\\s+', ' ', 'g'))"
    )


_TITLE_SQL = _decode_entities_sql(
    "regexp_extract({src}, '<title>(.*?)</title>', 1)"
)


@register(
    "doc_html_extract",
    oracle=f"""
    WITH {_PAGES_CTES},
    strip AS (
      SELECT doc_id, html, {_strip_blocks_sql('html')} AS deblocked
      FROM pages
    )
    SELECT doc_id,
      {_TITLE_SQL.format(src='html')} AS title,
      CAST(len(regexp_extract_all(html, '<a\\s')) AS BIGINT) AS n_links,
      {_clean_text_sql('deblocked')} AS text_clean
    FROM strip
    """,
)
def doc_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> text extraction (boilerplate strip) — the raw-web front
    end of the text path: closed-form fabricated pages (title, head
    script/style, nav, id-dependent promo aside + inline body script,
    escaped document text, entity-soup footer) pushed through a
    block-drop + tag-strip + entity-decode + whitespace-normalize
    extractor that is pure column algebra (`operators/web.py
    extract_html_text`). The content survives exactly ('Doc {id} ' +
    the normalized text); every boilerplate block vanishes. No shuffle,
    no UDF — a scan-fused map stage at any corpus size; the DuckDB
    oracle replays both generator and extractor (RE2-safe patterns:
    non-greedy blocks, no backreferences)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    pages = fabricate_doc_html(docs)
    return extract_html_text(pages).select(
        "doc_id", "title", "n_links", "text_clean"
    )


_ROBOTS_CTES = r"""
    doms AS (SELECT DISTINCT domain FROM canon),
    rules AS (
      SELECT domain, '/a/' AS path_prefix, 3 AS prefix_len,
             ascii(substring(md5(domain), 1, 1)) % 2 = 0 AS allow
      FROM doms
      UNION ALL
      SELECT domain, '/a/1', 4,
             NOT (ascii(substring(md5(domain), 1, 1)) % 2 = 0)
      FROM doms
      UNION ALL
      SELECT domain, '/', 1, TRUE FROM doms
    ),
    matched AS (
      SELECT c.doc_id, c.domain, c.path,
             arg_max(r.path_prefix, r.prefix_len) AS matched_prefix,
             arg_max(r.allow, r.prefix_len) AS allowed
      FROM canon c JOIN rules r ON c.domain = r.domain
       AND starts_with(c.path, r.path_prefix)
      GROUP BY c.doc_id, c.domain, c.path
    )
"""


@register(
    "robots_rule_filter",
    oracle=f"""
    WITH {_URL_CTES},
    {_ROBOTS_CTES}
    SELECT doc_id, domain, path, matched_prefix, allowed FROM matched
    """,
)
def robots_rule_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt-style longest-prefix-match fetch policy per URL — the
    compliance gate a crawl pipeline runs before anything else. Rules
    are fabricated closed-form per domain (a polarity-keyed section
    rule, a deeper override with the OPPOSITE polarity, and the root
    default — so the longest-match semantics actually decide outcomes),
    then each URL keeps its longest matching rule via max_by. The rule
    relation is a few rows per domain — broadcast — so the decision is
    a map-side join + one doc-keyed aggregation at any crawl size."""
    from ..operators.web import fabricate_robots_rules, robots_match

    c = _canon(spark, sf_dir)
    rules = fabricate_robots_rules(c.select("domain").distinct())
    return robots_match(c.select("doc_id", "domain", "path"), rules)


@register(
    "crawl_politeness_schedule",
    oracle=f"""
    WITH {_URL_CTES},
    {_ROBOTS_CTES}
    SELECT domain,
           CAST(count(*) AS BIGINT) AS n_allowed,
           CAST(1 + ascii(substring(md5(domain), 1, 1)) % 5 AS BIGINT)
             AS crawl_delay_s,
           CAST((1 + ascii(substring(md5(domain), 1, 1)) % 5)
                * (count(*) - 1) AS BIGINT) AS makespan_s
    FROM matched WHERE allowed
    GROUP BY domain
    """,
)
def crawl_politeness_schedule(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-domain crawl-frontier schedule over the robots-ALLOWED URLs
    (composes with `robots_rule_filter`): each domain gets a
    deterministic crawl-delay (1-5 s, md5-keyed — the politeness budget
    robots.txt's Crawl-delay would carry) and the resulting makespan
    delay x (n-1) — the number a frontier scheduler uses to decide how
    many domains it must interleave to keep fetchers busy. Everything
    derives from the per-domain allowed histogram: one broadcast rule
    join + one groupBy, no window."""
    from ..operators.web import fabricate_robots_rules, robots_match

    c = _canon(spark, sf_dir)
    rules = fabricate_robots_rules(c.select("domain").distinct())
    allowed = robots_match(
        c.select("doc_id", "domain", "path"), rules
    ).filter(F.col("allowed"))
    delay = (
        F.ascii(F.substring(F.md5(F.col("domain")), 1, 1)) % 5 + 1
    ).cast("long")
    return allowed.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_allowed"),
        F.any_value(delay).alias("crawl_delay_s"),
        (F.any_value(delay) * (F.count(F.lit(1)) - 1))
        .cast("long")
        .alias("makespan_s"),
    )


@register(
    "doc_warc_extract_pipeline",
    oracle=f"""
    WITH {_URL_CTES},
    {_PAGES_CTES},
    warc AS (
      SELECT
        'WARC/1.0' || e'\\r\\n' || 'WARC-Type: response' || e'\\r\\n'
        || 'WARC-Record-ID: <urn:doc:' || p.doc_id || '>' || e'\\r\\n'
        || 'WARC-Target-URI: ' || u.raw_url || e'\\r\\n'
        || 'Content-Type: text/html' || e'\\r\\n'
        || 'Content-Length: ' || strlen(p.html) || e'\\r\\n' || e'\\r\\n'
        || p.html AS warc
      FROM pages p JOIN urls u USING (doc_id)
    ),
    parsed AS (
      SELECT
        TRY_CAST(regexp_extract(warc,
          'WARC-Record-ID: <urn:doc:(\\d+)>', 1) AS BIGINT)
          AS doc_id_parsed,
        regexp_extract(warc, 'WARC-Target-URI: ([^\\r\\n]*)', 1)
          AS target_uri,
        TRY_CAST(regexp_extract(warc, 'Content-Length: (\\d+)', 1)
                 AS BIGINT) AS declared_length,
        regexp_extract(warc, '(?s)\\r\\n\\r\\n(.*)$', 1) AS payload
      FROM warc
    ),
    strip AS (
      SELECT doc_id_parsed, target_uri, payload,
        coalesce(strlen(payload) = declared_length, FALSE) AS length_ok,
        {_strip_blocks_sql('payload')} AS deblocked
      FROM parsed
    )
    SELECT doc_id_parsed, target_uri, length_ok,
      {_TITLE_SQL.format(src='payload')} AS title,
      {_clean_text_sql('deblocked')} AS text_clean
    FROM strip
    """,
)
def doc_warc_extract_pipeline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """End-to-end raw-web ingestion: WARC record (the CommonCrawl
    container format — named CRLF headers, octet Content-Length, blank-
    line separator) -> header walk + payload slice + truncation check ->
    HTML boilerplate strip -> clean text. Every stage is scan-fused
    column algebra over the fabricated record text; `length_ok` pins
    that the declared octet length matches the sliced payload (the
    check a compliant reader runs before trusting a record — byte
    semantics matter because the corpus includes multibyte zh text).
    Composes `fabricate_warc_records`/`parse_warc_records` with
    `extract_html_text` (`operators/web.py`); the oracle replays the
    full generator + reader chain."""
    from ..operators.web import (
        fabricate_warc_records,
        parse_warc_records,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    pages = fabricate_doc_html(fabricate_doc_urls(docs))
    warc = fabricate_warc_records(pages).select("warc")
    parsed = parse_warc_records(warc)
    return extract_html_text(parsed, html_col="payload").select(
        "doc_id_parsed", "target_uri", "length_ok", "title", "text_clean"
    )


@register(
    "domain_grouped_split",
    oracle=f"""
    WITH {_URL_CTES},
    assigned AS (
      SELECT doc_id, domain,
             CASE WHEN CAST(('0x' || substring(md5(domain), 1, 15))
                       AS BIGINT) % 100 < 80 THEN 'train'
                  WHEN CAST(('0x' || substring(md5(domain), 1, 15))
                       AS BIGINT) % 100 < 90 THEN 'valid'
                  ELSE 'test' END AS split
      FROM canon
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT domain) AS BIGINT) AS n_domains,
           CAST((SELECT count(*) FROM (
              SELECT domain FROM assigned
              GROUP BY domain HAVING count(DISTINCT split) > 1))
             AS BIGINT) AS n_leaky_domains
    FROM assigned GROUP BY split
    """,
)
def domain_grouped_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-aware train/valid/test split: the bucket is keyed on the
    DOMAIN hash, not the document, so every page of a site lands in one
    split — the guard against near-duplicate boilerplate from one
    domain straddling train and test (the content-hash split
    `doc_train_test_split` can't prevent that; template pages differ by
    a few tokens). Emits per-split doc/domain counts plus
    n_leaky_domains, the self-audit that MUST be 0 by construction —
    a grouped split that reports nonzero here is broken. One narrow
    projection + two aggregations on the domain key."""
    c = _canon(spark, sf_dir).select("doc_id", "domain")
    bucket = (
        F.conv(F.substring(F.md5(F.col("domain")), 1, 15), 16, 10)
        .cast("long")
        % 100
    )
    assigned = c.withColumn(
        "split",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "valid")
        .otherwise("test"),
    )
    leaky = (
        assigned.groupBy("domain")
        .agg(F.count_distinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).alias("n_leaky"))
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("domain").alias("n_domains"),
        )
        .crossJoin(F.broadcast(leaky))
        .select(
            "split",
            "n_docs",
            "n_domains",
            F.col("n_leaky").cast("long").alias("n_leaky_domains"),
        )
    )


#: DuckDB twin of the chained pipeline's curation tail — survivor-corpus
#: line dedup + DSIR + UniMax, all computed from the `survivors` CTE the
#: front half of the oracle produces. Tokenization twin of
#: ``operators.text.tokens`` over the extracted clean text.
_PIPE_TOKS = (
    "list_filter(regexp_split_to_array(lower(text_clean), '\\s+'),"
    " x -> x <> '')"
)


@register(
    "web_curation_pipeline",
    oracle=f"""
    WITH {_URL_CTES},
    {_PAGES_CTES},
    warc AS MATERIALIZED (
      SELECT
        'WARC/1.0' || e'\\r\\n' || 'WARC-Type: response' || e'\\r\\n'
        || 'WARC-Record-ID: <urn:doc:' || p.doc_id || '>' || e'\\r\\n'
        || 'WARC-Target-URI: ' || u.raw_url || e'\\r\\n'
        || 'Content-Type: text/html' || e'\\r\\n'
        || 'Content-Length: ' || strlen(p.html) || e'\\r\\n' || e'\\r\\n'
        || p.html AS warc
      FROM pages p JOIN urls u USING (doc_id)
    ),
    parsed AS (
      SELECT
        TRY_CAST(regexp_extract(warc,
          'WARC-Record-ID: <urn:doc:(\\d+)>', 1) AS BIGINT) AS doc_id,
        regexp_extract(warc, 'WARC-Target-URI: ([^\\r\\n]*)', 1)
          AS target_uri,
        TRY_CAST(regexp_extract(warc, 'Content-Length: (\\d+)', 1)
                 AS BIGINT) AS declared_length,
        regexp_extract(warc, '(?s)\\r\\n\\r\\n(.*)$', 1) AS payload
      FROM warc
    ),
    extracted AS MATERIALIZED (
      SELECT doc_id,
        {_clean_text_sql(_strip_blocks_sql('payload'))} AS text_clean
      FROM parsed
      WHERE coalesce(strlen(payload) = declared_length, FALSE)
    ),
    -- canonical URL/domain of the URI that traveled inside the record:
    -- the WARC round-trip is lossless, so the shared canon CTE (built
    -- from the same fabricated raw_url) is its exact replay
    {_ROBOTS_CTES.lstrip().rstrip().rstrip(',')},
    decided AS MATERIALIZED (
      SELECT m.doc_id, m.domain, m.allowed, d.lang, d.source
      FROM matched m JOIN documents d USING (doc_id)
    ),
    ranked AS MATERIALIZED (
      SELECT *, row_number() OVER (
               PARTITION BY domain, allowed
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM decided
    ),
    stage_counts AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_parsed,
             CAST(sum(CASE WHEN allowed THEN 1 ELSE 0 END) AS BIGINT)
               AS n_allowed,
             CAST(sum(CASE WHEN allowed AND rk <= 8 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_survivors
      FROM ranked GROUP BY lang
    ),
    survivors AS MATERIALIZED (
      SELECT r.doc_id, r.lang, r.source, e.text_clean
      FROM ranked r JOIN extracted e USING (doc_id)
      WHERE r.allowed AND r.rk <= 8
    ),
    t AS (SELECT doc_id, lang, source, {_PIPE_TOKS} AS toks
          FROM survivors),
    tok AS MATERIALIZED (
      SELECT doc_id, lang, source,
             generate_subscripts(toks, 1) AS ord, unnest(toks) AS tok
      FROM t
    ),
    lines AS MATERIALIZED (
      SELECT doc_id, lang, source, CAST((ord - 1) // 8 AS INT) AS line_no,
             string_agg(tok, ' ' ORDER BY ord) AS line,
             count(*) AS line_toks
      FROM tok GROUP BY doc_id, lang, source, (ord - 1) // 8
    ),
    rk_lines AS MATERIALIZED (
      SELECT *, row_number() OVER (
               PARTITION BY line ORDER BY doc_id, line_no) AS rn
      FROM lines
    ),
    dedup_doc AS MATERIALIZED (
      SELECT doc_id, lang, source,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS kept_lines
      FROM rk_lines GROUP BY doc_id, lang, source
    ),
    kept_tok AS MATERIALIZED (
      SELECT l.doc_id, l.lang, l.source,
             unnest(str_split(l.line, ' ')) AS tok
      FROM rk_lines l WHERE l.rn = 1
    ),
    b AS MATERIALIZED (
      SELECT doc_id, lang, source,
             CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) % 64
               AS bucket
      FROM kept_tok
    ),
    cnt AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS r_b,
             CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
                  AS BIGINT) AS t_b
      FROM b GROUP BY bucket
    ),
    btot AS (SELECT CAST(sum(r_b) AS BIGINT) AS r_tot,
                    CAST(sum(t_b) AS BIGINT) AS t_tot FROM cnt),
    lam AS (
      SELECT bucket, round(ln((t_b + 1.0) / (t_tot + 64.0))
                           - ln((r_b + 1.0) / (r_tot + 64.0)), 9) AS lam
      FROM cnt CROSS JOIN btot
    ),
    dbk AS (
      SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS c
      FROM b GROUP BY doc_id, bucket
    ),
    dsir AS MATERIALIZED (
      SELECT doc_id,
             round(list_reduce(list(c * lam ORDER BY bucket),
                               (a, x) -> a + x), 6) AS dsir_logweight
      FROM dbk JOIN lam USING (bucket) GROUP BY doc_id
    ),
    lang_doc AS (
      SELECT d.lang,
             CAST(sum(d.n_lines) AS BIGINT) AS n_lines,
             CAST(sum(d.kept_lines) AS BIGINT) AS kept_lines,
             round(list_reduce(
               list(coalesce(s.dsir_logweight, 0.0) ORDER BY d.doc_id),
               (a, x) -> a + x), 6) AS dsir_sum
      FROM dedup_doc d LEFT JOIN dsir s USING (doc_id)
      GROUP BY d.lang
    ),
    per AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS lang_tokens
      FROM kept_tok GROUP BY lang
    ),
    ptot AS (SELECT CAST(sum(lang_tokens) AS BIGINT) AS total FROM per),
    s AS (
      SELECT lang, lang_tokens AS n_tokens,
             lang_tokens * 2 AS cap_tokens,
             total // 2 AS budget,
             row_number() OVER (ORDER BY lang_tokens * 2, lang)
               AS alloc_rank,
             sum(lang_tokens * 2) OVER (
               ORDER BY lang_tokens * 2, lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_i,
             count(*) OVER () AS k
      FROM per CROSS JOIN ptot
    ),
    f AS (
      SELECT *, CASE WHEN cap_tokens * (k - alloc_rank) + s_i <= budget
                     THEN alloc_rank END AS capped_rk
      FROM s
    ),
    mm AS (
      SELECT coalesce(max(capped_rk), 0) AS m,
             coalesce(max(CASE WHEN capped_rk IS NOT NULL THEN s_i END),
                      0) AS s_m
      FROM f
    ),
    uni AS (
      SELECT lang, n_tokens, cap_tokens,
             CAST(alloc_rank AS BIGINT) AS alloc_rank,
             CAST(CASE WHEN alloc_rank <= m THEN 1 ELSE 0 END AS INT)
               AS capped,
             round(CASE WHEN alloc_rank <= m
                        THEN CAST(cap_tokens AS DOUBLE)
                        ELSE (budget - s_m) / CAST(k - m AS DOUBLE) END,
                   6) AS alloc_tokens,
             round((CASE WHEN alloc_rank <= m
                         THEN CAST(cap_tokens AS DOUBLE)
                         ELSE (budget - s_m) / CAST(k - m AS DOUBLE) END)
                   / n_tokens, 6) AS epochs_used
      FROM f CROSS JOIN mm
    )
    SELECT sc.lang, sc.n_parsed, sc.n_allowed, sc.n_survivors,
           ld.n_lines, ld.kept_lines, ld.dsir_sum,
           u.n_tokens, u.cap_tokens, u.alloc_rank, u.capped,
           u.alloc_tokens, u.epochs_used
    FROM stage_counts sc
    LEFT JOIN lang_doc ld USING (lang)
    LEFT JOIN uni u USING (lang)
    """,
)
def web_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE flagship raw-web curation run — the single declarative plan a
    100 TB crawl-to-training-mix job actually submits, chaining every
    stage this family ships: WARC parse (truncation-checked) → HTML
    boilerplate strip → URL canonicalization of the record's target URI
    → robots longest-prefix fetch policy → per-domain cap (K=8,
    deterministic md5 survivors) → corpus-level CCNet line dedup over
    the survivor text → DSIR importance scores on the DEDUPED text →
    UniMax per-language token budgets. Output is one row per language:
    per-stage funnel counts (parsed / robots-allowed / cap-survivors),
    dedup totals, the summed DSIR log-weight (per-doc weights rounded
    then folded in doc_id order — the repo float policy), and the
    UniMax allocation columns.

    Composability pin: the chained plan's shuffle count is the SUM of
    its stages' — the front half (fabricate → WARC → extract → canon →
    robots broadcast join) is entirely scan-fused narrow algebra, so
    the only exchanges are the cap window (domain), line dedup's
    groupBy(line)+join+groupBy(doc_id), DSIR's two bounded aggregations
    + broadcast λ, and the per-language windows over a #languages-row
    relation (tests/test_plan_hygiene.py pins no extra Exchange
    explosion). Reference: the reference repo has no web-curation
    stage at all; stages cite CommonCrawl WARC 1.0, CCNet (Wenzek et
    al. LREC'20), DSIR (Xie et al. NeurIPS'23), UniMax (Chung et al.
    ICLR'23)."""
    from ..operators.curation import (
        dsir_logweights,
        line_dedup,
        unimax_allocation,
    )
    from ..operators.web import (
        fabricate_robots_rules,
        fabricate_warc_records,
        parse_warc_records,
        robots_match,
    )

    from pyspark import StorageLevel

    docs = _t(spark, sf_dir, "documents")
    meta = docs.select("doc_id", "source", "lang")

    # 1. fabricate the raw-web input (urls + pages), container it as
    #    WARC records, and read it back the way a crawl reader would.
    #    The testdata parquet is a single file → a single partition, and
    #    the whole extract chain is narrow — spread it first or the
    #    regex-heavy front end runs on one core (measured 4.3s → ~0.4s
    #    at sf0.1). A real crawl's WARC segments arrive pre-partitioned.
    par = spark.sparkContext.defaultParallelism
    spread = docs.select("doc_id", "text", "source")
    if len(spread.inputFiles() or []) < par:
        spread = spread.repartition(par)
    pages = fabricate_doc_html(fabricate_doc_urls(spread))
    warc = fabricate_warc_records(pages).select("warc")
    parsed = parse_warc_records(warc).filter(F.col("length_ok"))
    extracted = extract_html_text(parsed, html_col="payload").select(
        F.col("doc_id_parsed").alias("doc_id"), "text_clean"
    )

    # 2. the DECISION side (robots + per-domain cap + funnel counts)
    #    needs only (doc_id, domain, path, lang, source) — guide §8:
    #    decide with small rows, attach the heavy payload once. The WARC
    #    round-trip is lossless (Content-Length gates it; the oracle's
    #    canon CTE is likewise built from the raw fabricated URL), so
    #    canonicalizing the PRE-WARC url relation is the exact replay of
    #    canonicalizing each record's target_uri — and the heavy
    #    fabricate→WARC→regex-extract chain drops out of the decision
    #    plan entirely. Before this restructure the extracted text rode
    #    through a persist barrier, the robots broadcast build, and the
    #    cap window's exchange.
    urlmeta = canonicalize_urls(
        fabricate_doc_urls(spread.select("doc_id", "source")),
        url_col="raw_url",
    ).select("doc_id", "domain", "path")

    # 3. robots longest-prefix decision (broadcast rule table; the
    #    domain build now scans the narrow url relation, not the crawl)
    rules = fabricate_robots_rules(urlmeta.select("domain").distinct())
    rm = robots_match(urlmeta, rules)

    # 4. per-domain cap among the allowed docs: rank within
    #    (domain, allowed) so the survivor rank counts allowed rows only.
    #    Narrow rows only — no text in the window exchange.
    ranked = (
        rm.select("doc_id", "domain", "allowed")
        .join(meta, "doc_id")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("domain", "allowed").orderBy(
                    F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
                )
            ),
        )
    )
    # fan-out barrier: funnel counts + the survivor corpus both read it
    ranked = ranked.persist(StorageLevel.MEMORY_AND_DISK)
    survivor = F.col("allowed") & (F.col("rk") <= 8)
    stage_counts = ranked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_parsed"),
        F.sum(F.col("allowed").cast("long")).alias("n_allowed"),
        F.sum(survivor.cast("long")).alias("n_survivors"),
    )
    # attach the extracted text to the (domain-capped, robots-allowed)
    # survivor ids ONLY: broadcast the small id side so the corpus-sized
    # extract chain is never shuffled — it is evaluated exactly once,
    # fused into the final job.
    surv = F.broadcast(
        ranked.filter(survivor).select("doc_id", "lang", "source")
    ).join(extracted, "doc_id").select(
        "doc_id", "lang", "source", "text_clean"
    )

    # 5. corpus-level line dedup over the survivor text
    ld = line_dedup(
        surv.select("doc_id", F.col("text_clean").alias("text")),
        with_text=True,
    )
    # second barrier: the line-deduped corpus feeds DSIR (two bounded
    # aggregations), UniMax, and the per-language report
    clean = ld.join(meta, "doc_id").persist(StorageLevel.MEMORY_AND_DISK)

    # 6. DSIR importance weights on the DEDUPED text
    dsir = dsir_logweights(
        clean.select(
            "doc_id", "source", F.col("clean_text").alias("text")
        ),
        target=F.col("source") == "src0",
    )

    # 7. UniMax token budgets per language over the deduped corpus
    uni = unimax_allocation(
        clean.select("lang", F.col("clean_text").alias("text"))
    )

    # 8. per-language report: funnel counts + dedup totals + summed
    #    DSIR weight (per-doc rounded values folded in doc_id order —
    #    the repo-wide sorted-fold float policy) + the allocation
    pd_ = clean.join(
        dsir.select("doc_id", "dsir_logweight"), "doc_id", "left"
    )
    lang_doc = pd_.groupBy("lang").agg(
        F.sum("n_lines").cast("long").alias("n_lines"),
        F.sum("kept_lines").cast("long").alias("kept_lines"),
        F.round(
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("doc_id"),
                            F.coalesce(
                                F.col("dsir_logweight"), F.lit(0.0)
                            ).alias("w"),
                        )
                    )
                ),
                F.lit(0.0),
                lambda a, x: a + x["w"],
            ),
            6,
        ).alias("dsir_sum"),
    )
    return (
        stage_counts.join(lang_doc, "lang", "left")
        .join(uni, "lang", "left")
        .select(
            "lang",
            "n_parsed",
            "n_allowed",
            "n_survivors",
            "n_lines",
            "kept_lines",
            "dsir_sum",
            "n_tokens",
            "cap_tokens",
            "alloc_rank",
            "capped",
            "alloc_tokens",
            "epochs_used",
        )
    )


@register(
    "doc_warc_gz_extract_pipeline",
    oracle=f"""
    WITH {_URL_CTES},
    {_PAGES_CTES},
    warc AS (
      SELECT p.doc_id,
        'WARC/1.0' || e'\\r\\n' || 'WARC-Type: response' || e'\\r\\n'
        || 'WARC-Record-ID: <urn:doc:' || p.doc_id || '>' || e'\\r\\n'
        || 'WARC-Target-URI: ' || u.raw_url || e'\\r\\n'
        || 'Content-Type: text/html' || e'\\r\\n'
        || 'Content-Length: ' || strlen(p.html) || e'\\r\\n' || e'\\r\\n'
        || p.html AS warc
      FROM pages p JOIN urls u USING (doc_id)
    ),
    parsed AS (
      SELECT
        TRY_CAST(regexp_extract(warc,
          'WARC-Record-ID: <urn:doc:(\\d+)>', 1) AS BIGINT)
          AS doc_id_parsed,
        CAST(octet_length(encode(warc)) AS BIGINT) AS raw_bytes,
        regexp_extract(warc, 'Content-Length: (\\d+)', 1) AS declared,
        regexp_extract(warc, '(?s)\\r\\n\\r\\n(.*)$', 1) AS payload
      FROM warc
    )
    SELECT doc_id_parsed, raw_bytes,
      coalesce(strlen(payload) = TRY_CAST(declared AS BIGINT), FALSE)
        AS length_ok,
      {_clean_text_sql(_strip_blocks_sql('payload'))} AS text_clean
    FROM parsed
    """,
)
def doc_warc_gz_extract_pipeline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The gzip leg of raw-web ingestion — CommonCrawl ships ``.warc.gz``
    with every record an INDEPENDENT gzip member, and this query runs
    that actual byte path: fabricate WARC text → compress each record
    into a real gzip member (stdlib zlib/gzip, deterministic header) →
    decompress → header-walk → boilerplate-strip to clean text. The
    oracle replays everything EXCEPT the compression round-trip (DuckDB
    cannot gunzip) — which is precisely what the query proves Spark-side:
    ``raw_bytes`` (decompressed octet length) must equal the original
    record's octet length for every row, so a lossy or truncated
    round-trip hash-mismatches. Compressed size is implementation-
    defined and stays out of the checked columns. Closes the
    "compressed formats env-gated" gap for the crawl container format
    with zero external codec libraries; one narrow Arrow pass per
    stage."""
    from ..operators.web import (
        fabricate_warc_records,
        gunzip_warc_records,
        gzip_warc_records,
        parse_warc_records,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    pages = fabricate_doc_html(fabricate_doc_urls(docs))
    warc = fabricate_warc_records(pages).select("warc")
    gz = gzip_warc_records(warc)
    back = gunzip_warc_records(gz)
    parsed = parse_warc_records(back.select("warc", "raw_bytes"))
    return extract_html_text(parsed, html_col="payload").select(
        "doc_id_parsed",
        "raw_bytes",
        "length_ok",
        "text_clean",
    )
