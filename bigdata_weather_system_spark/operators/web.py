"""URL / domain curation operators — the first pass of a web-crawl text
pipeline (reference scope: the crawler feed in
/root/reference/crawl/README-adjacent tooling has no analytics surface;
this family supplies the standard curation operators a 100 TB corpus
needs before any text op runs: canonical URLs for exact dedup keys,
per-domain caps against crawl skew, and domain-concentration
diagnostics).

Everything is pure column algebra (regexp + array functions — JVM-side,
whole-stage-codegen'd, no Python in the hot path), so the same logic is
expressible verbatim in the DuckDB oracles.

The testdata has no URL column, so URLs are FABRICATED closed-form from
``(doc_id, source)`` — the same fabricate→operate discipline the media
codec family uses (`multimodal.fabricate_bmp_media`): a deterministic
generator both engines can evaluate, messy on purpose (mixed-case scheme
and host, default and non-default ports, empty paths, tracking params in
varying order, fragments) so the canonicalizer has real work to do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Query parameters dropped during canonicalization: trackers carry no
#: content identity, and leaving them in splits one page into dozens of
#: "distinct" URLs (the #1 inflation source in crawl frontier dedup).
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|ref|fbclid|gclid)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"

#: TLD wheel for the fabricated hosts (index = doc_id % 5).
_TLDS = ["com", "org", "net", "io", "edu"]


def fabricate_doc_urls(
    df: DataFrame, id_col: str = "doc_id", source_col: str = "source"
) -> DataFrame:
    """Deterministic messy URL per document, closed-form from the id —
    every branch below is a plain CASE over ``doc_id % k`` so a SQL
    oracle regenerates the identical string. Shapes exercised:

    - scheme case (``HTTPS``/``http``/``https``) and the www prefix in
      three casings;
    - default ports that must be stripped (``:443`` only co-occurs with
      https, ``:80`` with http, by modulus arithmetic) and a non-default
      ``:8080`` that must be KEPT;
    - empty paths (canonical form ``/``);
    - tracking params (``utm_source``, ``ref``) interleaved with real
      ones (``id``, ``page``) in id-dependent order;
    - fragments on even ids.
    """
    d = F.col(id_col)
    tld = F.element_at(
        F.array(*[F.lit(t) for t in _TLDS]), (d % 5 + 1).cast("int")
    )
    host_core = F.concat(F.col(source_col), F.lit(".example."), tld)
    scheme_raw = (
        F.when(d % 3 == 0, "HTTPS").when(d % 3 == 1, "http").otherwise("https")
    )
    host_raw = (
        F.when(d % 4 == 0, F.concat(F.lit("WWW."), F.upper(host_core)))
        .when(d % 4 == 1, F.concat(F.lit("www."), host_core))
        .when(d % 4 == 2, F.upper(host_core))
        .otherwise(host_core)
    )
    port_raw = (
        F.when(d % 6 == 0, ":443")
        .when(d % 6 == 1, ":80")
        .when(d % 6 == 2, ":8080")
        .otherwise("")
    )
    path_raw = F.when(d % 7 == 0, F.lit("")).otherwise(
        F.concat(F.lit("/a/"), (d % 50).cast("string"), F.lit("/item"))
    )
    query_raw = (
        F.when(d % 5 == 4, F.lit(""))
        .when(
            d % 2 == 0,
            F.concat(
                F.lit("utm_source=feed"),
                (d % 4).cast("string"),
                F.lit("&id="),
                d.cast("string"),
                F.lit("&page="),
                (d % 9).cast("string"),
                F.lit("&ref=tw"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("page="),
                (d % 9).cast("string"),
                F.lit("&id="),
                d.cast("string"),
            )
        )
    )
    frag_raw = F.when(
        d % 2 == 0, F.concat(F.lit("#sec"), (d % 7).cast("string"))
    ).otherwise(F.lit(""))
    url = F.concat(
        scheme_raw,
        F.lit("://"),
        host_raw,
        port_raw,
        path_raw,
        F.when(query_raw == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), query_raw)
        ),
        frag_raw,
    )
    return df.withColumn("raw_url", url)


def _canon_parts(u: Column) -> dict[str, Column]:
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u, _HOSTPORT_RE, 1))
    host = F.regexp_replace(
        F.regexp_replace(hostport, r":\d+$", ""), r"^www\.", ""
    )
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "https") & (port == "443"))
        | ((scheme == "http") & (port == "80"))
    )
    port_out = F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(
        F.lit("")
    )
    path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(u, r"\?([^#]*)", 1)
    kept = F.filter(
        F.split(q, "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
    )
    q_canon = F.concat_ws("&", F.array_sort(kept))
    q_out = F.when(q_canon == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), q_canon)
    )
    return {
        "scheme": scheme,
        "host": host,
        "port_out": port_out,
        "path": path,
        "q_out": q_out,
    }


def canonicalize_urls(df: DataFrame, url_col: str = "raw_url") -> DataFrame:
    """Adds ``canonical_url`` and ``domain``. Canonical form: lowercase
    scheme and host, ``www.`` prefix stripped, scheme-default port
    stripped (non-default ports kept), empty path normalized to ``/``,
    tracking params dropped, surviving query keys sorted, fragment
    removed. ``domain`` is the canonical host. Pure narrow column
    algebra — no shuffle, no UDF; at 100 TB this is a map stage fused
    into the scan."""
    p = _canon_parts(F.col(url_col))
    canonical = F.concat(
        p["scheme"], F.lit("://"), p["host"], p["port_out"], p["path"],
        p["q_out"],
    )
    return (
        df.withColumn("canonical_url", canonical)
        .withColumn("domain", p["host"])
        .withColumn("path", p["path"])
    )


def has_tracking_params(url_col: str = "raw_url") -> Column:
    """True when any query parameter of the raw URL is a tracker."""
    q = F.regexp_extract(F.col(url_col), r"\?([^#]*)", 1)
    return F.exists(
        F.split(q, "&"), lambda x: x.rlike(TRACKING_PARAM_RE)
    )


# ---------------------------------------------------------------------------
# HTML → text extraction (the raw-web front end of the text path)
# ---------------------------------------------------------------------------

#: Block elements whose ENTIRE content is boilerplate for corpus text:
#: chrome (nav), promos (aside), legal (footer), and non-content head/
#: script/style payloads. Removed as whole blocks before tag stripping.
_BOILERPLATE_BLOCKS = ["head", "script", "style", "nav", "aside", "footer"]


def _esc(c: Column) -> Column:
    """HTML-escape the three structural characters (order matters: &
    first, or already-escaped entities double-escape)."""
    c = F.replace(c, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    return F.replace(c, F.lit(">"), F.lit("&gt;"))


def _unesc(c: Column) -> Column:
    """Inverse of ``_esc`` (&amp; LAST, the exact reverse order)."""
    c = F.replace(c, F.lit("&lt;"), F.lit("<"))
    c = F.replace(c, F.lit("&gt;"), F.lit(">"))
    return F.replace(c, F.lit("&amp;"), F.lit("&"))


def fabricate_doc_html(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Deterministic closed-form HTML page per document — title + head
    script/style, nav links, an id-dependent promo aside and inline body
    script, the escaped document text as the single content block, and a
    footer with entity soup. Same fabricate→operate discipline as the
    URL and media-codec families: both engines can regenerate the page,
    so the extractor is fully oracle-checkable."""
    d = F.col(id_col)
    src = F.col(source_col)
    title = F.when(
        d % 5 == 0,
        F.concat(F.lit("Doc "), d.cast("string"), F.lit(" &amp; notes")),
    ).otherwise(
        F.concat(src, F.lit(" - doc "), d.cast("string"))
    )
    html = F.concat(
        F.lit("<!DOCTYPE html><html><head><title>"),
        title,
        F.lit('</title><script type="text/javascript">var id='),
        d.cast("string"),
        F.lit(';track("'),
        src,
        F.lit('");</script><style>.nav a{color:#00f}</style></head><body>'),
        F.lit('<nav><a href="/">Home</a> <a href="/'),
        src,
        F.lit('">'),
        src,
        F.lit("</a></nav>"),
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit('<aside class="promo">Subscribe to '),
                src,
                F.lit(" updates &amp; offers!</aside>"),
            ),
        ).otherwise(F.lit("")),
        F.lit('<div id="main"><h1>Doc '),
        d.cast("string"),
        F.lit("</h1>"),
        F.when(
            d % 4 == 1, F.lit("<script>inlineTrack();</script>")
        ).otherwise(F.lit("")),
        F.lit("<p>"),
        _esc(F.col(text_col)),
        F.lit("</p></div><footer>&copy; 2026 "),
        src,
        F.lit(" &middot; All rights reserved</footer></body></html>"),
    )
    return df.withColumn("html", html)


def extract_html_text(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Boilerplate-stripping HTML→text extraction as pure column
    algebra: drop whole non-content blocks (head incl. title/script/
    style, body scripts, nav/aside/footer), strip remaining tags, decode
    the structural entities, collapse whitespace. Adds ``title`` (from
    the head, entity-decoded), ``n_links`` (anchor count in the RAW
    page) and ``text_clean``. Regex-based by design — RE2-safe patterns
    (non-greedy blocks, no backreferences) so the DuckDB oracle replays
    the identical extraction; a real parser is the obvious upgrade path
    but the Spark-side plumbing (scan-fused map stage, no shuffle, no
    UDF) is what matters at 100 TB."""
    h = F.col(html_col)
    title = _unesc(F.regexp_extract(h, r"<title>(.*?)</title>", 1))
    n_links = F.regexp_count(h, F.lit(r"<a\s")).cast("long")
    body = h
    for tag in _BOILERPLATE_BLOCKS:
        body = F.regexp_replace(
            body, rf"(?s)<{tag}(\s[^>]*)?>.*?</{tag}>", " "
        )
    body = F.regexp_replace(body, r"<[^>]*>", " ")
    body = _unesc(body)
    body = F.trim(F.regexp_replace(body, r"\s+", " "))
    return (
        df.withColumn("title", title)
        .withColumn("n_links", n_links)
        .withColumn("text_clean", body)
    )


# ---------------------------------------------------------------------------
# Robots rules + crawl politeness (frontier policy operators)
# ---------------------------------------------------------------------------


def fabricate_robots_rules(domains: DataFrame) -> DataFrame:
    """Three closed-form robots rules per domain — a deny-leaning
    section rule, a deeper override, and the root default — with the
    section polarity keyed off md5(domain) so both engines derive the
    same policy:

    - ``/a/``  : allow iff ascii(md5(domain)[0]) is even
    - ``/a/1`` : the OPPOSITE polarity (deeper prefix overrides)
    - ``/``    : allow (root default)

    Longest-prefix-match semantics (the Google robots.txt rule); the
    three prefix lengths are distinct so matches never tie."""
    d = F.col("domain")
    sect_allow = F.ascii(F.substring(F.md5(d), 1, 1)) % 2 == 0
    mk = lambda prefix, allow: domains.select(
        "domain",
        F.lit(prefix).alias("path_prefix"),
        F.length(F.lit(prefix)).alias("prefix_len"),
        allow.alias("allow"),
    )
    return (
        mk("/a/", sect_allow)
        .unionByName(mk("/a/1", ~sect_allow))
        .unionByName(mk("/", F.lit(True)))
    )


def robots_match(urls: DataFrame, rules: DataFrame) -> DataFrame:
    """Longest-prefix robots decision per URL: join on domain +
    prefix-match, keep the longest matching rule (``max_by`` on
    prefix_len — lengths are distinct per domain by construction, so
    the argmax is deterministic). The rule relation is tiny relative to
    the URL corpus (a few rows per domain) — broadcast, so the decision
    is a map-side join + one aggregation on doc_id at any crawl size.
    ``urls`` needs columns doc_id, domain, path."""
    j = urls.join(F.broadcast(rules), "domain").filter(
        F.col("path").startswith(F.col("path_prefix"))
    )
    return j.groupBy("doc_id", "domain", "path").agg(
        F.max_by("path_prefix", "prefix_len").alias("matched_prefix"),
        F.max_by("allow", "prefix_len").alias("allowed"),
    )


# ---------------------------------------------------------------------------
# WARC records (the CommonCrawl container format of a raw-web pipeline)
# ---------------------------------------------------------------------------


def fabricate_warc_records(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html",
    url_col: str = "raw_url",
) -> DataFrame:
    """One WARC/1.0 response record per document wrapping the fabricated
    HTML payload — named headers, CRLF line ends, blank-line separator,
    Content-Length in OCTETS (the field a compliant reader trusts to
    slice the payload). Closed-form, so the oracle regenerates the exact
    record text."""
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: "),
        F.lit("<urn:doc:"),
        F.col(id_col).cast("string"),
        F.lit(">\r\nWARC-Target-URI: "),
        F.col(url_col),
        F.lit("\r\nContent-Type: text/html\r\nContent-Length: "),
        F.octet_length(F.col(html_col)).cast("string"),
        F.lit("\r\n\r\n"),
        F.col(html_col),
    )
    return df.withColumn("warc", rec)


def parse_warc_records(df: DataFrame, warc_col: str = "warc") -> DataFrame:
    """Header-walk a WARC response record with column algebra: record id
    (doc id), target URI, declared Content-Length, the payload after the
    first blank line, and ``length_ok`` (declared octets == actual —
    the truncation check a crawl reader runs before trusting a record).
    Pure regexp/substring expressions — scan-fused, no UDF; malformed
    records yield empty fields and length_ok = false rather than
    failing the batch."""
    w = F.col(warc_col)
    # try_cast: malformed records extract '' and ANSI cast would throw —
    # a crawl reader degrades to NULL, it never fails the batch
    doc_id = F.regexp_extract(
        w, r"WARC-Record-ID: <urn:doc:(\d+)>", 1
    ).try_cast("long")
    uri = F.regexp_extract(w, r"WARC-Target-URI: ([^\r\n]*)", 1)
    declared = F.regexp_extract(w, r"Content-Length: (\d+)", 1).try_cast(
        "long"
    )
    payload = F.regexp_extract(w, r"(?s)\r\n\r\n(.*)$", 1)
    return (
        df.withColumn("doc_id_parsed", doc_id)
        .withColumn("target_uri", uri)
        .withColumn("declared_length", declared)
        .withColumn("payload", payload)
        .withColumn(
            "length_ok",
            F.coalesce(
                F.octet_length(F.col("payload"))
                == F.col("declared_length"),
                F.lit(False),
            ),
        )
    )


# ---------------------------------------------------------------------------
# Gzipped WARC members (what CommonCrawl actually ships: every record is
# an independent gzip member, so a reader can split the file at member
# boundaries). stdlib-zlib real compression — no external codec.
# ---------------------------------------------------------------------------


def gzip_warc_records(df: DataFrame, warc_col: str = "warc") -> DataFrame:
    """Compress each WARC record into an independent gzip member
    (mtime pinned to 0 and OS byte to 0xFF so the bytes are
    deterministic across runs and engines — gzip's header embeds a
    timestamp by default). Arrow-batched; bytes never row-at-a-time
    through Python object churn beyond the per-record compress call."""

    def batches(it):
        import gzip
        import io

        import pandas as pd

        for pdf in it:
            out = []
            for rec in pdf[warc_col]:
                buf = io.BytesIO()
                with gzip.GzipFile(
                    fileobj=buf, mode="wb", compresslevel=6, mtime=0
                ) as gz:
                    gz.write(rec.encode("utf-8"))
                out.append(buf.getvalue())
            yield pd.DataFrame({"warc_gz": out})

    return df.select(warc_col).mapInPandas(
        batches, schema="warc_gz binary"
    )


def gunzip_warc_records(
    df: DataFrame, gz_col: str = "warc_gz"
) -> DataFrame:
    """Decompress gzip WARC members back to record text, carrying the
    compressed/uncompressed byte sizes. Malformed members (bad magic,
    truncated stream, trailing-CRC mismatch) degrade to NULL text the
    way ``parse_warc_records`` degrades malformed records — a crawl
    reader never fails the batch."""

    def batches(it):
        import gzip

        import pandas as pd

        for pdf in it:
            texts, csizes, usizes = [], [], []
            for blob in pdf[gz_col]:
                csizes.append(len(blob) if blob is not None else None)
                try:
                    raw = gzip.decompress(bytes(blob))
                    texts.append(raw.decode("utf-8"))
                    usizes.append(len(raw))
                except Exception:
                    texts.append(None)
                    usizes.append(None)
            yield pd.DataFrame(
                {
                    "warc": texts,
                    "gz_bytes": pd.array(csizes, dtype="Int64"),
                    "raw_bytes": pd.array(usizes, dtype="Int64"),
                }
            )

    return df.select(gz_col).mapInPandas(
        batches, schema="warc string, gz_bytes long, raw_bytes long"
    )
