"""Web-crawl ingestion operators: the steps that sit BETWEEN the raw crawl
and every text operator in this package (HTML -> text extraction, WARC
record splitting, per-domain curation stats).

A production pre-training pipeline reads CommonCrawl-shaped data: WARC/WET
record streams whose payloads are HTML. The existing curation/textstats
operators all assume a clean ``documents(doc_id, text)`` table; this module
supplies the crawl-facing edge that produces it. Same engine discipline as
the rest of the repo (reference hygiene: ``utils/preprocessor.py:6-68``
pins byte-deterministic preprocessing; we pin engine-deterministic regex
chains): every transformation is a pure JVM column expression — RE2- and
java.util.regex-compatible patterns evaluated identically by Spark and the
DuckDB oracle, no Python in the hot path, no UDFs.

Scale notes (100 TB crawl):
- ``html_extract`` is per-row map work — no shuffle at all; it runs inside
  whole-stage codegen fused with the parquet scan.
- ``warc_split`` is split+posexplode per blob — also shuffle-free; blobs
  are crawl chunk files (~1 GiB gzip members in real WARC), so the explode
  fan-out is bounded per input row and rows stay within partition budgets
  set by ``spark.sql.files.maxPartitionBytes``.
- ``domain_stats`` aggregates on registered host — a dim orders of
  magnitude smaller than the page table; the blocklist joins broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .curation import canonicalize_url

# decode order matters and is pinned: &amp; must be decoded LAST —
# decoding it first turns "&amp;lt;" into "&lt;" which the later &lt;
# replace then double-decodes to "<"; with &amp; last, "&amp;lt;" never
# matches the earlier "&lt;" pattern (the '&' is followed by 'a') and
# correctly yields the TEXT "&lt;" — html.unescape's single-pass
# semantics for this subset. Same order in the DuckDB oracle.
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def html_extract(
    pages: DataFrame, html_col: str = "html", keep: tuple = ()
) -> DataFrame:
    """HTML -> text extraction (trafilatura/jusText-lite): drop
    script/style subtrees, pull the <title>, strip remaining tags, decode
    the six entities that dominate web text, collapse whitespace.

    The chain order is load-bearing and identical in the DuckDB oracle:
    script/style removal BEFORE tag-strip (their bodies are not text),
    tag-strip BEFORE entity decode (a decoded ``&lt;b&gt;`` is literal text
    and must survive), whitespace collapse last. All patterns avoid
    lookaround so java.util.regex and RE2 agree; ``(?s).*?`` lazy spans are
    supported and verified identical on both engines.

    Returns (doc_id, *keep, title, body, body_chars) — per-row map work,
    zero shuffle, fused with the scan under whole-stage codegen. ``keep``
    carries extra input columns through (e.g. the fetch URI) so callers
    never need a re-attach join against the pre-extraction table.
    """
    u = F.regexp_replace(F.col(html_col), "(?s)<script[^>]*>.*?</script>", " ")
    u = F.regexp_replace(u, "(?s)<style[^>]*>.*?</style>", " ")
    title = F.regexp_extract(u, "(?s)<title>(.*?)</title>", 1)
    body = F.regexp_replace(u, "<[^>]+>", " ")
    for ent, ch in _ENTITIES:
        title = F.replace(title, F.lit(ent), F.lit(ch))
        body = F.replace(body, F.lit(ent), F.lit(ch))
    body = F.trim(F.regexp_replace(body, "\\s+", " "))
    return pages.select(
        "doc_id",
        *keep,
        title.alias("title"),
        body.alias("body"),
        F.length(body).alias("body_chars"),
    )


def warc_split(blobs: DataFrame, blob_col: str = "payload") -> DataFrame:
    """Split concatenated WARC-style crawl chunks into records.

    Input rows are (blob_id, payload) where payload is a concatenation of
    records ``WARC/1.0\\nWARC-Target-URI: <uri>\\nContent-Length: <n>\\n\\n
    <body>\\n\\n`` — the WARC/1.0 framing (ISO 28500) reduced to the two
    headers a text pipeline reads. Split on the version line, posexplode
    for a stable in-blob record index, header fields via regexp_extract.

    Emits (blob_id, rec_idx, uri, declared_len, body, body_chars);
    ``declared_len`` vs ``body_chars`` is the record-integrity check a real
    ingest would quarantine on. Shuffle-free: split+explode fan-out is
    bounded by records-per-chunk; real WARC chunks are ~1 GiB and would be
    further split upstream by the file reader.
    """
    recs = blobs.select(
        "blob_id",
        F.posexplode(F.split(F.col(blob_col), "WARC/1\\.0\\n")).alias(
            "pos", "rec"
        ),
    ).filter(F.col("rec") != "")
    body = F.regexp_extract(F.col("rec"), "(?s)\\n\\n(.*?)\\n\\n", 1)
    return recs.select(
        "blob_id",
        # pos 0 is the empty pre-delimiter split; records start at pos 1
        (F.col("pos") - 1).alias("rec_idx"),
        F.regexp_extract(F.col("rec"), "WARC-Target-URI: ([^\\n]+)", 1).alias(
            "uri"
        ),
        F.regexp_extract(F.col("rec"), "Content-Length: ([0-9]+)", 1)
        .cast("bigint")
        .alias("declared_len"),
        body.alias("body"),
        F.length(body).alias("body_chars"),
    )


def domain_stats(
    pages: DataFrame, blocklist: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Per-registered-host curation stats + blocklist flag (the UT1/URL-
    blocklist shape every crawl pipeline applies before content work).

    Canonicalizes URLs (shared chain with ``url_canonical_dedup``), groups
    by host, and reports per domain: page count, distinct canonical URLs,
    and the duplicate-fetch rate in exact integer ppm. ``blocklist`` is a
    (host) DataFrame — at real scale a few-MB list, always broadcastable.

    One aggregate keyed by host (a dim orders smaller than the page table;
    per-host fan-in is bounded by per-site crawl frequency — the same
    boundedness argument as ``url_canonical_dedup``), then one broadcast
    left join for the flag. No window, no skew funnel.
    """
    canon = pages.select(
        canonicalize_url(F.col(url_col)).alias("canonical_url")
    )
    hosts = canon.select(
        F.regexp_extract(F.col("canonical_url"), "^https?://([^/]+)", 1).alias(
            "host"
        ),
        "canonical_url",
    )
    agg = hosts.groupBy("host").agg(
        F.count("*").alias("n_pages"),
        F.countDistinct("canonical_url").alias("n_urls"),
        F.expr(
            "(count(*) - count(DISTINCT canonical_url)) * 1000000"
            " div count(*)"
        ).alias("dup_ppm"),
    )
    bl = blocklist.select(F.col("host"), F.lit(True).alias("blocked"))
    return agg.join(F.broadcast(bl), "host", "left").select(
        "host",
        "n_pages",
        "n_urls",
        "dup_ppm",
        F.coalesce(F.col("blocked"), F.lit(False)).alias("blocked"),
    )


def robots_filter(
    pages: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Robots/blocklist PATH-PREFIX filtering: drop any page whose
    canonical URL's host has a rule whose ``path_prefix`` prefixes the
    page's path (the robots.txt ``Disallow:`` semantics, also the shape of
    licensing/opt-out lists).

    Engine shape: ``rules`` is (host, path_prefix) — a crawl-policy dim
    that is KBs-to-MBs at any corpus size, so the anti-join broadcasts and
    the prefix test runs map-side: Spark plans the host equi-key as a
    BroadcastHashJoin and evaluates ``startswith`` as the residual join
    condition — never a nested-loop over the corpus. Returns the ALLOWED
    pages (doc_id, canonical_url, host, path).
    """
    canon = pages.select(
        "doc_id", canonicalize_url(F.col(url_col)).alias("canonical_url")
    ).select(
        "doc_id",
        "canonical_url",
        F.regexp_extract(F.col("canonical_url"), "^https?://([^/]+)", 1).alias(
            "host"
        ),
        F.regexp_replace(F.col("canonical_url"), "^https?://[^/]+", "").alias(
            "path"
        ),
    )
    r = F.broadcast(rules.select("host", "path_prefix"))
    cond = (canon["host"] == r["host"]) & (
        canon["path"].startswith(r["path_prefix"])
    )
    return canon.join(r, cond, "left_anti")


def outlink_extract(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    with_src_host: bool = False,
) -> DataFrame:
    """Outlink + anchor-text extraction: the web-graph edge source every
    crawl pipeline derives (CommonCrawl publishes exactly this as its
    host/domain graph inputs; anchor text is a classic relevance signal).

    Per page: pull every ``<a ... href="...">...</a>`` element with
    ``regexp_extract_all``, posexplode for a stable in-page link index,
    then per element extract the href and the TAG-STRIPPED, whitespace-
    collapsed anchor text (nested ``<b>``/``<i>`` markup inside anchors is
    common and must not leak into the signal). Link resolution follows the
    deterministic subset of RFC 3986 a text pipeline needs: absolute
    http(s) hrefs pass through, root-relative ``/path`` hrefs resolve
    against the page's scheme+host, everything else (fragments,
    javascript:, mailto:, protocol-relative) is dropped.

    All patterns are lazy-span regexes valid identically under
    java.util.regex and RE2 (no lookaround) — the same engine-parity
    discipline as ``html_extract``. Returns (doc_id, link_idx, dst_url,
    anchor_text), plus a leading ``src_host`` column when ``with_src_host``
    (for host-graph aggregation — carried through the explode so callers
    never re-join the page table). Pure per-row map work: explode fan-out
    is bounded by links-per-page; no shuffle, fused with the scan."""
    base = F.regexp_extract(F.col(url_col), "^https?://[^/]+", 0)
    elems = F.regexp_extract_all(
        F.col(html_col),
        F.lit('(?s)<a [^>]*href="[^"]*"[^>]*>.*?</a>'),
        F.lit(0),
    )
    ex = pages.select(
        "doc_id",
        base.alias("base"),
        F.posexplode(elems).alias("link_idx", "elem"),
    )
    href = F.regexp_extract(F.col("elem"), 'href="([^"]*)"', 1)
    anchor = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_extract(F.col("elem"), "(?s)>(.*?)</a>", 1),
                "<[^>]+>",
                " ",
            ),
            "\\s+",
            " ",
        )
    )
    resolved = (
        F.when(href.rlike("^https?://"), href)
        .when(href.startswith("/"), F.concat(F.col("base"), href))
        .otherwise(F.lit(None))
    )
    src_cols = (
        [F.regexp_replace(F.col("base"), "^https?://", "").alias("src_host")]
        if with_src_host
        else []
    )
    return (
        ex.select(
            *src_cols,
            "doc_id",
            "link_idx",
            resolved.alias("dst_url"),
            anchor.alias("anchor_text"),
        )
        .filter(F.col("dst_url").isNotNull())
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str = "url", fp_col: str = "fp"
) -> DataFrame:
    """Crawl snapshot diffing: classify every URL across two crawl
    snapshots as added / removed / changed / unchanged — the re-crawl
    scheduling + incremental-corpus primitive (only 'added'+'changed'
    pages need re-extraction; 'removed' pages need tombstoning in the
    training corpus).

    One full-outer shuffle join on the page key, then a pure map-side
    CASE over fingerprint presence/equality. At 100 TB both sides are
    url-keyed page tables of the same corpus — the join keys are unique
    per side (canonical urls), so there is no fan-out and no skew funnel;
    AQE handles residual partition imbalance. Returns
    (key, status, old_fp, new_fp)."""
    o = old.select(F.col(key).alias("k"), F.col(fp_col).alias("old_fp"))
    n = new.select(F.col(key).alias("k"), F.col(fp_col).alias("new_fp"))
    st = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return o.join(n, "k", "full_outer").select(
        F.col("k").alias(key), st.alias("status"), "old_fp", "new_fp"
    )


def anchor_text_index(
    links: DataFrame,
    dst_col: str = "dst_url",
    anchor_col: str = "anchor_text",
) -> DataFrame:
    """Anchor-text aggregation per link target — the classic anchor index
    (how OTHER pages describe a URL: a relevance/description signal search
    and corpus-labeling pipelines both consume): per dst_url the inbound
    link count, distinct anchor phrasings, and the modal anchor with a
    deterministic tie-break (highest count, then lexicographically
    smallest — ``min_by`` over the (-count, anchor) struct, so the gate
    hash is order-exact; the modal anchor's count is then just
    ``max(count)``).

    Two stacked aggregates: (dst, anchor) counts, then the dst rollup —
    both partial-aggregate-friendly, no window over the link table, no
    join. At crawl scale the hot keys are mega-linked URLs; they collapse
    to one row per distinct anchor in pass 1, bounding pass-2 fan-in by
    anchor vocabulary, not inbound degree."""
    per = links.groupBy(
        F.col(dst_col).alias("dst_url"),
        F.col(anchor_col).alias("anchor_text"),
    ).agg(F.count("*").alias("cnt"))
    return per.groupBy("dst_url").agg(
        F.sum("cnt").alias("n_links"),
        F.count("*").alias("n_anchors"),
        F.expr(
            "min_by(anchor_text, struct(-cnt, anchor_text))"
        ).alias("top_anchor"),
        F.max("cnt").alias("top_anchor_links"),
    )
