"""HTML → text extraction for crawl-derived corpora (beyond-reference;
the standard step BEFORE every text-quality / dedup operator in a
web-scale pipeline — C4, RefinedWeb, FineWeb all start from raw HTML).

Everything here is a regexp_replace/regexp_extract chain in the
Java∩RE2 subset (inline (?is) flags, non-greedy spans), so the whole
extraction is ONE map-only whole-stage-codegen projection — no UDF, no
shuffle, and a DuckDB oracle can replay it verbatim (DuckDB needs the
'g' option where Spark's regexp_replace is implicitly global).

This is deliberately a tag/entity-level extractor, not a DOM parser:
the 100 TB path needs a cheap, total function that never errors on the
malformed tag soup a crawl actually contains. Layout-aware boilerplate
removal (trafilatura-class) is out of scope; the line-level C4 filter
(operators/text.py::c4_line_filter) composes downstream for that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["html_to_text", "html_extract", "extract_links"]

# drop-entirely blocks: their text content is never prose
_DROP_BLOCKS = [
    r"(?is)<script\b[^>]*>.*?</script\s*>",
    r"(?is)<style\b[^>]*>.*?</style\s*>",
    r"(?is)<noscript\b[^>]*>.*?</noscript\s*>",
    r"(?s)<!--.*?-->",
]
# closing these implies a text break — emit a newline so downstream
# line-level operators (c4_line_filter, segment_dedup) see structure
_BREAK_TAGS = (
    r"(?i)<(?:br\s*/?|/p|/div|/li|/h[1-6]|/tr|/table|/ul|/ol|"
    r"/blockquote|/section|/article|/header|/footer)\s*>"
)
_ANY_TAG = r"(?s)<[^>]*>"

# the entity set worth decoding without an entity table; numeric
# entities beyond these stay literal (rare in prose, harmless to
# downstream token statistics)
_ENTITIES = [
    ("&nbsp;", " "),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),  # LAST, so &amp;lt; decodes to &lt; not <
]


def html_to_text(html) -> "F.Column":
    """Extract visible text from an HTML column: script/style/noscript/
    comment blocks dropped, block-closing tags become newlines, all
    remaining tags stripped, common entities decoded (&amp; last so
    double-escapes stay escaped), horizontal whitespace collapsed and
    blank lines squeezed. Total function: tag soup in, trimmed text
    out, never an error."""
    s = html
    for pat in _DROP_BLOCKS:
        s = F.regexp_replace(s, pat, "")
    s = F.regexp_replace(s, _BREAK_TAGS, "\n")
    s = F.regexp_replace(s, _ANY_TAG, " ")
    for ent, rep in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(rep))
    s = F.regexp_replace(s, r"[ \t\r]+", " ")
    s = F.regexp_replace(s, r" ?\n ?", "\n")
    s = F.regexp_replace(s, r"\n{2,}", "\n")
    return F.trim(F.regexp_replace(s, r"^\n+|\n+$", ""))


def html_extract(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    keep: "tuple[str, ...] | list[str]" = (),
) -> DataFrame:
    """Per-document extraction record: visible ``text``
    (:func:`html_to_text`), the ``<title>`` content, and the curation
    counters crawl pipelines gate on — link count (link farms), image
    count, and the text-to-markup ratio (boilerplate-heavy pages score
    low). One map-only projection; feed ``text`` straight into the
    text-quality/dedup operators.

    ``keep`` threads extra input columns through the projection
    unchanged (the lang_id_ngram pattern): composed pipelines that
    need (id, url, text) in one map-only relation would otherwise
    join this output back to its own input — an extra exchange that
    ships the text payload a second time (guide §2.3/§8)."""
    keep = tuple(keep)
    reserved = {
        "text", "title", "n_links", "n_images", "text_ratio", "noindex",
    }
    clash = [c for c in keep if c in reserved or c == id_col]
    if clash:
        raise ValueError(f"keep columns collide with output names: {clash}")
    # NULL html rows must produce empty records, not NULL/-1 artifacts
    h = F.coalesce(F.col(html_col), F.lit(""))
    text = html_to_text(h)
    title = F.trim(
        F.regexp_replace(
            F.regexp_extract(h, r"(?is)<title\b[^>]*>(.*?)</title\s*>", 1),
            r"\s+", " ",
        )
    )
    n_links = F.size(F.split(h, r"(?i)<a[\s>]")) - 1
    n_images = F.size(F.split(h, r"(?i)<img[\s>]")) - 1
    ratio = F.when(
        F.length(h) > 0,
        F.round(F.length(text) / F.length(h).cast("double"), 6),
    ).otherwise(F.lit(0.0))
    # robots meta directive: pages marked noindex must be excluded
    # from a training corpus (the crawl-etiquette gate)
    noindex = h.rlike(
        r'(?is)<meta\b[^>]*name\s*=\s*["\x27]?robots["\x27]?[^>]*'
        r'content\s*=\s*["\x27]?[^"\x27>]*noindex'
    )
    return df.select(
        F.col(id_col),
        *keep,
        text.alias("text"),
        title.alias("title"),
        n_links.cast("long").alias("n_links"),
        n_images.cast("long").alias("n_images"),
        ratio.alias("text_ratio"),
        noindex.alias("noindex"),
    )


def extract_links(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    out_col: str = "links",
) -> DataFrame:
    """All ``<a href>`` targets of each page, in document order —
    the raw material of the crawl frontier and of link-graph analysis
    (:func:`hdk_spark.operators.web.link_graph`).

    One map-only ``regexp_extract_all`` projection; total on tag soup
    (anchors without a quoted href contribute nothing; NULL html rows
    yield empty arrays). Both double- and single-quoted attribute
    forms match; the pattern stays inside the Java∩RE2∩DuckDB regex
    subset so SQL oracles can replay it verbatim. Targets are NOT
    canonicalized or resolved here — relative links pass through
    as written (frontier code joins them against the page URL;
    link_graph keeps only absolute http(s) targets).
    """
    h = F.coalesce(F.col(html_col), F.lit(""))
    return df.select(F.col(id_col), _href_targets(h).alias(out_col))


# the quoted-href pattern, shared with web.anchor_text_index's per-tag
# scalar re-extraction (one source of truth keeps Spark and oracle text
# in lockstep)
_HREF_VAL_RE = r'(?is)<a\b[^>]*?href\s*=\s*["\x27]([^"\x27]*)["\x27]'


def _href_targets(h) -> "F.Column":
    """array<string> of quoted href values of ``<a>`` tags in an html
    expression — shared by extract_links and web.link_graph."""
    return F.regexp_extract_all(h, F.lit(_HREF_VAL_RE), 1)
