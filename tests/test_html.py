"""HTML → text extraction invariants: tag/entity handling, break
structure, curation counters, junk totality, map-only plan."""

import pytest
from pyspark.sql import functions as F


def test_html_to_text_structure_and_entities(spark):
    from hdk_spark.operators.html import html_to_text

    html = (
        "<html><head><title>T</title><style>p{color:red}</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><h1>Header</h1><p>First &amp; second &lt;para&gt;.</p>"
        "<div>Block one</div><ul><li>item one</li><li>item two</li></ul>"
        "<!-- a comment with <p>markup</p> -->"
        "<p>Tail&nbsp;text &amp;lt; stays escaped</p></body></html>"
    )
    df = spark.createDataFrame([(1, html)], "i: long, h: string")
    got = df.select(html_to_text(F.col("h")).alias("t")).collect()[0]["t"]
    lines = got.split("\n")
    assert lines[0] == "T Header"  # title text + h1 (h1 close breaks)
    assert "First & second <para>." in lines
    assert "item one" in lines and "item two" in lines
    assert "not text" not in got and "color:red" not in got
    assert "comment" not in got
    # &amp;lt; must decode to the LITERAL '&lt;' (amp decoded last)
    assert "Tail text &lt; stays escaped" in got


def test_html_to_text_total_on_tag_soup(spark):
    from hdk_spark.operators.html import html_to_text

    soup = [
        (1, "<p>unclosed <b>bold"),
        (2, "no markup at all"),
        (3, "<"),
        (4, ""),
        (5, "<script>never closed"),
    ]
    df = spark.createDataFrame(soup, "i: long, h: string")
    got = {r["i"]: r["t"] for r in df.select(
        "i", html_to_text(F.col("h")).alias("t")).collect()}
    assert got[1] == "unclosed bold"
    assert got[2] == "no markup at all"
    assert got[4] == ""
    # an unclosed script block has no </script>: the drop regex cannot
    # fire, the tag strip removes <script> and the text remains —
    # totality beats perfection on tag soup
    assert "never closed" in got[5]


def test_html_extract_counters(spark):
    from hdk_spark.operators.html import html_extract

    html = (
        "<html><title> My  Page </title><body>"
        '<a href="/x">one</a> <a href="/y">two</a>'
        '<img src="a.png"><img src="b.png"><img src="c.png">'
        "<p>Some text here</p></body></html>"
    )
    df = spark.createDataFrame(
        [(1, html), (2, None)], "doc_id: long, html: string")
    got = {r["doc_id"]: r for r in html_extract(df).collect()}
    assert got[1]["title"] == "My Page"
    assert got[1]["n_links"] == 2 and got[1]["n_images"] == 3
    assert "Some text here" in got[1]["text"]
    assert 0.0 < got[1]["text_ratio"] < 1.0
    assert got[2]["text"] == "" and got[2]["title"] == ""
    assert got[2]["n_links"] == 0 and got[2]["text_ratio"] == 0.0
    assert not got[1]["noindex"] and not got[2]["noindex"]


def test_html_extract_noindex_flag(spark):
    from hdk_spark.operators.html import html_extract

    df = spark.createDataFrame(
        [(1, '<head><META NAME=robots CONTENT="NOINDEX, follow"></head>'),
         (2, '<head><meta name="robots" content="index,follow"></head>'),
         (3, '<head><meta name="viewport" content="noindex-ish"></head>')],
        "doc_id: long, html: string")
    got = {r["doc_id"]: r["noindex"] for r in html_extract(df).collect()}
    assert got == {1: True, 2: False, 3: False}


def test_html_extract_map_only_plan(spark):
    from hdk_spark.operators.html import html_extract

    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id: long, html: string")
    p = (
        html_extract(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in p and "Join" not in p


def test_html_to_text_composes_with_quality_gates(spark):
    """The extracted text column feeds the existing curation operators
    directly (the pipeline contract)."""
    from hdk_spark.operators.html import html_extract
    from hdk_spark.operators.text import c4_line_filter

    html = "<p>" + "the quick brown fox jumps over the lazy dog. " * 5 + "</p>"
    df = spark.createDataFrame([(1, html)], "doc_id: long, html: string")
    out = c4_line_filter(html_extract(df).select("doc_id", "text"))
    assert out.count() >= 1


def test_extract_links_quote_forms_and_order(spark):
    from hdk_spark.operators.html import extract_links

    html = (
        '<a href="http://a.com/1">d</a>'
        "<A HREF='https://b.com/2?q=1'>s</A>"
        '<a class="x" href="/rel">rel</a>'
        '<a name="anchor">no href</a>'
        '<img src="http://c.com/i.png">'
    )
    df = spark.createDataFrame([(1, html)], "doc_id: long, html: string")
    [row] = extract_links(df).collect()
    assert row["links"] == ["http://a.com/1", "https://b.com/2?q=1", "/rel"]


def test_extract_links_total_on_junk_and_null(spark):
    from hdk_spark.operators.html import extract_links

    rows = [(1, None), (2, ""), (3, "<a href=nounquoted>x</a>"), (4, "<<<>>")]
    df = spark.createDataFrame(rows, "doc_id: long, html: string")
    got = {r["doc_id"]: r["links"] for r in extract_links(df).collect()}
    assert got == {1: [], 2: [], 3: [], 4: []}


def test_extract_links_map_only_plan(spark):
    from hdk_spark.operators.html import extract_links

    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id: long, html: string")
    p = extract_links(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "Join" not in p


def test_link_graph_filters_and_weights(spark):
    from hdk_spark.operators.web import link_graph

    rows = [
        # two parallel links a->b; a relative link (dropped); a
        # self-link a->a (dropped); junk scheme (dropped)
        (1, "http://www.a.com/p",
         '<a href="http://b.com/1">x</a><a href="https://sub.b.com/2">y</a>'
         '<a href="/rel">r</a><a href="http://a.com/self">s</a>'
         '<a href="javascript:void(0)">j</a>'),
        # no parseable page host -> src_domain '' dropped
        (2, "not a url", '<a href="http://b.com/z">x</a>'),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, url: string, html: string")
    got = {(r["src_domain"], r["dst_domain"]): r["n_links"]
           for r in link_graph(df).collect()}
    # www. is part of the host labels heuristic: reg_domain('www.a.com')
    # is 'a.com'; sub.b.com collapses to b.com -> parallel edge count 2
    assert got == {("a.com", "b.com"): 2}


def test_link_graph_single_exchange_plan(spark):
    from hdk_spark.operators.web import link_graph

    df = spark.createDataFrame(
        [(1, "http://a.com/", '<a href="http://b.com/">x</a>')],
        "doc_id: long, url: string, html: string",
    )
    p = link_graph(df)._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange") == 1 and "Join" not in p


def test_extract_links_fuzz_matches_python_twin(spark):
    """Random tag soup through extract_links vs a Python re twin of
    the same pattern — pins Java/RE2-subset parity and totality on
    junk beyond the planted contract forms."""
    import random
    import re

    rng = random.Random(99)
    pat = re.compile(
        r'(?is)<a\b[^>]*?href\s*=\s*["\']([^"\']*)["\']'
    )
    pieces = [
        '<a href="http://s{}.com/p">x</a>', "<A HREF='/rel{}'>y</A>",
        '<a href = "q{}">z</a>', '<a name="n{}">plain</a>',
        '<a href={}>unquoted</a>', "text {} <b>bold</b>", "<<<>{}>",
        '<img src="i{}.png">', '<a class="c" href="#f{}">frag</a>',
        "<a\nhref=\"nl{}\">nl</a>", "&amp;{}", '"{}\'',
    ]
    rows = []
    for i in range(120):
        n = rng.randint(0, 8)
        rows.append(
            (i, "".join(rng.choice(pieces).format(rng.randint(0, 99))
                        for _ in range(n)))
        )
    df = spark.createDataFrame(rows, "doc_id: long, html: string")
    from hdk_spark.operators.html import extract_links

    got = {r["doc_id"]: r["links"] for r in extract_links(df).collect()}
    for i, html in rows:
        assert got[i] == pat.findall(html), (i, html)


def test_link_graph_case_insensitive_endpoints(spark):
    from hdk_spark.operators.web import link_graph

    rows = [
        (1, "http://A.COM/p", '<a href="http://b.com/1">x</a>'),
        (2, "http://b.com/p", '<a href="HTTP://a.com/2">y</a>'),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, url: string, html: string")
    got = sorted(
        (r["src_domain"], r["dst_domain"]) for r in link_graph(df).collect()
    )
    assert got == [("a.com", "b.com"), ("b.com", "a.com")]


def test_anchor_text_index(spark):
    """Inner markup strips to spaces, case folds, empty/image anchors
    drop, relative and self-domain anchors drop, weights aggregate
    across pages; NULL html total."""
    from hdk_spark.operators.web import anchor_text_index

    rows = [
        (0, "http://a.com/p",
         '<a href="http://b.com/x">Great <b>Search</b> Engine</a>'
         '<a href="/rel">rel text</a>'
         '<a href="http://a.com/self">self nav</a>'
         '<a href="http://c.com/y"><img src="i.png"/></a>'),
        (1, "http://B.com/q", "<A HREF='https://C.com/z'>great  engine</A>"),
        (2, "http://d.com", None),
        (3, "http://e.com", '<a name="x">no href</a>'),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, url: string, html: string")
    got = {(r["dst_domain"], r["term"]): r["weight"]
           for r in anchor_text_index(df).collect()}
    assert got == {
        ("b.com", "great"): 1, ("b.com", "search"): 1,
        ("b.com", "engine"): 1,
        ("c.com", "great"): 1, ("c.com", "engine"): 1,
    }
