"""WAT-style head-metadata extraction: kernel / JVM / oracle agreement.

The three consumers of functions/metadata.py's shared patterns must
agree byte-for-byte — the registry query (`html_metadata`) relies on
the JVM↔DuckDB pair, the binary-payload path on the kernel. These
tests pin all three pairwise on hand-written edge cases AND on the
deterministic synthetic corpus, plus the mapInPandas plumbing.
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ocr_agent_spark.functions.metadata import (
    METADATA_FIELDS,
    attach_head_metadata,
    extract_head_metadata,
    head_metadata_cols,
    head_metadata_sql,
    parse_head_metadata,
    synthetic_page_expr,
)

def _want(**kw):
    out = {f: None for f in METADATA_FIELDS}
    out.update(kw)
    return out


CASES = {
    "plain": (
        b'<html lang="en"><head><title>Hello World</title>'
        b'<meta name="description" content="A page"/>'
        b'<link rel="canonical" href="https://ex.org/a"/>'
        b'<meta property="og:title" content="OG Hello"/>'
        b"</head><body>Body og:title noise</body></html>",
        _want(title="Hello World", description="A page",
              canonical="https://ex.org/a", og_title="OG Hello",
              html_lang="en"),
    ),
    "single_quotes_flipped_order": (
        b"<html lang='fr'><head><TITLE> Bonjour  le\n monde </TITLE>"
        b"<meta content='La page' name='description'>"
        b"<link href='https://ex.org/b' rel='canonical'>"
        b"<meta content='OG Bonjour' property='og:title'>"
        b"</head><body></body></html>",
        _want(title="Bonjour le monde", description="La page",
              canonical="https://ex.org/b", og_title="OG Bonjour",
              html_lang="fr"),
    ),
    "no_head_close_whole_doc_fallback": (
        b'<html lang="de"><head><title>Kein Ende</title>'
        b'<body><meta name="description" content="sp\xc3\xa4t"/></body>',
        _want(title="Kein Ende", description="spät", html_lang="de"),
    ),
    "missing_everything": (
        b"<html><head></head><body>just text</body></html>",
        _want(),
    ),
    "xml_lang_not_matched": (
        b'<html xml:lang="ru"><head><title>T</title></head>',
        _want(title="T"),
    ),
    "body_metadata_ignored_when_head_closes": (
        b'<html lang="en"><head><title>Head only</title></head>'
        b'<body><meta name="description" content="in body"/>'
        b'<link rel="canonical" href="https://ex.org/late"/></body>',
        _want(title="Head only", html_lang="en"),
    ),
    "uppercase_tags": (
        b'<HTML LANG="EN-GB"><HEAD><TITLE>Loud</TITLE>'
        b'<META NAME="DESCRIPTION" CONTENT="SHOUT"/></HEAD>',
        _want(title="Loud", description="SHOUT", html_lang="EN-GB"),
    ),
    "first_title_wins": (
        b"<html><head><title>One</title><title>Two</title></head>",
        _want(title="One"),
    ),
    "empty_attr_is_null": (
        b'<html lang=""><head><title>   </title>'
        b'<meta name="description" content=""/></head>',
        _want(),
    ),
    "robots_and_quoted_charset": (
        b'<html><head><meta charset="UTF-8">'
        b'<meta name="robots" content="NOINDEX, nofollow"/></head>',
        _want(robots="noindex, nofollow", charset="utf-8"),
    ),
    "http_equiv_charset_flipped_robots": (
        b"<html><head><meta content='index,follow' name='robots'>"
        b"<meta http-equiv='Content-Type' "
        b"content='text/html; charset=ISO-8859-1'></head>",
        _want(robots="index,follow", charset="iso-8859-1"),
    ),
    "unquoted_charset": (
        b"<html><head><meta charset=Shift_JIS></head>",
        _want(charset="shift_jis"),
    ),
    "none_payload": (None, _want()),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_kernel_cases(name):
    html, want = CASES[name]
    assert parse_head_metadata(html) == want


def test_kernel_str_and_bytes_agree():
    html, _ = CASES["plain"]
    assert parse_head_metadata(html) == parse_head_metadata(
        html.decode("utf-8"))


def _jvm_extract(spark, pages: list[str | None]) -> list[dict]:
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(pages)], "i int, html_str string"
    )
    cols = head_metadata_cols(F.col("html_str"))
    rows = (
        df.select("i", *[cols[f].alias(f) for f in METADATA_FIELDS])
        .orderBy("i").collect()
    )
    return [{f: r[f] for f in METADATA_FIELDS} for r in rows]


def test_jvm_matches_kernel_on_cases(spark):
    pages = [
        h.decode("utf-8") if isinstance(h, bytes) else h
        for h, _ in CASES.values()
    ]
    got = _jvm_extract(spark, pages)
    for (name, (_, want)), jvm in zip(CASES.items(), got):
        assert jvm == want, name


def test_jvm_plan_is_pure_codegen(spark):
    df = spark.createDataFrame([("x",)], "html_str string")
    out = attach_head_metadata(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_mapinpandas_binary_path(spark):
    rows = [
        (f"https://ex.org/{i}", h if isinstance(h, bytes) else None)
        for i, (h, _) in enumerate(CASES.values())
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    out = extract_head_metadata(pages).orderBy("url")
    got = {r["url"]: {f: r[f] for f in METADATA_FIELDS}
           for r in out.collect()}
    for i, (name, (html, want)) in enumerate(CASES.items()):
        if not isinstance(html, bytes):
            want = {f: None for f in METADATA_FIELDS}
        assert got[f"https://ex.org/{i}"] == want, name


def test_synthetic_corpus_three_way(spark):
    """Spark-JVM, DuckDB, and the Python kernel agree on every page of
    the deterministic synthetic corpus (all variant axes covered)."""
    sf_dir = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    page = d.selectExpr(
        "doc_id", f"({synthetic_page_expr('spark')}) AS html_str"
    )
    cols = head_metadata_cols(F.col("html_str"))
    sp = (
        page.select("doc_id", *[cols[f].alias(f) for f in METADATA_FIELDS])
        .orderBy("doc_id").toPandas()
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    sqlcols = head_metadata_sql("html_str")
    du = con.execute(
        f"WITH pages AS (SELECT doc_id, ({synthetic_page_expr('duckdb')})"
        " AS html_str FROM documents) SELECT doc_id, "
        + ", ".join(f"{sqlcols[f]} AS {f}" for f in METADATA_FIELDS)
        + " FROM pages ORDER BY doc_id"
    ).fetchdf()

    assert len(sp) == len(du) > 0
    local = page.orderBy("doc_id").toPandas()
    for i in range(len(sp)):
        kern = parse_head_metadata(local["html_str"][i])
        for f in METADATA_FIELDS:
            a = sp[f][i] if pd.notnull(sp[f][i]) else None
            b = du[f][i] if pd.notnull(du[f][i]) else None
            assert a == b, (int(sp["doc_id"][i]), f, a, b)
            assert kern[f] == a, (int(sp["doc_id"][i]), f, kern[f], a)


def test_noindex_filter(spark):
    from ocr_agent_spark.functions.metadata import noindex_filter

    rows = [
        (1, '<html><head><meta name="robots" '
            'content="noindex,nofollow"/></head>'),
        (2, '<html><head><meta name="robots" '
            'content="index,follow"/></head>'),
        (3, "<html><head><title>no robots meta</title></head>"),
        (4, "<html><head><meta content='NOINDEX' name='robots'></head>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html_str string")
    kept = sorted(r["doc_id"] for r in noindex_filter(df).collect())
    assert kept == [2, 3]
    audited = sorted(
        r["doc_id"]
        for r in noindex_filter(df, keep_blocked=True).collect()
    )
    assert audited == [1, 4]
    plan = noindex_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_heading_outline_extraction(spark):
    from ocr_agent_spark.functions.metadata import heading_outline

    html = (
        "<html><body><h1>Top</h1>"
        "<h2 class='s'>Section <b>one</b></h2>"
        "<H3>  spaced   heading </H3>"
        "<h2></h2>"
        "<p>h1 in text is not a heading</p>"
        "<h6>deep</h6></body></html>"
    )
    df = spark.createDataFrame([(1, html), (2, "<html>no headings</html>")],
                               "doc_id long, html_str string")
    rows = heading_outline(df).orderBy("doc_id", "pos").collect()
    assert [(r["doc_id"], r["pos"], r["level"], r["text"])
            for r in rows] == [
        (1, 0, 1, "Top"),
        (1, 1, 2, "Section one"),
        (1, 2, 3, "spaced heading"),
        (1, 3, 2, None),  # empty heading keeps its row, NULL text
        (1, 4, 6, "deep"),
    ]


def test_heading_outline_plan_is_pure_jvm(spark):
    from ocr_agent_spark.functions.metadata import heading_outline

    df = spark.createDataFrame([(1, "<h1>x</h1>")],
                               "doc_id long, html_str string")
    plan = (heading_outline(df)._jdf.queryExecution()
            .executedPlan().toString())
    # r8: allow only the adaptive scan-widening round-robin exchange
    exchanges = [ln for ln in plan.splitlines()
                 if "Exchange" in ln and "Reused" not in ln]
    assert len(exchanges) <= 1 and all(
        "roundrobin" in ln.lower() for ln in exchanges), plan
    assert "Python" not in plan


def test_variant_axes_all_present(spark):
    """The generator actually produces every variant it documents —
    missing fields, both quote styles, the no-</head> fallback."""
    sf_dir = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    page = d.selectExpr(
        "doc_id", f"({synthetic_page_expr('spark')}) AS html_str"
    )
    agg = page.select(
        F.sum(F.col("html_str").contains("'").cast("int")).alias("sq"),
        F.sum(F.col("html_str").contains('"').cast("int")).alias("dq"),
        F.sum((~F.lower(F.col("html_str")).contains("</head>"))
              .cast("int")).alias("nohead"),
        F.sum((F.col("doc_id") % 5 == 0).cast("int")).alias("nodesc"),
    ).collect()[0]
    assert agg["sq"] > 0 and agg["dq"] > 0
    assert agg["nohead"] > 0 and agg["nodesc"] > 0
