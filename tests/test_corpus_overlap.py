"""Corpus-level shingle overlap: exact + minhash estimate."""

import duckdb
import pytest

from ocr_agent_spark.functions.dedup import (
    corpus_overlap_estimate, corpus_shingle_overlap,
)


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_overlap_hand_computed(spark):
    # corpus A: shingles {a b c, b c d} ∪ {x y z}; corpus B shares
    # doc 0's text and adds {p q r}
    a = _mkdocs(spark, [(0, "a b c d"), (1, "x y z")])
    b = _mkdocs(spark, [(10, "a b c d"), (11, "p q r")])
    r = corpus_shingle_overlap(a, b).collect()[0]
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["n_inter"] == 2 and r["n_union"] == 4
    assert r["jaccard"] == pytest.approx(0.5)
    assert r["containment_a"] == pytest.approx(2 / 3)
    assert r["containment_b"] == pytest.approx(2 / 3)


def test_disjoint_and_identical(spark):
    a = _mkdocs(spark, [(0, "one two three four")])
    ident = corpus_shingle_overlap(a, a).collect()[0]
    assert ident["jaccard"] == 1.0 and ident["containment_a"] == 1.0
    b = _mkdocs(spark, [(1, "five six seven eight")])
    dis = corpus_shingle_overlap(a, b).collect()[0]
    assert dis["n_inter"] == 0 and dis["jaccard"] == 0.0


def test_short_doc_whole_text_shingle(spark):
    # <n tokens → the whole text is the one shingle (shingle_table
    # contract); overlap must honor that branch
    a = _mkdocs(spark, [(0, "hi there")])
    b = _mkdocs(spark, [(1, "hi there")])
    r = corpus_shingle_overlap(a, b).collect()[0]
    assert (r["n_a"], r["n_b"], r["n_inter"]) == (1, 1, 1)


def test_estimate_tracks_exact(spark):
    # ~50 docs, half shared: estimate within 3 sigma of exact
    shared = [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3} tok{i+4}")
              for i in range(25)]
    only_a = [(100 + i, f"alpha{i} beta{i} gamma{i} delta{i}")
              for i in range(12)]
    only_b = [(200 + i, f"eps{i} zeta{i} eta{i} theta{i}")
              for i in range(12)]
    a = _mkdocs(spark, shared + only_a)
    b = _mkdocs(spark, [(1000 + i, t) for i, t in shared] + only_b)
    exact = corpus_shingle_overlap(a, b).collect()[0]["jaccard"]
    est = corpus_overlap_estimate(a, b, num_hashes=128).collect()[0]
    assert est["num_hashes"] == 128
    sigma = (exact * (1 - exact) / 128) ** 0.5
    assert abs(est["jaccard_est"] - exact) <= 3 * sigma + 1e-9


def test_exact_matches_duckdb(spark):
    a = _mkdocs(spark, [(0, "a b c d e"), (1, "hi"), (2, "x y z w")])
    b = _mkdocs(spark, [(0, "c d e f g"), (1, "hi"), (2, "p q r s")])
    sdf = corpus_shingle_overlap(a, b).toPandas()
    con = duckdb.connect()
    con.register("ca", a.toPandas())
    con.register("cb", b.toPandas())
    sql_sh = """
        SELECT DISTINCT shingle FROM (
          SELECT array_to_string(t[i:i+2], ' ') AS shingle
          FROM (SELECT regexp_split_to_array(trim(lower(text)), '\\s+')
                  AS t FROM {tbl})
             , unnest(generate_series(1, len(t) - 2)) AS g(i)
          WHERE len(t) >= 3
          UNION ALL
          SELECT array_to_string(t, ' ')
          FROM (SELECT regexp_split_to_array(trim(lower(text)), '\\s+')
                  AS t FROM {tbl})
          WHERE len(t) < 3
        )
    """
    odf = con.execute(f"""
        WITH sa AS ({sql_sh.format(tbl="ca")}),
             sb AS ({sql_sh.format(tbl="cb")}),
        j AS (
          SELECT sa.shingle AS s_a, sb.shingle AS s_b
          FROM sa FULL OUTER JOIN sb ON sa.shingle = sb.shingle
        )
        SELECT CAST(COUNT(s_a) AS BIGINT) AS n_a,
               CAST(COUNT(s_b) AS BIGINT) AS n_b,
               CAST(SUM(CASE WHEN s_a IS NOT NULL AND s_b IS NOT NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_inter,
               CAST(COUNT(*) AS BIGINT) AS n_union
        FROM j
    """).df()
    for c in ("n_a", "n_b", "n_inter", "n_union"):
        assert int(sdf[c][0]) == int(odf[c][0]), c
