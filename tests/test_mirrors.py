"""Mirror-host detection (functions/mirrors.py)."""

import pytest

from ocr_agent_spark.functions.mirrors import (
    fingerprint_host_df_stats, host_fingerprints, mirror_host_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    pages = [f"unique page {i} body text" for i in range(10)]
    rows = []
    # m1 and m2: full mirrors (same 10 pages)
    for h in ("m1.com", "m2.com"):
        rows += [(h, p) for p in pages]
    # partial.com: 8 of the 10 pages + 2 of its own
    rows += [("partial.com", p) for p in pages[:8]]
    rows += [("partial.com", f"only partial {i}") for i in range(2)]
    # solo.com: unrelated
    rows += [("solo.com", f"solo page {i}") for i in range(5)]
    # every host also serves the same boilerplate error page (hot fp)
    rows += [(h, "404 not found") for h in
             ("m1.com", "m2.com", "partial.com", "solo.com")]
    return spark.createDataFrame(rows, "host string, text string")


def test_full_and_partial_mirrors_detected(spark, docs):
    got = {
        (r["host_a"], r["host_b"]): r
        for r in mirror_host_pairs(
            docs, min_containment=0.5, max_fp_hosts=3
        ).collect()
    }
    full = got[("m1.com", "m2.com")]
    assert full["shared"] == 10
    assert full["containment"] == 1.0
    part = got[("m1.com", "partial.com")]
    assert part["shared"] == 8
    assert part["containment"] == pytest.approx(0.8)
    assert not any("solo.com" in k for k in got)


def test_hot_fingerprint_capped_not_counted(spark, docs):
    # the 404 page is on 4 hosts > cap 3 → it must not create pairs nor
    # count toward sizes
    got = {
        (r["host_a"], r["host_b"]): r
        for r in mirror_host_pairs(
            docs, min_containment=0.99, max_fp_hosts=3
        ).collect()
    }
    assert set(got) == {("m1.com", "m2.com")}
    assert got[("m1.com", "m2.com")]["size_a"] == 10  # 404 excluded


def test_cap_report(spark, docs):
    hf = host_fingerprints(docs)
    r = fingerprint_host_df_stats(hf, max_fp_hosts=3).collect()[0]
    assert r["n_fps_dropped_by_cap"] == 1
    assert r["max_hosts_per_fp"] == 4


def test_containment_threshold(spark, docs):
    got = mirror_host_pairs(
        docs, min_containment=0.9, max_fp_hosts=3
    ).collect()
    assert {(r["host_a"], r["host_b"]) for r in got} == {
        ("m1.com", "m2.com")
    }


def test_fingerprint_normalization(spark):
    # whitespace/case variants are the same content → mirrors
    docs = spark.createDataFrame(
        [("a.com", "Hello  World"), ("a.com", "second page one"),
         ("b.com", "hello world"), ("b.com", "Second  Page  One")],
        "host string, text string",
    )
    got = mirror_host_pairs(docs, min_containment=0.9).collect()
    assert len(got) == 1 and got[0]["shared"] == 2
