"""Edge-case tests for the chunkers (FIXTURES.md §3: lengths 0/1/size-1/size/
size+1/5000; marker attribution; empty-chunk dropping)."""

from __future__ import annotations

from vector_db_light_spark.operators.chunking import (
    chunk_fixed,
    chunk_overlap_with_pages,
    page_markers,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_fixed_chunker_boundaries(spark):
    docs = _docs(
        spark,
        [
            (0, ""),                  # no chunks
            (1, "a"),                 # one 1-char chunk
            (2, "x" * 119),           # one chunk
            (3, "x" * 120),           # one chunk
            (4, "x" * 121),           # two chunks (second = "x")
            (5, "x" * 120 + " " * 120),  # second chunk strips to empty -> dropped
        ],
    )
    out = {
        (r["doc_id"], r["chunk_offset"]): r["chunk_text"]
        for r in chunk_fixed(docs, 120).collect()
    }
    counts = {}
    for (doc, _off) in out:
        counts[doc] = counts.get(doc, 0) + 1
    assert counts == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}
    assert out[(4, 120)] == "x"
    assert (5, 120) not in out  # whitespace-only chunk dropped (strip semantics)


def test_page_marker_positions(spark):
    docs = _docs(spark, [(0, "[[page3]]abc[[page7]]defgh[[page9]]")])
    rows = {
        r["page_number"]: r["clean_pos"] for r in page_markers(docs).collect()
    }
    assert rows == {3: 0, 7: 3, 9: 8}


def test_overlap_chunker_page_attribution(spark):
    # clean text = 10 chars; size=6 overlap=3 -> starts 0,3,6,9
    docs = _docs(spark, [(0, "[[page1]]abcde[[page2]]fghij")])
    out = {
        r["chunk_offset"]: (r["chunk_text"], r["page_number"])
        for r in chunk_overlap_with_pages(docs, 6, 3).collect()
    }
    assert out[0] == ("abcdef", 1)
    assert out[3] == ("defghi", 1)
    assert out[6] == ("ghij", 2)   # start 6 >= marker pos 5 -> page2
    assert out[9] == ("j", 2)


def test_chunks_before_first_marker_dropped(spark):
    # Reference drops chunks whose page is None (no marker at-or-before).
    docs = _docs(spark, [(0, "abcdef[[page4]]ghij")])
    out = {r["chunk_offset"]: r["page_number"]
           for r in chunk_overlap_with_pages(docs, 4, 2).collect()}
    # clean = abcdefghij; marker pos 6; starts 0,2,4 have no marker -> dropped
    assert sorted(out) == [6, 8]
    assert out[6] == 4 and out[8] == 4


def test_chunk_udtf_matches_chunk_fixed(spark):
    """§2.9 UDTF surface: the SQL-visible LATERAL table function yields
    exactly chunk_fixed's (doc_id, chunk_offset, chunk_text) rows on the
    fixture corpus — per-row Python, pinned equal to the Catalyst chunker
    it fronts for pure-SQL users."""
    from conftest import SF_SMOKE

    from vector_db_light_spark.functions.udtfs import register_udtfs
    from vector_db_light_spark.operators.chunking import chunk_fixed

    register_udtfs(spark)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    docs.createOrReplaceTempView("_udtf_docs")
    got = {
        (r["doc_id"], r["chunk_offset"], r["chunk_text"])
        for r in spark.sql(
            "SELECT d.doc_id, c.chunk_offset, c.chunk_text "
            "FROM _udtf_docs d, LATERAL chunk_text(d.text, 150) c"
        ).collect()
    }
    want = {
        (r["doc_id"], r["chunk_offset"], r["chunk_text"])
        for r in chunk_fixed(docs, 150).collect()
    }
    assert got == want and got
