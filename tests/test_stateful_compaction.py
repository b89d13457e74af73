from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deluge_spark.index.build import BuildConfig, build_index
from deluge_spark.index.search import Searcher
from deluge_spark.plans.admin import compact_segments, index_summary
from deluge_spark.streaming.stateful import sessionize_batch, sessionize_stream

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def test_sessionize_batch_matches_duckdb(spark, sf_dir):
    import duckdb

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = (sessionize_batch(ev, gap_minutes=30).toPandas()
           .sort_values(["user_id", "session_start"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    want = con.execute("""
WITH t AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0
         END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM t
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       ROUND(sum(value), 4) AS sum_value
FROM s GROUP BY user_id, sid ORDER BY user_id, session_start
""").df()
    import pandas as pd
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_sessionize_stream_agrees_with_batch(spark, sf_dir):
    q = sessionize_stream(spark, sf_dir, EVENTS_SCHEMA, gap_minutes=30,
                          query_name="sess_stream")
    q.awaitTermination(180)
    got = spark.sql(
        "SELECT * FROM sess_stream ORDER BY user_id, session_start")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = sessionize_batch(ev, gap_minutes=30)
    got_pdf = got.toPandas()
    want_pdf = (want.toPandas()
                .sort_values(["user_id", "session_start"])
                .reset_index(drop=True))
    # append mode emits only CLOSED sessions; every emitted session must
    # exactly match a batch session, and most sessions should be closed
    merged = got_pdf.merge(
        want_pdf, on=["user_id", "session_start", "session_end",
                      "n_events", "sum_value"], how="left", indicator=True)
    assert (merged["_merge"] == "both").all()
    assert len(got_pdf) >= 0.5 * len(want_pdf)


def test_compaction_preserves_results(spark, corpus_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("compact_idx"))
    build_index(spark, corpus_df, d,
                BuildConfig(num_shards=4, tokenize_groups=2, shard_batches=2))
    before = Searcher(spark, d).search_local("import return table", 10)
    stats_before = index_summary(spark, d)
    m = compact_segments(spark, d, files_per_shard=1)
    assert m["replaced_batches"] == 2
    after = Searcher(spark, d).search_local("import return table", 10)
    stats_after = index_summary(spark, d)
    assert before == after
    assert stats_before["total_postings"] == stats_after["total_postings"]
    assert stats_before["vocabulary"] == stats_after["vocabulary"]


def test_update_stored_fields_mapping_evolution(spark, corpus_df,
                                                tmp_path_factory):
    """Mapping-update analog (r3 missing #2 / task #4): evolve the docs
    stored-field schema on a BUILT index — add derived columns, drop them —
    without re-tokenizing; searches byte-identical before/after; new
    columns usable as keyword filters; manifest records each evolution."""
    from deluge_spark.index.manifest import Manifest
    from deluge_spark.plans.admin import update_stored_fields

    d = str(tmp_path_factory.mktemp("idx_map"))
    build_index(spark, corpus_df, d,
                BuildConfig(num_shards=2, tokenize_groups=1,
                            shard_batches=1))
    s = Searcher(spark, d)
    before = s.search_local("import return table", 10)
    before_f = s.search("import return", 10,
                        filters={"lang": "python"}).collect()

    out = update_stored_fields(
        spark, d,
        add={"lang_uc": "upper(lang)",
             "n_chars": "length(content)"})
    assert {"lang_uc", "n_chars"} <= set(out["columns"])
    assert out["updates_applied"] == 1

    s2 = Searcher(spark, d)
    assert s2.search_local("import return table", 10) == before
    # the evolved column serves as a keyword filter immediately
    got_f = s2.search("import return", 10,
                      filters={"lang_uc": "PYTHON"}).collect()
    assert [(r["doc_id"], r["score"]) for r in got_f] == \
           [(r["doc_id"], r["score"]) for r in before_f]

    out2 = update_stored_fields(spark, d, drop=["lang_uc", "n_chars"])
    assert "lang_uc" not in out2["columns"]
    assert out2["updates_applied"] == 2
    assert Searcher(spark, d).search_local("import return table",
                                           10) == before

    units = [e["unit"] for e in Manifest(d).entries()]
    assert "mapping_update_0" in units and "mapping_update_1" in units

    # engine-owned columns are protected
    with pytest.raises(ValueError, match="protected"):
        update_stored_fields(spark, d, drop=["doc_id"])
    with pytest.raises(ValueError, match="protected"):
        update_stored_fields(spark, d, add={"shard": "0"})
