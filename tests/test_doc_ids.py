from __future__ import annotations


from deluge_spark.operators.doc_ids import assign_doc_ids


def test_doc_ids_match_global_order(spark, corpus_pdf, corpus_df):
    got = assign_doc_ids(corpus_df).select("repo", "path", "commit", "doc_id")
    got_pdf = got.toPandas().sort_values("doc_id").reset_index(drop=True)
    want = (
        corpus_pdf[["repo", "path", "commit"]]
        .sort_values(["repo", "path", "commit"])
        .reset_index(drop=True)
    )
    assert list(got_pdf["doc_id"]) == list(range(len(want)))
    assert got_pdf["repo"].tolist() == want["repo"].tolist()
    assert got_pdf["path"].tolist() == want["path"].tolist()


def test_doc_ids_stable_across_layouts(spark, corpus_df):
    a = assign_doc_ids(corpus_df, num_partitions=3)
    b = assign_doc_ids(corpus_df.repartition(17), num_partitions=11)
    pa = a.select("path", "doc_id").toPandas().set_index("path")["doc_id"]
    pb = b.select("path", "doc_id").toPandas().set_index("path")["doc_id"]
    assert pa.sort_index().equals(pb.sort_index())


def test_existing_doc_id_kept_when_dense(spark):
    """Dense pre-assigned ids are kept (values untouched) but the frame is
    range-repartitioned so downstream doc-range grouping holds."""
    rows = [(i, f"doc {i}") for i in (2, 0, 3, 1)]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    out = assign_doc_ids(df)
    assert sorted(r["doc_id"] for r in out.collect()) == [0, 1, 2, 3]
    got = {r["doc_id"]: r["content"] for r in out.collect()}
    assert got == {i: f"doc {i}" for i in range(4)}


def test_existing_doc_id_sparse_rejected(spark):
    """Sparse/offset ids would silently fall outside every tokenize group
    (grp = doc_id // step) and corrupt the index — must raise."""
    import pytest

    df = spark.createDataFrame([(5, "x")], "doc_id long, content string")
    with pytest.raises(ValueError, match="dense"):
        assign_doc_ids(df)
    dup = spark.createDataFrame([(0, "x"), (0, "y")],
                                "doc_id long, content string")
    with pytest.raises(ValueError, match="dense"):
        assign_doc_ids(dup)


def test_unpersist_assigned_releases_cache(spark, corpus_df):
    """The cache pinned by assign_doc_ids must actually be released by
    unpersist_assigned — unpersisting the returned (withColumn-derived)
    frame directly is a plan-mismatch no-op that leaks a corpus-sized
    cache for the session."""
    from deluge_spark.operators.doc_ids import assign_doc_ids, unpersist_assigned

    jsc = spark.sparkContext._jsc.sc()
    before = len(jsc.getRDDStorageInfo())
    # a plan distinct from every other test's (limit value) — an identical
    # plan would dedupe against an earlier test's cache entry
    out = assign_doc_ids(corpus_df.limit(137))
    out.count()  # materialize the cache
    assert len(jsc.getRDDStorageInfo()) > before
    unpersist_assigned(out)
    assert len(jsc.getRDDStorageInfo()) == before
