"""Command-line entry points — the spark-submit surface.

  python -m deluge_spark.cli build   --corpus <parquet> --out <index_dir>
  python -m deluge_spark.cli search  --index <index_dir> --query "..." [-k N]
  python -m deluge_spark.cli search-many --index <index_dir> \
      --queries queries.json [-k N] [--fetch]
  python -m deluge_spark.cli stream-ingest --source <dir> --index <dir> \
      --schema "..." [--finalize] [--gc-groups]
  python -m deluge_spark.cli stream-finalize --index <index_dir> \
      [--tier-factor K] [--gc-groups]
  python -m deluge_spark.cli summary --index <index_dir>
  python -m deluge_spark.cli reindex --index <index_dir> --out <dir> --shards N
  python -m deluge_spark.cli compact --index <index_dir> [--files-per-shard N]
  python -m deluge_spark.cli source-summary --corpus <parquet>
  python -m deluge_spark.cli ingest --input <dir|files> --format jsonl \
      --schema "id string, content string" --out <index_dir>

``ingest`` is the reference's end-to-end workflow (point at raw files,
get a searchable index): lenient parse (CSV/TSV/JSONL/plain lines) →
error-threshold gate on corrupt rows → index build. ``build`` is the
same thing for an already-parsed parquet corpus.

On a cluster: ``spark-submit --py-files deluge_spark.zip -m deluge_spark.cli
...`` — the module ships itself to executors automatically in local mode.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import zipfile


def _spark(cores: int | None, shuffle: int | None):
    from deluge_spark.session import get_spark

    spark = get_spark("deluge_spark_cli", cores=cores,
                      shuffle_partitions=shuffle)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = os.path.join(tempfile.gettempdir(), "deluge_spark_pkg.zip")
    with zipfile.ZipFile(z, "w") as zf:
        pkg = os.path.join(repo, "deluge_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    zf.write(p, os.path.relpath(p, repo))
    spark.sparkContext.addPyFile(z)
    return spark


def _parse_filters(specs: list[str]) -> dict | None:
    """``--filter`` grammar → Searcher filter specs: ``col=v`` term,
    ``col=v1,v2`` terms (IN), ``col>=v`` / ``col<=v`` / ``col>v`` /
    ``col<v`` range (repeated range bounds on one column conjoin).
    Numeric-looking values compare as numbers."""
    def _coerce(v: str):
        for cast in (int, float):
            try:
                return cast(v)
            except ValueError:
                pass
        return v

    out: dict = {}
    for f in specs:
        for tok, op in ((">=", "gte"), ("<=", "lte"), (">", "gt"),
                        ("<", "lt"), ("=", None)):
            if tok in f:
                col, val = f.split(tok, 1)
                col = col.strip()
                if op is None:
                    vals = [_coerce(x) for x in val.split(",")]
                    out[col] = vals if len(vals) > 1 else vals[0]
                else:
                    spec = out.setdefault(col, {})
                    if not isinstance(spec, dict):
                        raise SystemExit(
                            f"--filter: can't mix = and range on {col!r}")
                    spec[op] = _coerce(val)
                break
        else:
            raise SystemExit(f"--filter: no operator in {f!r}")
    return out or None


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="deluge_spark")
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--corpus", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--shards", type=int, default=8)
    b.add_argument("--tokenizer", choices=["code", "simple"], default="code")
    b.add_argument("--groups", type=int, default=4)
    b.add_argument("--text-col", default="content",
                   help="corpus column holding the document text "
                        "(renamed to 'content' for the index; if the "
                        "default is absent but a 'text' column exists, "
                        "it is used automatically)")
    b.add_argument("--overwrite", action="store_true",
                   help="allow wiping an existing index built from a "
                        "different source (otherwise StaleIndexError)")

    s = sub.add_parser("search")
    s.add_argument("--index", required=True, action="append",
                   help="index dir; repeatable — multiple indexes search "
                        "as one logical corpus (dfs-merged stats), plain "
                        "--query only")
    s.add_argument("--query", default=None,
                   help="free (should) query; with --must/--must-not "
                        "this is the bool query's should clause")
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--filter", action="append", default=[],
                   help="repeatable: col=v (term), col=v1,v2 (terms/IN), "
                        "col>=v col<=v col>v col<v (range)")
    s.add_argument("--fetch", action="store_true")
    s.add_argument("--must", default=None,
                   help="bool query: tokens that must ALL appear")
    s.add_argument("--must-not", dest="must_not", default=None,
                   help="bool query: tokens that exclude a doc")
    s.add_argument("--phrase", default=None,
                   help="exact-phrase query (adjacent analyzed tokens)")
    s.add_argument("--prefix", default=None,
                   help="prefix query (dictionary expansion, df-desc)")
    s.add_argument("--wildcard", default=None,
                   help="wildcard query (* / ?, dictionary expansion)")
    s.add_argument("--boost", action="append", default=[],
                   metavar="TERM=FACTOR",
                   help="repeatable per-term score boost (ES term^boost) "
                        "for --query / --must bool searches")
    s.add_argument("--fuzzy", default=None,
                   help="fuzzy query term (dictionary expansion within "
                        "--max-edits Levenshtein edits)")
    s.add_argument("--max-edits", default="auto",
                   help="fuzzy edit budget: 0/1/2 or 'auto' (ES AUTO)")
    s.add_argument("--prefix-length", type=int, default=0,
                   help="fuzzy: first chars pinned exact (prunes the "
                        "dictionary scan)")
    s.add_argument("--max-expansions", type=int, default=50,
                   help="prefix/fuzzy expansion cap (ES max_expansions)")
    s.add_argument("--highlight", action="store_true",
                   help="with --query: emit a snippet around the first "
                        "matched term per hit (ES highlight)")
    s.add_argument("--like", type=int, default=None, metavar="DOC_ID",
                   help="more_like_this: docs similar to a stored doc "
                        "(top tf-idf terms as a disjunction)")
    s.add_argument("--sort", default=None, metavar="FIELD",
                   help="sort by a stored field instead of BM25 score "
                        "(ES sort without _score; skips scoring)")
    s.add_argument("--asc", action="store_true",
                   help="with --sort: ascending (default descending)")
    s.add_argument("--from", dest="from_", type=int, default=0,
                   help="pagination offset (ES from; with -k as size)")
    s.add_argument("--after", default=None, metavar="VALUE,DOC_ID",
                   help="with --sort: search_after cursor — the last "
                        "page's final (sort value, doc_id); the O(k) "
                        "deep-paging path")
    s.add_argument("--min-should-match", dest="msm", type=int, default=0,
                   help="bool query: candidates must contain at least "
                        "this many distinct should (--query) tokens")

    mg = sub.add_parser("mget",
                        help="fetch stored docs by id (ES _mget)")
    mg.add_argument("--index", required=True)
    mg.add_argument("--ids", required=True,
                    help="comma-separated doc_ids")
    mg.add_argument("--fields", default=None,
                    help="comma-separated stored-field subset")

    cn = sub.add_parser("count",
                        help="match-set size (ES _count), no scoring")
    cn.add_argument("--index", required=True)
    cn.add_argument("--query", required=True)
    cn.add_argument("--filter", action="append", default=[])

    ex = sub.add_parser("explain",
                        help="per-term BM25 breakdown of one doc's score "
                             "(ES _explain)")
    ex.add_argument("--index", required=True)
    ex.add_argument("--query", required=True)
    ex.add_argument("--doc", type=int, required=True)

    sg = sub.add_parser("suggest",
                        help="did-you-mean term suggestions from the "
                             "dictionary (ES term suggester)")
    sg.add_argument("--index", required=True)
    sg.add_argument("--text", required=True)
    sg.add_argument("--size", type=int, default=5)
    sg.add_argument("--mode", default="missing",
                    choices=["missing", "popular", "always"])
    sg.add_argument("--max-edits", default="auto")
    sg.add_argument("--prefix-length", type=int, default=1)

    fa = sub.add_parser("facet",
                        help="aggregations over the match set (ES aggs)")
    fa.add_argument("--index", required=True)
    fa.add_argument("--query", required=True)
    fa.add_argument("--filter", action="append", default=[])
    fa.add_argument("--terms", default=None, metavar="FIELD",
                    help="terms agg: doc counts per value of FIELD")
    fa.add_argument("--histogram", type=int, default=None,
                    metavar="INTERVAL",
                    help="histogram agg over doc length at INTERVAL")
    fa.add_argument("--stats", default=None, metavar="FIELD",
                    help="stats agg (count/min/max/avg/sum) over FIELD")
    fa.add_argument("--cardinality", default=None, metavar="FIELD",
                    help="cardinality agg: distinct values of FIELD")
    fa.add_argument("--approx", action="store_true",
                    help="with --cardinality/--percentiles: sketch "
                         "estimate (fixed memory; the at-scale mode)")
    fa.add_argument("--percentiles", default=None, metavar="FIELD",
                    help="percentiles agg over FIELD (25/50/75/95/99)")
    fa.add_argument("--top-hits", dest="top_hits", default=None,
                    metavar="BUCKET_FIELD,SORT_FIELD",
                    help="terms bucket + top_hits: per-bucket top docs "
                         "by the sort field (--size hits per bucket)")
    fa.add_argument("--size", type=int, default=10)

    sm = sub.add_parser("search-many",
                        help="evaluate a query SET in one distributed job "
                             "(per-query filters supported)")
    sm.add_argument("--index", required=True)
    sm.add_argument("--queries", required=True,
                    help="JSON file mapping name -> query string, or "
                         "name -> {\"query\": ..., \"filters\": "
                         "{col: val}}")
    sm.add_argument("-k", type=int, default=10)
    sm.add_argument("--fetch", action="store_true")
    sm.add_argument("--query-groups", type=int, default=1,
                    help="scoring-task granularity: split the query set "
                         "into G cost-balanced groups (num_shards x G "
                         "tasks; results identical for any G)")

    si = sub.add_parser("stream-ingest",
                        help="streaming ingest of an arriving-files dir "
                             "(availableNow trigger: drains what's there, "
                             "checkpoints, exits; re-run as files arrive)")
    si.add_argument("--source", required=True,
                    help="parquet dir files arrive into (must carry doc_id)")
    si.add_argument("--index", required=True)
    si.add_argument("--schema", required=True,
                    help="DDL schema of the source rows")
    si.add_argument("--shards", type=int, default=8)
    si.add_argument("--finalize", action="store_true",
                    help="compact new deltas into searchable runs after "
                         "the drain")
    si.add_argument("--gc-groups", action="store_true")

    sfz = sub.add_parser("stream-finalize",
                         help="compact accumulated stream deltas into "
                              "searchable segment runs (size-tiered)")
    sfz.add_argument("--index", required=True)
    sfz.add_argument("--tier-factor", type=int, default=4)
    sfz.add_argument("--gc-groups", action="store_true")

    m = sub.add_parser("summary")
    m.add_argument("--index", required=True)

    r = sub.add_parser("reindex")
    r.add_argument("--index", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--shards", type=int, default=8)

    c = sub.add_parser("compact")
    c.add_argument("--index", required=True)
    c.add_argument("--files-per-shard", type=int, default=1)

    um = sub.add_parser("update-mapping",
                        help="evolve stored-field schema in place "
                             "(no re-tokenize); ≙ SetUpdateMapping")
    um.add_argument("--index", required=True)
    um.add_argument("--add", action="append", default=[],
                    metavar="NAME=SQL_EXPR",
                    help="derived stored field, repeatable "
                         "(e.g. nlines=\"size(split(content, '\\n'))\")")
    um.add_argument("--drop", action="append", default=[],
                    help="stored-field column to drop, repeatable")

    apd = sub.add_parser("append",
                         help="add docs to a built index incrementally "
                              "(own segment batch; no rebuild, existing "
                              "segments untouched)")
    apd.add_argument("--index", required=True)
    apd.add_argument("--corpus", required=True,
                     help="parquet dir of new docs (same columns as build)")
    apd.add_argument("--auto-compact-batches", type=int, default=16,
                     help="squash segment batches when more than this many "
                          "accumulate (Lucene merge policy; 0 disables)")

    up = sub.add_parser("upsert",
                        help="re-ingest changed docs: tombstone matching "
                             "natural keys, append the new versions")
    up.add_argument("--index", required=True)
    up.add_argument("--corpus", required=True)
    up.add_argument("--key-cols", default="repo,path",
                    help="comma-separated natural-key columns")

    dl = sub.add_parser("delete",
                        help="tombstone docs (ES delete-by-query analog); "
                             "results exclude them immediately, stats "
                             "change on purge")
    dl.add_argument("--index", required=True)
    dl.add_argument("--where", default=None,
                    help="SQL predicate over stored fields "
                         "(e.g. \"lang = 'go'\")")
    dl.add_argument("--ids", default=None,
                    help="comma-separated doc_ids")

    pg = sub.add_parser("purge",
                        help="physically drop tombstoned docs (segment "
                             "rewrite, no re-tokenize) and refresh stats")
    pg.add_argument("--index", required=True)

    ss = sub.add_parser("source-summary")
    ss.add_argument("--corpus", required=True)
    ss.add_argument("--text-col", default="content")

    ing = sub.add_parser("ingest")
    ing.add_argument("--input", required=True, nargs="+")
    ing.add_argument("--format", choices=["jsonl", "csv", "tsv", "lines"],
                     default="jsonl")
    ing.add_argument("--schema", default=None,
                     help="DDL schema for jsonl/csv/tsv (enables the "
                          "corrupt-row threshold gate for jsonl)")
    ing.add_argument("--header", action="store_true")
    ing.add_argument("--content-col", default="content")
    ing.add_argument("--exclude", action="append", default=[],
                     help="exact basename to exclude, repeatable")
    ing.add_argument("--error-threshold", type=float, default=0.05)
    ing.add_argument("--codec", default=None,
                     choices=["flate", "zlib", "gzip", "bzip2"],
                     help="for --format lines: decode whole files with "
                          "this codec (bare flate/zlib streams Spark "
                          "cannot decode by extension)")
    ing.add_argument("--key-cols", default=None,
                     help="comma-separated columns forming the stable "
                          "doc-id sort key (default: whichever of "
                          "repo,path,commit exist, else all columns)")
    ing.add_argument("--out", required=True)
    ing.add_argument("--shards", type=int, default=8)
    ing.add_argument("--tokenizer", choices=["code", "simple"],
                     default="code")
    ing.add_argument("--overwrite", action="store_true",
                     help="allow wiping an existing index built from a "
                          "different source (otherwise StaleIndexError)")

    args = ap.parse_args(argv)
    spark = _spark(args.cores, args.shuffle_partitions)

    if args.cmd == "build":
        from deluge_spark.index.build import BuildConfig, build_index

        corpus = spark.read.parquet(args.corpus)
        text_col = args.text_col
        if text_col == "content" and "content" not in corpus.columns \
                and "text" in corpus.columns:
            text_col = "text"
        if text_col != "content":
            if text_col not in corpus.columns:
                raise SystemExit(f"--text-col {text_col!r} not in corpus "
                                 f"columns {corpus.columns}")
            corpus = corpus.withColumnRenamed(text_col, "content")
        metrics = build_index(spark, corpus, args.out, BuildConfig(
            num_shards=args.shards, tokenizer_mode=args.tokenizer,
            tokenize_groups=args.groups, overwrite_stale=args.overwrite))
        print(json.dumps(metrics))
    elif args.cmd == "search":
        from deluge_spark.index.search import Searcher

        filters = _parse_filters(args.filter)
        picked = [x for x in (args.query, args.phrase, args.prefix,
                              args.wildcard, args.fuzzy) if x] \
            + [x for x in (args.must, args.must_not) if x] \
            + ([args.like] if args.like is not None else [])
        if not picked:
            raise SystemExit("search needs --query, --must/--must-not, "
                             "--phrase, --prefix, --wildcard, --fuzzy, "
                             "or --like")
        if len(args.index) > 1:
            from deluge_spark.index.multi import MultiSearcher

            if picked != [args.query]:
                raise SystemExit("multiple --index supports plain "
                                 "--query search only")
            ms = MultiSearcher(spark, args.index)
            out = ms.search(args.query, args.k, filters=filters or None,
                            fetch=args.fetch)
            for row in out.collect():
                print(json.dumps(row.asDict()))
            return 0
        searcher = Searcher(spark, args.index[0])
        if args.like is not None:
            out = searcher.more_like_this(args.like, args.k,
                                          filters=filters,
                                          fetch=args.fetch)
        elif args.highlight:
            if args.query is None:
                raise SystemExit("--highlight needs --query")
            out = searcher.highlight(args.query, args.k, filters=filters)
        elif args.sort is not None:
            if args.query is None:
                raise SystemExit("--sort needs --query (the match set)")
            after = None
            if args.after is not None:
                v, d = args.after.rsplit(",", 1)
                for cast in (int, float):
                    try:
                        v = cast(v)
                        break
                    except ValueError:
                        pass
                after = (v, int(d))
            out = searcher.search_sorted(args.query, args.sort, args.k,
                                         ascending=args.asc,
                                         from_=args.from_,
                                         filters=filters,
                                         fetch=args.fetch,
                                         search_after=after)
        elif args.fuzzy is not None:
            edits = (args.max_edits if args.max_edits == "auto"
                     else int(args.max_edits))
            out = searcher.search_fuzzy(args.fuzzy, args.k, edits,
                                        args.max_expansions,
                                        args.prefix_length, filters,
                                        fetch=args.fetch)
        elif args.phrase is not None:
            out = searcher.search_phrase(args.phrase, args.k, filters,
                                         fetch=args.fetch)
        elif args.prefix is not None:
            out = searcher.search_prefix(args.prefix, args.k,
                                         args.max_expansions, filters,
                                         fetch=args.fetch)
        elif args.wildcard is not None:
            out = searcher.search_wildcard(args.wildcard, args.k,
                                           args.max_expansions, filters,
                                           fetch=args.fetch)
        elif args.must is not None or args.must_not is not None \
                or args.boost:
            boosts = None
            if args.boost:
                boosts = {t: float(v) for t, v in
                          (b.split("=", 1) for b in args.boost)}
            out = searcher.search_bool(must=args.must, should=args.query,
                                       must_not=args.must_not, k=args.k,
                                       filters=filters, fetch=args.fetch,
                                       minimum_should_match=args.msm,
                                       boosts=boosts)
        elif args.fetch:
            out = searcher.search(args.query, args.k, filters, fetch=True)
        else:
            for doc_id, score in searcher.search_local(args.query, args.k,
                                                       filters):
                print(json.dumps({"doc_id": doc_id, "score": score}))
            out = None
        if out is not None:
            for row in out.collect():
                print(json.dumps(row.asDict()))
    elif args.cmd == "mget":
        from deluge_spark.index.search import Searcher

        searcher = Searcher(spark, args.index)
        fields = args.fields.split(",") if args.fields else None
        ids = [int(x) for x in args.ids.split(",") if x]
        for row in searcher.get_docs(ids, fields).collect():
            print(json.dumps(row.asDict()))
    elif args.cmd == "count":
        from deluge_spark.index.search import Searcher

        searcher = Searcher(spark, args.index)
        print(json.dumps({"n_matches": searcher.count(
            args.query, _parse_filters(args.filter))}))
    elif args.cmd == "explain":
        from deluge_spark.index.search import Searcher

        searcher = Searcher(spark, args.index)
        for row in searcher.explain_score(args.query, args.doc).collect():
            print(json.dumps(row.asDict()))
    elif args.cmd == "suggest":
        from deluge_spark.index.search import Searcher

        searcher = Searcher(spark, args.index)
        me = args.max_edits if args.max_edits == "auto" \
            else int(args.max_edits)
        for row in searcher.suggest_terms(
                args.text, size=args.size, max_edits=me,
                prefix_length=args.prefix_length,
                suggest_mode=args.mode).collect():
            print(json.dumps(row.asDict()))
    elif args.cmd == "facet":
        from deluge_spark.index.search import Searcher

        filters = _parse_filters(args.filter)
        searcher = Searcher(spark, args.index)
        if args.terms is not None:
            out = searcher.facet_terms(args.query, by=args.terms,
                                       size=args.size, filters=filters)
        elif args.histogram is not None:
            out = searcher.facet_histogram(args.query, args.histogram,
                                           filters=filters)
        elif args.stats is not None:
            out = searcher.facet_stats(args.query, args.stats,
                                       filters=filters)
        elif args.cardinality is not None:
            out = searcher.facet_cardinality(args.query, args.cardinality,
                                             filters=filters,
                                             exact=not args.approx)
        elif args.percentiles is not None:
            out = searcher.facet_percentiles(args.query, args.percentiles,
                                             filters=filters,
                                             exact=not args.approx)
        elif args.top_hits is not None:
            by, sort_by = args.top_hits.split(",", 1)
            out = searcher.facet_top_hits(args.query, by=by,
                                          sort_by=sort_by,
                                          hits_per_bucket=args.size,
                                          filters=filters)
        else:
            raise SystemExit("facet needs --terms, --histogram, --stats, "
                             "--cardinality, --percentiles, or --top-hits")
        for row in out.collect():
            print(json.dumps(row.asDict()))
    elif args.cmd == "search-many":
        from deluge_spark.index.search import Searcher

        with open(args.queries) as f:
            spec = json.load(f)
        queries, filters = {}, {}
        for name, q in spec.items():
            if isinstance(q, dict):
                queries[name] = q["query"]
                if q.get("filters"):
                    filters[name] = dict(q["filters"])
            else:
                queries[name] = q
        searcher = Searcher(spark, args.index)
        rows = searcher.search_many(queries, args.k,
                                    filters=filters or None,
                                    fetch=args.fetch,
                                    query_groups=args.query_groups).collect()
        for row in rows:
            print(json.dumps(row.asDict()))
    elif args.cmd == "stream-ingest":
        from deluge_spark.index.build import BuildConfig
        from deluge_spark.streaming.ingest import (
            finalize_segments,
            stream_ingest_corpus,
        )

        q = stream_ingest_corpus(spark, args.source, args.index,
                                 args.schema,
                                 BuildConfig(num_shards=args.shards))
        q.awaitTermination()
        out = {"stream": "drained"}
        if args.finalize:
            fin = finalize_segments(spark, args.index,
                                    num_shards=args.shards,
                                    gc_groups=args.gc_groups)
            out = {k: v for k, v in fin.items() if k != "input_files"}
        print(json.dumps(out))
    elif args.cmd == "stream-finalize":
        from deluge_spark.streaming.ingest import finalize_segments

        fin = finalize_segments(spark, args.index,
                                tier_factor=args.tier_factor,
                                gc_groups=args.gc_groups)
        print(json.dumps({k: v for k, v in fin.items()
                          if k != "input_files"}))
    elif args.cmd == "summary":
        from deluge_spark.plans.admin import index_summary

        print(json.dumps(index_summary(spark, args.index)))
    elif args.cmd == "reindex":
        from deluge_spark.index.build import BuildConfig
        from deluge_spark.plans.admin import reindex

        print(json.dumps(reindex(spark, args.index, args.out,
                                 BuildConfig(num_shards=args.shards))))
    elif args.cmd == "compact":
        from deluge_spark.plans.admin import compact_segments

        print(json.dumps(compact_segments(spark, args.index,
                                          args.files_per_shard)))
    elif args.cmd == "update-mapping":
        from deluge_spark.plans.admin import update_stored_fields

        add = {}
        for spec in args.add:
            name, _, expr = spec.partition("=")
            if not name or not expr:
                raise SystemExit(f"--add expects NAME=SQL_EXPR, got {spec!r}")
            add[name] = expr
        print(json.dumps(update_stored_fields(spark, args.index,
                                              add=add, drop=args.drop)))
    elif args.cmd == "append":
        from deluge_spark.plans.admin import append_docs

        print(json.dumps(append_docs(
            spark, args.index, spark.read.parquet(args.corpus),
            auto_compact_batches=args.auto_compact_batches or None)))
    elif args.cmd == "upsert":
        from deluge_spark.plans.admin import upsert_docs

        kc = tuple(c.strip() for c in args.key_cols.split(",") if c.strip())
        print(json.dumps(upsert_docs(
            spark, args.index, spark.read.parquet(args.corpus),
            key_cols=kc)))
    elif args.cmd == "delete":
        from deluge_spark.plans.admin import delete_docs

        try:
            ids = ([int(x.strip()) for x in args.ids.split(",")
                    if x.strip()]
                   if args.ids else None)
        except ValueError:
            raise SystemExit(
                f"--ids expects comma-separated integers, got {args.ids!r}")
        print(json.dumps(delete_docs(spark, args.index,
                                     where=args.where, doc_ids=ids)))
    elif args.cmd == "purge":
        from deluge_spark.plans.admin import purge_deleted

        print(json.dumps(purge_deleted(spark, args.index)))
    elif args.cmd == "source-summary":
        from deluge_spark.plans.admin import summarize_source

        print(json.dumps(summarize_source(
            spark.read.parquet(args.corpus), args.text_col)))
    elif args.cmd == "ingest":
        from pyspark.sql import functions as F

        from deluge_spark.index.build import BuildConfig, build_index
        from deluge_spark.operators.threshold import check_corrupt_ratio
        from deluge_spark.sources.readers import (
            read_delimited,
            read_json_lines,
            read_lines,
        )

        excludes = args.exclude or None
        gate = None
        if args.format == "jsonl":
            df = read_json_lines(spark, args.input, schema=args.schema,
                                 excludes=excludes)
            if args.schema:
                gate = check_corrupt_ratio(
                    df, F.col("_corrupt").isNotNull(),
                    args.error_threshold, sample_col="_corrupt")
                df = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
        elif args.format in ("csv", "tsv"):
            df = read_delimited(
                spark, args.input,
                sep="," if args.format == "csv" else "\t",
                schema=args.schema, header=args.header, excludes=excludes)
        else:  # lines: whole file of text, one doc per line
            if args.codec:
                from deluge_spark.sources.readers import (
                    read_raw_compressed_lines,
                )
                df = read_raw_compressed_lines(
                    spark, args.input, args.codec, excludes=excludes)
            else:
                df = read_lines(spark, args.input, excludes=excludes)
            df = df.withColumnRenamed("line", "content")
        if args.content_col != "content" and args.content_col in df.columns:
            if "content" in df.columns:
                # a pre-existing content column would otherwise survive the
                # rename and leave TWO content columns (ambiguous-column
                # failure deep in the build) — the named column wins
                df = df.drop("content")
            df = df.withColumnRenamed(args.content_col, "content")
        if "content" not in df.columns:
            raise SystemExit(
                f"no content column after parse (--content-col "
                f"{args.content_col}; parsed columns: {df.columns})")
        df = df.filter(F.col("content").isNotNull())
        # raw inputs rarely carry the (repo, path, commit) natural key the
        # build's id assignment defaults to — key on what exists
        if "doc_id" not in df.columns:
            from deluge_spark.operators.doc_ids import (
                NATURAL_KEY,
                assign_doc_ids,
            )
            key = (tuple(args.key_cols.split(",")) if args.key_cols
                   else tuple(c for c in NATURAL_KEY if c in df.columns)
                   or tuple(df.columns))
            df = assign_doc_ids(df, key_cols=key)
        metrics = build_index(spark, df, args.out, BuildConfig(
            num_shards=args.shards, tokenizer_mode=args.tokenizer,
            overwrite_stale=args.overwrite))
        if gate is not None:
            metrics["gate"] = gate
        print(json.dumps(metrics))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
