"""Command-line entry points — the spark-submit surface.

  python -m deluge_spark.cli build   --corpus <parquet> --out <index_dir>
  python -m deluge_spark.cli search  --index <index_dir> --query "..." [-k N]
  python -m deluge_spark.cli summary --index <index_dir>
  python -m deluge_spark.cli reindex --index <index_dir> --out <dir> --shards N
  python -m deluge_spark.cli compact --index <index_dir> [--files-per-shard N]
  python -m deluge_spark.cli source-summary --corpus <parquet>

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

    s = sub.add_parser("search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--filter", action="append", default=[],
                   help="col=value keyword filter, repeatable")
    s.add_argument("--fetch", action="store_true")

    m = sub.add_parser("summary")
    m.add_argument("--index", required=True)

    r = sub.add_parser("reindex")
    r.add_argument("--index", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--shards", type=int, default=8)

    c = sub.add_parser("compact")
    c.add_argument("--index", required=True)
    c.add_argument("--files-per-shard", type=int, default=1)

    ss = sub.add_parser("source-summary")
    ss.add_argument("--corpus", required=True)
    ss.add_argument("--text-col", default="content")

    args = ap.parse_args(argv)
    spark = _spark(args.cores, args.shuffle_partitions)

    if args.cmd == "build":
        from deluge_spark.index.build import BuildConfig, build_index

        corpus = spark.read.parquet(args.corpus)
        metrics = build_index(spark, corpus, args.out, BuildConfig(
            num_shards=args.shards, tokenizer_mode=args.tokenizer,
            tokenize_groups=args.groups))
        print(json.dumps(metrics))
    elif args.cmd == "search":
        from deluge_spark.index.search import Searcher

        filters = dict(f.split("=", 1) for f in args.filter) or None
        searcher = Searcher(spark, args.index)
        if args.fetch:
            rows = searcher.search(args.query, args.k, filters,
                                   fetch=True).collect()
            for row in rows:
                print(json.dumps(row.asDict()))
        else:
            for doc_id, score in searcher.search_local(args.query, args.k,
                                                       filters):
                print(json.dumps({"doc_id": doc_id, "score": score}))
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
    elif args.cmd == "source-summary":
        from deluge_spark.plans.admin import summarize_source

        print(json.dumps(summarize_source(
            spark.read.parquet(args.corpus), args.text_col)))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
