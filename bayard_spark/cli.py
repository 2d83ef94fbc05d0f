"""spark-submit entry points.

    spark-submit --py-files bayard_spark.zip -m ... # or simply:
    python -m bayard_spark.cli synth  --n 100000 --out /data/webtext
    python -m bayard_spark.cli build  --source /data/webtext --index /data/idx
    python -m bayard_spark.cli search --index /data/idx --query '{"kind":...}'
    python -m bayard_spark.cli put    --index /data/idx --source /data/new
    python -m bayard_spark.cli delete --index /data/idx --urls u1 u2
    python -m bayard_spark.cli merge  --index /data/idx

Mirrors the reference's API surface (create/put/delete/commit/rollback/
search — SURVEY §2.1) as batch jobs instead of a REST server. `put` and
`delete` stage + commit in one invocation; use --no-commit to stage only.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def make_spark(app: str) -> SparkSession:
    return (
        SparkSession.builder.appName(f"bayard-{app}")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def cmd_synth(args) -> int:
    from bayard_spark.sources.webtext import webtext_df

    spark = make_spark("synth")
    webtext_df(spark, args.n, seed=args.seed).write.mode("overwrite").parquet(
        args.out
    )
    print(json.dumps({"written": args.n, "path": args.out}))
    return 0


def _load_meta(args):
    from bayard_spark.schema import IndexMeta, webtext_index_meta

    if args.meta:
        with open(args.meta) as f:
            return IndexMeta.from_json(f.read())
    return webtext_index_meta()


def cmd_build(args) -> int:
    from bayard_spark.build.indexer import IndexBuilder

    spark = make_spark("build")
    src = spark.read.parquet(args.source)
    builder = IndexBuilder(spark, _load_meta(args), args.index)
    report = builder.build(src, resume=not args.no_resume)
    print(
        json.dumps(
            {
                "n_docs": report.n_docs,
                "stages_run": report.stages_run,
                "stages_skipped": report.stages_skipped,
                "wall_s": round(report.wall_s, 2),
            }
        )
    )
    return 0


def cmd_search(args) -> int:
    from bayard_spark.query import SearchEngine

    spark = make_spark("search")
    engine = SearchEngine(spark, args.index)
    request = json.loads(args.query) if args.query else json.load(sys.stdin)
    if "query" not in request:
        request = {"query": request}
    request.setdefault("hits", args.hits)
    resp = engine.search(request)
    print(
        json.dumps(
            {"total_hits": resp.total_hits, "documents": resp.documents},
            default=str,
        )
    )
    return 0


def cmd_put(args) -> int:
    from bayard_spark.build.indexer import IndexBuilder
    from bayard_spark.build.segments import SegmentWriter

    spark = make_spark("put")
    builder = IndexBuilder(spark, _load_meta(args), args.index)
    writer = SegmentWriter(spark, builder)
    seg = writer.put_documents(spark.read.parquet(args.source))
    state = None if args.no_commit else writer.commit()
    print(json.dumps({"segment": seg, "committed": state is not None}))
    return 0


def cmd_delete(args) -> int:
    from bayard_spark.build.indexer import IndexBuilder
    from bayard_spark.build.segments import SegmentWriter

    spark = make_spark("delete")
    builder = IndexBuilder(spark, _load_meta(args), args.index)
    writer = SegmentWriter(spark, builder)
    seg = writer.delete_documents(args.urls)
    state = None if args.no_commit else writer.commit()
    print(json.dumps({"segment": seg, "committed": state is not None}))
    return 0


def cmd_merge(args) -> int:
    from bayard_spark.build.indexer import IndexBuilder
    from bayard_spark.build.segments import merge_segments

    spark = make_spark("merge")
    builder = IndexBuilder(spark, _load_meta(args), args.index)
    print(json.dumps(merge_segments(spark, builder)))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="bayard_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("synth", help="synthesize deterministic webtext")
    s.add_argument("--n", type=int, required=True)
    s.add_argument("--seed", type=int, default=42)
    s.add_argument("--out", required=True)
    s.set_defaults(fn=cmd_synth)

    b = sub.add_parser("build", help="bulk-build an index")
    b.add_argument("--source", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--meta", help="IndexMeta JSON file")
    b.add_argument("--no-resume", action="store_true")
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("search", help="run a JSON DSL query")
    q.add_argument("--index", required=True)
    q.add_argument("--query", help="request JSON (or stdin)")
    q.add_argument("--hits", type=int, default=10)
    q.set_defaults(fn=cmd_search)

    u = sub.add_parser("put", help="upsert documents (stage + commit)")
    u.add_argument("--source", required=True)
    u.add_argument("--index", required=True)
    u.add_argument("--meta")
    u.add_argument("--no-commit", action="store_true")
    u.set_defaults(fn=cmd_put)

    d = sub.add_parser("delete", help="delete documents by url")
    d.add_argument("--index", required=True)
    d.add_argument("--urls", nargs="+", required=True)
    d.add_argument("--meta")
    d.add_argument("--no-commit", action="store_true")
    d.set_defaults(fn=cmd_delete)

    m = sub.add_parser("merge", help="compact segments, apply tombstones")
    m.add_argument("--index", required=True)
    m.add_argument("--meta")
    m.set_defaults(fn=cmd_merge)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
