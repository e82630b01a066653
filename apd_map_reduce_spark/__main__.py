"""Drop-in CLI mirroring the reference binary's interface
(`./tema1 <M> <R> <manifest>`, `tema1a/src/main.cpp:179-186`):

    python -m apd_map_reduce_spark <M> <R> <manifest> [--out DIR]

M/R (mapper/reducer thread counts) map onto the Spark analogues: M+R
bounds local cores, R sets shuffle partitions (SURVEY.md §3.1 maps
mappers → scan/partial-agg stage, reducers → final-agg/sink stage).
Output: `<letter>.txt` files in --out (default ./output), same format
and ordering as the reference sink — a reference user can point their
checker's diff at it.

Second mode — run any registry query by name against a table dir:

    python -m apd_map_reduce_spark query <name> [--sf-dir D] [--limit N]
    python -m apd_map_reduce_spark query list
"""

from __future__ import annotations

import argparse
import sys


def query_main(argv: list[str]) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m apd_map_reduce_spark query",
        description="Run one registry query (or `list` to enumerate)",
    )
    parser.add_argument("name", help="query name from the registry, or 'list'")
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    parser.add_argument("--limit", type=int, default=20, help="rows to show")
    args = parser.parse_args(argv)

    from apd_map_reduce_spark.registry import QUERY_INDEX

    if args.name == "list":
        for name, q in QUERY_INDEX.items():
            print(f"{name}\t{'oracle' if q.oracle else 'rows-only'}")
        return 0
    if args.name not in QUERY_INDEX:
        print(f"unknown query {args.name!r}; try 'list'", file=sys.stderr)
        return 2

    from apd_map_reduce_spark.session import get_spark

    spark = get_spark(app_name=f"apd-query-{args.name}")
    spark.sparkContext.setLogLevel("ERROR")
    QUERY_INDEX[args.name].fn(spark, args.sf_dir).show(args.limit, truncate=False)
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "query":
        return query_main(argv[1:])
    parser = argparse.ArgumentParser(
        prog="python -m apd_map_reduce_spark",
        description="Inverted-index pipeline, reference-compatible CLI",
    )
    parser.add_argument("mappers", type=int, help="mapper parallelism (M)")
    parser.add_argument("reducers", type=int, help="reducer parallelism (R)")
    parser.add_argument("manifest", help="manifest file: first line N, then N paths")
    parser.add_argument("--out", default="output", help="output dir for <letter>.txt files")
    args = parser.parse_args(argv)
    if args.mappers < 1 or args.reducers < 1:
        parser.error("M and R must be >= 1")

    from apd_map_reduce_spark.operators.invindex import ranked_index, write_letter_files
    from apd_map_reduce_spark.session import get_spark
    from apd_map_reduce_spark.sources.manifest import read_corpus, read_manifest

    import time

    spark = get_spark(
        app_name="apd-invindex-cli",
        master=f"local[{args.mappers + args.reducers}]",
        shuffle_partitions=max(args.reducers, 1),
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    manifest = read_manifest(spark, args.manifest)
    corpus = read_corpus(spark, manifest)
    write_letter_files(ranked_index(corpus), args.out)
    # pipeline-only time (excl. JVM/session startup) — the reference's
    # `time -p` includes startup, but its startup is milliseconds; ours
    # is ~14 s of JVM, so the checker reports both (SURVEY.md §6.3).
    print(f"pipeline_s: {time.time() - t0:.2f}")
    print(f"wrote 26 letter files to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
