"""CLI entry points, usable directly or via ``ray job submit``:

  ray job submit -- python -m lucene_net_ray.cli build \
      --input /data/corpus --out /data/index --positions
  ray job submit -- python -m lucene_net_ray.cli search \
      --index /data/index --query '+public +import' -k 10
  ray job submit -- python -m lucene_net_ray.cli merge \
      --index /data/index --out /data/index_merged
  ray job submit -- python -m lucene_net_ray.cli check --index /data/index

Ray is initialised here only when no cluster is already attached (the driver
contract in __ray_entry__ never goes through this module).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import ray


def _ensure_ray():
    if not ray.is_initialized():
        ray.init(address="auto" if _has_cluster() else "local", include_dashboard=False)


def _has_cluster() -> bool:
    import os

    return bool(os.environ.get("RAY_ADDRESS")) and os.environ.get("RAY_ADDRESS") != "local"


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="lucene_net_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    ing = sub.add_parser(
        "ingest", help="normalize a raw corpus (jsonl/csv/text) into parquet"
    )
    ing.add_argument("--input", required=True)
    ing.add_argument("--out", required=True)
    ing.add_argument(
        "--format", default="jsonl",
        choices=("jsonl", "csv", "text", "textfiles", "parquet"),
    )
    ing.add_argument("--content-column", default="content")
    ing.add_argument("--rows-per-file", type=int, default=100_000)

    b = sub.add_parser("build", help="build an inverted index from a parquet corpus")
    b.add_argument("--input", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--content-column", default="content")
    b.add_argument("--stored-columns", default="")
    b.add_argument("--rows-per-segment", type=int, default=100_000)
    b.add_argument("--positions", action="store_true")
    b.add_argument("--offsets", action="store_true", help="positions + stored char offsets (PostingsHighlighter)")
    b.add_argument("--analyzer", default="standard")

    s = sub.add_parser("search", help="run a query (classic/simple/xml syntax)")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--syntax",
                   choices=("classic", "simple", "xml", "flexible", "precedence"),
                   default="classic",
                   help="classic = Lucene QueryParser subset; simple = "
                        "SimpleQueryParser (never fails); xml = CoreParser "
                        "element tree; flexible = StandardQueryParser "
                        "(precedence flattened); precedence = "
                        "PrecedenceQueryParser (AND/OR tree kept)")
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--actors", type=int, default=4)
    s.add_argument("--merged", action="store_true",
                   help="serve a merged (term-range-partitioned) index; "
                        "--actors > 1 shards it across MergedRangeActors")

    m = sub.add_parser("merge", help="compact into a term-partitioned merged index")
    m.add_argument("--index", required=True)
    m.add_argument("--out", required=True)
    m.add_argument("--bucket-size", type=int, default=8)

    c = sub.add_parser("check", help="CheckIndex-style validation")
    c.add_argument("--index", required=True)

    h = sub.add_parser("highfreq", help="top-df terms (skew probe)")
    h.add_argument("--index", required=True)
    h.add_argument("-k", type=int, default=20)

    e = sub.add_parser("expunge", help="rewrite segments minus delete tombstones")
    e.add_argument("--index", required=True)
    e.add_argument("--out", required=True)

    t = sub.add_parser("compact", help="tiered segment compaction (TieredMergePolicy)")
    t.add_argument("--index", required=True)
    t.add_argument("--out", required=True)
    t.add_argument("--segs-per-tier", type=float, default=10.0)
    t.add_argument("--max-merge-at-once", type=int, default=10)

    d = sub.add_parser("delete", help="tombstone docs matching a query")
    d.add_argument("--index", required=True)
    d.add_argument("--query", required=True)

    ti = sub.add_parser(
        "term-info", help="global df/ttf for terms (Misc/GetTermInfo analog)"
    )
    ti.add_argument("--index", required=True)
    ti.add_argument("--terms", required=True, help="comma-separated terms")

    sp = sub.add_parser("spell", help="n-gram spell suggestions from the term dict")
    sp.add_argument("--index", required=True)
    sp.add_argument("--word", required=True)
    sp.add_argument("-k", type=int, default=5)
    sp.add_argument("--distance", choices=("levenstein", "jarowinkler", "ngram"),
                    default="levenstein")

    ts = sub.add_parser(
        "train-shards",
        help="clean -> chunk -> pack -> hash-sharded resumable write "
        "(the flagship training-data pipeline; re-run to resume)",
    )
    ts.add_argument("--input", required=True, help="parquet corpus dir/file")
    ts.add_argument("--out", required=True)
    ts.add_argument("--text-column", default="text")
    ts.add_argument("--id-column", default="doc_id")
    ts.add_argument("--chunk-tokens", type=int, default=256)
    ts.add_argument("--overlap-tokens", type=int, default=32)
    ts.add_argument("--pack-budget", type=int, default=2048)
    ts.add_argument("--num-shards", type=int, default=16)
    ts.add_argument("--min-quality", type=float, default=0.0)

    cs = sub.add_parser(
        "corpus-split",
        help="deterministic train/test/cv split labels (DatasetSplitter "
        "analog), written as split-partitioned parquet",
    )
    cs.add_argument("--input", required=True)
    cs.add_argument("--out", required=True)
    cs.add_argument("--text-column", default="text")
    cs.add_argument("--test-fraction", type=float, default=0.1)
    cs.add_argument("--cv-fraction", type=float, default=0.1)

    args = ap.parse_args(argv)
    _ensure_ray()
    try:
        if args.cmd == "ingest":
            from .sources.ingest import ingest_corpus

            out = ingest_corpus(
                args.input,
                args.out,
                format=args.format,
                content_column=args.content_column,
                rows_per_file=args.rows_per_file,
            )
            import ray.data as _rd

            print(json.dumps({"out": out, "rows": _rd.read_parquet(out).count()}))
        elif args.cmd == "build":
            from .pipelines.build import build_index

            meta = build_index(
                args.input,
                args.out,
                content_column=args.content_column,
                stored_columns=tuple(x for x in args.stored_columns.split(",") if x),
                analyzer_kind=args.analyzer,
                target_rows_per_segment=args.rows_per_segment,
                index_options="offsets" if args.offsets else ("positions" if args.positions else "freqs"),
            )
            print(json.dumps({"max_doc": meta.max_doc, "segments": len(meta.segment_dirs),
                              "sum_ttf": meta.sum_ttf, "out": args.out}))
        elif args.cmd == "search":
            from .query import parse_query, parse_simple

            if args.merged:
                if args.actors > 1:
                    from .pipelines.merge import ShardedMergedSearcher as _S

                    searcher = _S(args.index, num_actors=args.actors)
                else:
                    from .pipelines.merge import MergedSearcher as _S

                    searcher = _S(args.index)
            else:
                from .pipelines.search import Searcher

                searcher = Searcher(args.index, num_actors=args.actors, use_actors=True)
            if args.syntax == "simple":
                q = parse_simple(args.query)
                if q is None:
                    print(json.dumps([]))
                    return
            elif args.syntax == "xml":
                from .xmlparser import parse_xml_query

                q = parse_xml_query(args.query)
            elif args.syntax in ("flexible", "precedence"):
                from .flexible import PrecedenceQueryParser, StandardQueryParser

                parser_cls = (
                    StandardQueryParser if args.syntax == "flexible" else PrecedenceQueryParser
                )
                q = parser_cls().parse(args.query)
            else:
                q = parse_query(args.query)
            hits = searcher.search(q, k=args.k)
            print(json.dumps([{"doc_id": d, "score": s} for d, s in hits]))
        elif args.cmd == "merge":
            from .pipelines.merge import merge_index

            merge_index(args.index, args.out, bucket_size=args.bucket_size)
            print(json.dumps({"merged": args.out}))
        elif args.cmd == "check":
            import json as _json
            import os as _os

            with open(_os.path.join(args.index, "manifest.json")) as f:
                kind = _json.load(f).get("kind")
            if kind == "merged":
                from .state.checkindex import check_merged_index

                print(json.dumps(check_merged_index(args.index)))
            else:
                from .state.checkindex import check_index

                print(json.dumps(check_index(args.index)))
        elif args.cmd == "highfreq":
            from .pipelines.merge import high_freq_terms
            from .state.index import IndexMeta

            rows = high_freq_terms(IndexMeta(args.index), k=args.k).take_all()
            print(json.dumps(rows))
        elif args.cmd == "term-info":
            from .state.index import IndexMeta
            from .state.segment import SegmentReader

            meta = IndexMeta(args.index)
            out = []
            for term in args.terms.split(","):
                df = ttf = 0
                for d in meta.segment_dirs:
                    r = SegmentReader(d)
                    sdf, sttf = r.term_stats(term)[:2]
                    df += int(sdf)
                    ttf += int(sttf)
                out.append({"term": term, "df": df, "ttf": ttf})
            print(json.dumps(out))
        elif args.cmd == "spell":
            from .pipelines.search import Searcher
            from .pipelines.spell import SpellChecker

            searcher = Searcher(args.index, use_actors=False)
            sc = SpellChecker.from_searcher(searcher, distance=args.distance)
            print(json.dumps(
                [{"suggestion": w, "score": round(sc_, 6)}
                 for w, sc_ in sc.suggest_similar(args.word, args.k)]
            ))
        elif args.cmd == "train-shards":
            from .pipelines.training import prepare_training_shards

            manifest = prepare_training_shards(
                args.input,
                args.out,
                text_column=args.text_column,
                id_column=args.id_column,
                min_quality=args.min_quality,
                chunk_tokens=args.chunk_tokens,
                overlap_tokens=args.overlap_tokens,
                pack_budget=args.pack_budget,
                num_shards=args.num_shards,
            )
            print(json.dumps({k: manifest[k] for k in
                              ("rows_in", "rows_kept", "n_chunks", "n_sequences")
                              if k in manifest} | {"out": args.out}))
        elif args.cmd == "corpus-split":
            import ray.data as _rd

            from .stages.clean import dataset_split

            if os.path.isdir(args.out) and os.listdir(args.out):
                raise SystemExit(
                    f"--out {args.out} is non-empty; a re-run would mix old "
                    "and new files (write_parquet appends uniquely-named "
                    "files) — remove it or point at a fresh directory"
                )

            ds = dataset_split(
                _rd.read_parquet(args.input),
                test_fraction=args.test_fraction,
                cv_fraction=args.cv_fraction,
                text_column=args.text_column,
            )
            ds.write_parquet(args.out, partition_cols=["split"])
            print(json.dumps({"out": args.out, "rows": _rd.read_parquet(args.out).count()}))
        elif args.cmd == "expunge":
            from .pipelines.maintenance import expunge_deletes

            meta = expunge_deletes(args.index, args.out)
            print(json.dumps({"max_doc": meta.max_doc, "out": args.out}))
        elif args.cmd == "compact":
            from .pipelines.tiered import compact_segments

            meta = compact_segments(
                args.index,
                args.out,
                segs_per_tier=args.segs_per_tier,
                max_merge_at_once=args.max_merge_at_once,
            )
            print(json.dumps({"segments": len(meta.segment_dirs), "out": args.out}))
        elif args.cmd == "delete":
            from .query import parse_query
            from .state.deletes import delete_by_query

            n = delete_by_query(args.index, parse_query(args.query))
            print(json.dumps({"deleted": n}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
