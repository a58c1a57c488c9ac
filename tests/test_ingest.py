"""Corpus ingestion: jsonl/csv/text/textfiles -> canonical parquet corpus
(sources/ingest.py), including an ingest -> build -> search round trip."""

import json
import os

import pyarrow.parquet as pq
import pytest

from lucene_net_ray.sources.ingest import ingest_corpus, read_corpus


def _parquet_files(d):
    return [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")]


def test_ingest_jsonl_roundtrip_and_row_group_bounds(tmp_path):
    src = tmp_path / "a.jsonl"
    with open(src, "w") as f:
        for i in range(250):
            f.write(json.dumps({"doc_id": i, "content": f"hello world doc {i}", "lang": "en"}) + "\n")
    out = ingest_corpus(str(src), str(tmp_path / "corpus"), rows_per_file=100)
    files = _parquet_files(out)
    total = 0
    for p in files:
        md = pq.ParquetFile(p).metadata
        total += md.num_rows
        assert md.num_rows <= 100  # shard-plannable: bounded rows per file
        for rg in range(md.num_row_groups):
            assert md.row_group(rg).num_rows <= 100
    assert total == 250
    cols = set(pq.read_table(files[0]).column_names)
    assert {"doc_id", "content", "lang"} <= cols


def test_ingest_csv(tmp_path):
    src = tmp_path / "b.csv"
    with open(src, "w") as f:
        f.write("doc_id,content\n")
        for i in range(50):
            f.write(f'{i},"row {i} text here"\n')
    out = ingest_corpus(str(src), str(tmp_path / "corpus"), format="csv")
    t = pq.read_table(_parquet_files(out)[0] if len(_parquet_files(out)) == 1 else out)
    assert t.num_rows == 50
    assert "content" in t.column_names


def test_ingest_text_lines_renames_to_content_column(tmp_path):
    src = tmp_path / "c.txt"
    with open(src, "w") as f:
        for i in range(40):
            f.write(f"line document {i}\n")
    out = ingest_corpus(str(src), str(tmp_path / "corpus"), format="text",
                        content_column="body")
    import ray.data

    t = ray.data.read_parquet(out)
    assert t.count() == 40
    assert t.schema().names == ["body"]


def test_ingest_textfiles_one_doc_per_file_with_provenance(tmp_path):
    docs = tmp_path / "docs"
    os.makedirs(docs)
    for i in range(5):
        with open(docs / f"d{i}.txt", "w") as f:
            f.write(f"file doc {i} contents\nsecond line")
    out = ingest_corpus(str(docs), str(tmp_path / "corpus"), format="textfiles")
    import ray.data

    rows = ray.data.read_parquet(out).take_all()
    assert len(rows) == 5
    assert all("source_file" in r and r["content"].startswith("file doc") for r in rows)
    assert all("second line" in r["content"] for r in rows)


def test_read_corpus_missing_content_column_raises(tmp_path):
    src = tmp_path / "d.jsonl"
    with open(src, "w") as f:
        f.write(json.dumps({"doc_id": 1, "body": "x"}) + "\n")
    with pytest.raises(Exception, match="no 'content' column"):
        read_corpus(str(src), format="jsonl").materialize()


def test_ingest_then_build_then_search(tmp_path):
    src = tmp_path / "e.jsonl"
    with open(src, "w") as f:
        for i in range(120):
            tok = "needle" if i % 3 == 0 else "hay"
            f.write(json.dumps({"content": f"{tok} document number {i}"}) + "\n")
    corpus = ingest_corpus(str(src), str(tmp_path / "corpus"), rows_per_file=50)

    from lucene_net_ray.pipelines.build import build_index
    from lucene_net_ray.pipelines.search import Searcher
    from lucene_net_ray.query import parse_query

    meta = build_index(corpus, str(tmp_path / "idx"), target_rows_per_segment=50)
    assert meta.max_doc == 120
    s = Searcher(meta, use_actors=False)
    hits = s.search(parse_query("needle"), k=100)
    assert len(hits) == 40  # every third doc
