"""lucene_net_ray — a Ray-Data-native full-text indexing and search engine.

Public API (lazy imports keep `import lucene_net_ray` light):

    from lucene_net_ray import build_index, Searcher, parse_query
    meta = build_index("/data/corpus", "/data/index")
    hits = Searcher(meta).search(parse_query("+public +query"), k=10)
"""

__all__ = [
    "build_index",
    "Searcher",
    "MultiFieldSearcher",
    "parse_query",
    "merge_index",
    "MergedSearcher",
    "expunge_deletes",
    "compact_segments",
    "add_documents",
    "update_documents",
    "check_index",
    "IndexMeta",
    "Analyzer",
]

_LAZY = {
    "build_index": ("lucene_net_ray.pipelines.build", "build_index"),
    "Searcher": ("lucene_net_ray.pipelines.search", "Searcher"),
    "MultiFieldSearcher": ("lucene_net_ray.pipelines.multifield", "MultiFieldSearcher"),
    "parse_query": ("lucene_net_ray.query", "parse_query"),
    "merge_index": ("lucene_net_ray.pipelines.merge", "merge_index"),
    "MergedSearcher": ("lucene_net_ray.pipelines.merge", "MergedSearcher"),
    "expunge_deletes": ("lucene_net_ray.pipelines.maintenance", "expunge_deletes"),
    "compact_segments": ("lucene_net_ray.pipelines.tiered", "compact_segments"),
    "add_documents": ("lucene_net_ray.pipelines.maintenance", "add_documents"),
    "update_documents": ("lucene_net_ray.pipelines.maintenance", "update_documents"),
    "check_index": ("lucene_net_ray.state.checkindex", "check_index"),
    "IndexMeta": ("lucene_net_ray.state.index", "IndexMeta"),
    "Analyzer": ("lucene_net_ray.functions.analysis", "Analyzer"),
}


def __getattr__(name):
    import importlib

    if name in _LAZY:
        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
