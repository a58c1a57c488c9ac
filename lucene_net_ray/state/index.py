"""Index-level manifest and point-in-time reader metadata.

The manifest is the analog of Lucene's ``segments_N``
(/root/reference/src/Lucene.Net.Core/Index/SegmentInfos.cs:261): an atomically
renamed JSON file listing committed segments plus collection-level stats.
Search opens a point-in-time view from it (DirectoryReader.Open analog).

Collection statistics for scoring are INDEX-GLOBAL (SURVEY.md §3.3 step 2):
``max_doc`` and ``sum_ttf`` come from the manifest; per-term global df/ttf are
summed across segments at query time (cheap: one term-dict lookup per
segment), mirroring TermContext walking every leaf
(/root/reference/src/Lucene.Net.Core/Index/TermContext.cs).
"""

from __future__ import annotations

import json
import os


def write_index_manifest(out_dir: str, manifest: dict) -> None:
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))


class IndexMeta:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.max_doc: int = self.manifest["max_doc"]
        self.sum_ttf: int = self.manifest["sum_ttf"]

    @property
    def segment_dirs(self) -> list[str]:
        return [
            os.path.join(self.index_dir, "segments", f"seg{r['seg_id']:06d}")
            for r in self.manifest["segments"]
        ]

    @property
    def avgdl_inputs(self) -> tuple[int, int]:
        return self.sum_ttf, self.max_doc
