"""T3 — paginated folder crawl with mid-crawl resume.

Reference behavior (common/folder_reader_service.py:74-162): the crawler
walks a remote folder page by page, persisting `next_page_link` and a
running count after every page, so a killed crawl resumes at the exact page
it stopped at instead of re-listing (and re-queueing) the whole folder.

Spark-native re-expression: the "page link" becomes a deterministic cursor
over the sorted file listing. Files are identified by (relative path,
mtime, size) so a modified file is re-crawled as new work; pages are fixed-
size slices of the *undone* listing in path order. After each page's
processing commits, the page's file identities are appended to a JSON state
file with the same tmp+rename atomic pattern as LineageLog — a crash
between pages loses at most the in-flight page, and re-running it is
idempotent because the page's output commit is what marks it done.

Scale notes: the listing itself is driver-side (exactly as the reference's
Graph-API listing is), but only file *metadata* is held — content flows
through spark.read inside each page. At 10^12 documents the listing moves
to a metastore/Iceberg snapshot diff; the cursor contract (sorted identity
order, done-set difference, per-page commit) is unchanged.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CrawlPage:
    index: int
    files: list[str]  # absolute paths, sorted
    identities: list[str]  # "relpath|mtime_ns|size" per file


class CrawlState:
    """Persisted crawl cursor (reference: folder_upload.next_page_link +
    running count, models/folder_upload.py).

    Append-only design: each page commit writes ONE small segment file
    (`_crawl_seg_<page>.json`, atomic tmp+rename) holding just that page's
    identities — O(page_size) per commit, so a 10^6-file crawl does O(n)
    total state I/O instead of the O(n^2) a rewrite-the-whole-done-list
    design costs (the last commits of a big crawl would each re-serialize
    ~100 MB of JSON). Reads union the baseline `_crawl_state.json` (also
    the legacy single-file format — old cursors resume unchanged) with all
    segments; every `compact_every` segments the union is folded into a
    new baseline FIRST (atomic rename) and the covered segments deleted
    AFTER — a crash between the two leaves identities present in both,
    which the set union makes idempotent, never a loss window."""

    def __init__(self, state_dir: str, compact_every: int = 256):
        os.makedirs(state_dir, exist_ok=True)
        self.dir = state_dir
        self.path = os.path.join(state_dir, "_crawl_state.json")
        self.compact_every = compact_every

    def _segment_names(self) -> list[str]:
        return sorted(
            f
            for f in os.listdir(self.dir)
            if f.startswith("_crawl_seg_") and f.endswith(".json")
        )

    def _read(self) -> dict:
        if os.path.exists(self.path):
            with open(self.path) as f:
                rec = json.load(f)
            rec.setdefault("pages_committed", 0)
            done = set(rec["done"])
            pages = int(rec["pages_committed"])
        else:
            done, pages = set(), 0
        for name in self._segment_names():
            with open(os.path.join(self.dir, name)) as f:
                seg = json.load(f)
            done |= set(seg["identities"])
            pages = max(pages, int(seg["page"]) + 1)
        # running count = distinct FILES ever crawled (identity is
        # relpath|mtime|size, so a modified file re-crawls under a new
        # identity but is still one file)
        files = len({i.rsplit("|", 2)[0] for i in done})
        return {"done": done, "files_crawled": files, "pages_committed": pages}

    def done_identities(self) -> set[str]:
        return self._read()["done"]

    def files_crawled(self) -> int:
        return int(self._read()["files_crawled"])

    def pages_committed(self) -> int:
        return int(self._read()["pages_committed"])

    def commit_page(self, page: CrawlPage) -> None:
        name = f"_crawl_seg_{page.index:010d}.json"
        tmp = os.path.join(self.dir, name + ".tmp")
        with open(tmp, "w") as f:
            json.dump({"page": page.index, "identities": sorted(page.identities)}, f)
        os.replace(tmp, os.path.join(self.dir, name))
        if len(self._segment_names()) >= self.compact_every:
            self._compact()

    def _compact(self) -> None:
        segs = self._segment_names()  # snapshot BEFORE writing the baseline
        rec = self._read()
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "done": sorted(rec["done"]),
                    "files_crawled": rec["files_crawled"],
                    "pages_committed": rec["pages_committed"],
                },
                f,
                indent=1,
            )
        os.replace(tmp, self.path)  # new baseline is visible atomically...
        for name in segs:  # ...only THEN drop the segments it covers
            os.remove(os.path.join(self.dir, name))


def _identity(root: str, path: str) -> str:
    st = os.stat(path)
    return f"{os.path.relpath(path, root)}|{st.st_mtime_ns}|{st.st_size}"


def list_pages(
    root: str, state: CrawlState, page_size: int = 100, suffix: str = ""
) -> Iterator[CrawlPage]:
    """Deterministic pagination over the not-yet-crawled listing. A re-crawl
    after new files appear yields only the new files (incremental); a
    re-crawl after a crash yields the pages the crash lost."""
    done = state.done_identities()
    # page numbering continues from the pages already committed, so a
    # resumed (or incremental) crawl never reuses an index — the
    # "overwrite a page-keyed dir" commit pattern in crawl_folder's
    # docstring stays safe across restarts
    base = state.pages_committed()
    pending: list[tuple[str, str]] = []
    for dirpath, _dirs, files in sorted(os.walk(root)):
        for fname in sorted(files):
            if fname.startswith(("_", ".")) or not fname.endswith(suffix):
                continue
            full = os.path.join(dirpath, fname)
            ident = _identity(root, full)
            if ident not in done:
                pending.append((full, ident))
    pending.sort()
    for i in range(0, len(pending), page_size):
        chunk = pending[i : i + page_size]
        yield CrawlPage(
            index=base + i // page_size,
            files=[p for p, _ in chunk],
            identities=[ident for _, ident in chunk],
        )


def crawl_folder(
    spark: SparkSession,
    root: str,
    state_dir: str,
    process: Callable[[DataFrame, CrawlPage], None],
    page_size: int = 100,
    suffix: str = ".parquet",
    reader: Callable[[SparkSession, list[str]], DataFrame] | None = None,
) -> int:
    """Crawl `root`, page by page, committing the cursor after each page's
    `process` returns (reference loop: folder_reader_service.py:110-162).
    Returns the number of files crawled THIS run. `process` must commit its
    own output idempotently (e.g. overwrite a page-keyed dir) — the state
    commit happens after, so a crash replays at most one page."""
    state = CrawlState(state_dir)
    read = reader or (lambda s, paths: s.read.parquet(*paths))
    n = 0
    for page in list_pages(root, state, page_size=page_size, suffix=suffix):
        process(read(spark, page.files), page)
        state.commit_page(page)
        n += len(page.files)
    return n
