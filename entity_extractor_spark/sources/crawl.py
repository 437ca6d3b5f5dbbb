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
    running count, models/folder_upload.py). One JSON file per crawl."""

    def __init__(self, state_dir: str):
        os.makedirs(state_dir, exist_ok=True)
        self.path = os.path.join(state_dir, "_crawl_state.json")

    def _read(self) -> dict:
        if not os.path.exists(self.path):
            return {"done": [], "files_crawled": 0, "pages_committed": 0}
        with open(self.path) as f:
            rec = json.load(f)
        rec.setdefault("pages_committed", 0)
        return rec

    def done_identities(self) -> set[str]:
        return set(self._read()["done"])

    def files_crawled(self) -> int:
        return int(self._read()["files_crawled"])

    def pages_committed(self) -> int:
        return int(self._read()["pages_committed"])

    def commit_page(self, page: CrawlPage) -> None:
        rec = self._read()
        rec["done"] = sorted(set(rec["done"]) | set(page.identities))
        # running count = distinct FILES ever crawled (identity is
        # relpath|mtime|size, so a modified file re-crawls under a new
        # identity but is still one file)
        rec["files_crawled"] = len({i.rsplit("|", 2)[0] for i in rec["done"]})
        rec["pages_committed"] = max(int(rec["pages_committed"]), page.index + 1)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f, indent=1)
        os.replace(tmp, self.path)


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
