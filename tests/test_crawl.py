"""T3 — paginated folder crawl resume: a killed crawl resumes at the lost
page; a re-crawl after new files arrive processes only the new files; the
resumed total equals a fresh full crawl (reference
folder_reader_service.py:110-162 next_page_link loop)."""

from __future__ import annotations

import os

import pytest

from entity_extractor_spark.sources.crawl import CrawlState, crawl_folder, list_pages


def _write_files(spark, root: str, ids: range) -> None:
    for i in ids:
        df = spark.createDataFrame([(f"d{i:03d}", f"text {i}")], "doc_id string, text string")
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(root, f"f{i:03d}.parquet"))


def test_crawl_pages_then_resume_after_crash(spark, tmp_path):
    root, state_dir, out = str(tmp_path / "in"), str(tmp_path / "state"), tmp_path / "out"
    _write_files(spark, root, range(9))
    out.mkdir()

    seen: list[str] = []

    def process(df, page):
        rows = sorted(r["doc_id"] for r in df.select("doc_id").collect())
        seen.extend(rows)
        (out / f"page{page.index:04d}.txt").write_text("\n".join(rows))

    class Boom(RuntimeError):
        pass

    calls = {"n": 0}

    def crashing(df, page):
        if calls["n"] == 2:
            raise Boom()
        calls["n"] += 1
        process(df, page)

    # 9 files, page_size 3 => 3 pages; crash before the third commits
    with pytest.raises(Boom):
        crawl_folder(spark, root, state_dir, crashing, page_size=3)
    assert CrawlState(state_dir).files_crawled() == 6
    assert sorted(seen) == [f"d{i:03d}" for i in range(6)]

    # resume: only the lost page is crawled
    n = crawl_folder(spark, root, state_dir, process, page_size=3)
    assert n == 3
    assert sorted(seen) == [f"d{i:03d}" for i in range(9)]
    assert CrawlState(state_dir).files_crawled() == 9

    # fully-resumed second run is a no-op
    assert crawl_folder(spark, root, state_dir, process, page_size=3) == 0


def test_incremental_crawl_picks_up_only_new_files(spark, tmp_path):
    root, state_dir = str(tmp_path / "in"), str(tmp_path / "state")
    _write_files(spark, root, range(4))
    got: list[str] = []

    def process(df, page):
        got.extend(r["doc_id"] for r in df.select("doc_id").collect())

    assert crawl_folder(spark, root, state_dir, process, page_size=10) == 4

    _write_files(spark, root, range(4, 6))
    assert crawl_folder(spark, root, state_dir, process, page_size=10) == 2
    assert sorted(got) == [f"d{i:03d}" for i in range(6)]


def test_modified_file_is_recrawled(spark, tmp_path):
    root, state_dir = str(tmp_path / "in"), str(tmp_path / "state")
    _write_files(spark, root, range(2))
    counts: list[int] = []

    def process(df, page):
        counts.append(len(page.files))

    crawl_folder(spark, root, state_dir, process, page_size=10)
    # rewrite f000 with new content -> new (mtime,size) identity -> re-crawled
    df = spark.createDataFrame([("d000", "changed twice over")], "doc_id string, text string")
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(root, "f000.parquet"))
    n = crawl_folder(spark, root, state_dir, process, page_size=10)
    assert n >= 1  # at least the rewritten file


def test_pagination_is_deterministic(tmp_path):
    root = str(tmp_path / "in")
    os.makedirs(root)
    for i in range(7):
        with open(os.path.join(root, f"x{i}.parquet"), "w") as f:
            f.write("stub")
    state = CrawlState(str(tmp_path / "state"))
    pages = list(list_pages(root, state, page_size=3))
    assert [p.index for p in pages] == [0, 1, 2]
    assert [len(p.files) for p in pages] == [3, 3, 1]
    flat = [os.path.basename(f) for p in pages for f in p.files]
    assert flat == sorted(flat)


def test_resume_pages_never_reuse_committed_indices(spark, tmp_path):
    """Page numbering continues across restarts, so page-keyed output dirs
    from before the crash are never overwritten by the resumed run."""
    root, state_dir = str(tmp_path / "in"), str(tmp_path / "state")
    _write_files(spark, root, range(9))
    indices: list[int] = []

    def fail_third(df, page):
        if len(indices) == 2:
            raise RuntimeError("boom")
        indices.append(page.index)

    with pytest.raises(RuntimeError):
        crawl_folder(spark, root, state_dir, fail_third, page_size=3)
    assert indices == [0, 1]
    crawl_folder(spark, root, state_dir, lambda df, p: indices.append(p.index), page_size=3)
    assert indices == [0, 1, 2]  # resumed page gets a FRESH index
    # incremental crawl after new files also keeps advancing
    _write_files(spark, root, range(9, 12))
    crawl_folder(spark, root, state_dir, lambda df, p: indices.append(p.index), page_size=3)
    assert indices == [0, 1, 2, 3]


def test_files_crawled_counts_files_not_identities(tmp_path):
    """The running count (reference: folder_upload running count) is
    distinct FILES: a file modified in place re-crawls under a new
    (relpath|mtime|size) identity but does not inflate the count."""
    from entity_extractor_spark.sources.crawl import CrawlPage

    state = CrawlState(str(tmp_path / "state"))
    state.commit_page(CrawlPage(0, ["/in/a", "/in/b"], ["a|1|10", "b|1|10"]))
    assert state.files_crawled() == 2
    # 'a' modified: new identity, same file
    state.commit_page(CrawlPage(1, ["/in/a"], ["a|2|11"]))
    assert state.files_crawled() == 2
    state.commit_page(CrawlPage(2, ["/in/c"], ["c|1|5"]))
    assert state.files_crawled() == 3


def test_segmented_state_compacts_and_stays_equivalent(spark, tmp_path):
    """commit_page appends O(page)-sized segment files (never rewrites the
    full done list); compaction folds them into the baseline atomically
    and the cursor's view is identical before and after."""
    root, state_dir = str(tmp_path / "in"), str(tmp_path / "state")
    _write_files(spark, root, range(10))
    state = CrawlState(state_dir, compact_every=3)
    pages = list(list_pages(root, state, page_size=2))
    assert len(pages) == 5
    for i, page in enumerate(pages[:2]):
        state.commit_page(page)
    segs = [f for f in os.listdir(state_dir) if f.startswith("_crawl_seg_")]
    assert len(segs) == 2  # append-only, no baseline yet
    assert not os.path.exists(os.path.join(state_dir, "_crawl_state.json"))
    before = state.done_identities()
    state.commit_page(pages[2])  # hits compact_every=3
    segs = [f for f in os.listdir(state_dir) if f.startswith("_crawl_seg_")]
    assert segs == []  # folded into the baseline
    assert os.path.exists(os.path.join(state_dir, "_crawl_state.json"))
    after = state.done_identities()
    assert before < after and len(after) == 6
    assert state.pages_committed() == 3
    assert state.files_crawled() == 6
    # remaining pages resume exactly where the cursor says
    rest = list(list_pages(root, state, page_size=2))
    assert [p.index for p in rest] == [3, 4]


def test_legacy_single_file_state_resumes(spark, tmp_path):
    """A cursor written by the old rewrite-everything format resumes
    unchanged under the segmented reader."""
    import json

    root, state_dir = str(tmp_path / "in"), str(tmp_path / "state")
    _write_files(spark, root, range(4))
    state = CrawlState(state_dir)
    all_pages = list(list_pages(root, state, page_size=2))
    legacy = {
        "done": sorted(all_pages[0].identities),
        "files_crawled": 2,
        "pages_committed": 1,
    }
    os.makedirs(state_dir, exist_ok=True)
    with open(os.path.join(state_dir, "_crawl_state.json"), "w") as f:
        json.dump(legacy, f)
    state = CrawlState(state_dir)
    assert state.done_identities() == set(all_pages[0].identities)
    assert state.pages_committed() == 1
    rest = list(list_pages(root, state, page_size=2))
    assert [p.index for p in rest] == [1]
    state.commit_page(rest[0])
    assert state.files_crawled() == 4
