"""Local mimic of the driver's correctness gate: run every queries() entry
at a given sf dir, run the matching oracle_sql() in DuckDB over the same
parquet, compare row count + column names + order-insensitive values.

Usage: python tools/check_contract.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb
import pandas as pd

import __spark_entry__ as entry_mod
from entity_extractor_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None else str(v))
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def compare(name: str, spark_df, sql: str | None, con) -> tuple[bool, str]:
    t0 = time.time()
    sp = spark_df.toPandas()
    t1 = time.time()
    if sql is None:
        return True, f"rows-only: {len(sp)} rows in {t1-t0:.1f}s"
    du = con.execute(sql).fetchdf()
    if len(sp) != len(du):
        return False, f"ROWCOUNT spark={len(sp)} duck={len(du)}"
    if sorted(sp.columns) != sorted(du.columns):
        return False, f"SCHEMA spark={sorted(sp.columns)} duck={sorted(du.columns)}"
    a, b = canon(sp), canon(du)
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9)
    except AssertionError as e:
        diff = str(e).split("\n")[0]
        # show first mismatching rows
        mask = ~(a.fillna("<N>").astype(str) == b.fillna("<N>").astype(str)).all(axis=1)
        sample = ""
        if mask.any():
            i = mask.idxmax()
            sample = f" row{i}: spark={a.loc[i].tolist()} duck={b.loc[i].tolist()}"
        return False, f"VALUES {diff}{sample}"
    return True, f"{len(sp)} rows in {t1-t0:.1f}s"


def _raise_map_count(floor: int = 262144) -> None:
    """Best-effort bump of vm.max_map_count. The kernel default (65530)
    is low enough that ONE allocation-churny DuckDB oracle (the unrolled
    fixed-point log2 chains in rag_hybrid_topk / rag_bm25_eval) can pin
    the process at the ceiling — after which unrelated 4 KB allocations
    and even pthread_create fail, surfacing as bogus tiny
    OutOfMemoryException / "can't start new thread" errors. Root-only;
    silently skipped when not permitted."""
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            cur = int(f.read().strip())
        if cur < floor:
            with open("/proc/sys/vm/max_map_count", "w") as f:
                f.write(str(floor))
    except Exception:
        pass


def main():
    _raise_map_count()
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a]

    spark = get_spark("contract_check")

    def fresh_con():
        c = duckdb.connect()
        # bound worker threads: the sweep shares one process with a 32-way
        # JVM; unbounded duckdb threads + JIT/codegen maps can exhaust
        # vm.max_map_count late in a 200+-query run (thread stacks are
        # mmaps too), surfacing as bogus 32KB "Out of Memory" allocations
        c.execute("SET threads=8")
        for t in TABLES:
            c.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")
        return c

    con = fresh_con()
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    fails = []
    ran = 0
    for name, fn in qs.items():
        if names and name not in names:
            continue
        ran += 1
        if ran % 40 == 0:
            # recycle the connection so buffer-pool/allocator state from
            # earlier oracles cannot accumulate across the whole sweep
            con.close()
            con = fresh_con()
        try:
            ok, msg = compare(name, fn(spark, sf_dir), sqls.get(name), con)
        except Exception as e:
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {str(e)[:300]}"
        print(f"{'PASS' if ok else 'FAIL'}  {name}: {msg}")
        if not ok:
            fails.append(name)
    unknown = sorted(set(names) - set(qs))
    if unknown:  # a typo'd name must not read as a green check
        print(f"ERROR: no contract query named {unknown}")
        sys.exit(2)
    print(f"\n{ran - len(fails)}/{ran} pass" + (f"; FAILURES: {fails}" if fails else ""))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
