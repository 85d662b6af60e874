#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script compares
each <outDir>/<name> parquet against the DuckDB oracle in oracle_sql.json.

Compare semantics (mirrors the driver): sort columns by name, sort rows,
hash values. Reports per-query match/mismatch with a diff preview.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    def fresh_con(threads=None):
        c = duckdb.connect()
        # the giant generated expressions (FloatVecLshBucket's 60x64-term
        # bucket) hold per-thread executor state in every inlined CTE
        # instance — at 32 threads that alone exhausts the memory limit
        # at sfx1 (diagnosed r14: q27 fails at 32 threads, runs in 16 s
        # at 8). OOM retries therefore rebuild with threads=8.
        if threads:
            c.execute(f"SET threads={threads}")
        # in-memory DuckDB disables spilling unless temp_directory is
        # set — without it the heavy sfx1 oracles (q27's banded LSH,
        # q31's IVF) die at the 100 GiB memory_limit with "bad
        # allocation" instead of spilling the way the r12 q153/q189
        # runs did
        c.execute("SET temp_directory='/tmp/duckdb_spill'")
        c.execute("SET max_temp_directory_size='70GiB'")
        for t in ["region","nation","customer","supplier","part","orders",
                  "lineitem","events","documents","embeddings"]:
            # driver testdata ships single files; synthetic dirs
            # (gen_sfx1) are Spark-written table.parquet/part-* dirs
            src = (f"{sf_dir}/{t}.parquet/*.parquet"
                   if os.path.isdir(f"{sf_dir}/{t}.parquet")
                   else f"{sf_dir}/{t}.parquet")
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
        return c
    con = fresh_con()
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = n_rowsonly = 0
    produced = {os.path.basename(d) for d in glob.glob(f"{out_dir}/q*")}
    # a query that threw inside Verify writes no output dir — that is a
    # failure, not a silent skip
    for missing in sorted(set(oracle) - produced):
        n_bad += 1
        print(f"✗ {missing}: NO OUTPUT (query failed in Verify)")
    for d in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(d)
        spark_df = duckdb.connect().execute(
            f"SELECT * FROM '{d}/*.parquet'").fetchdf()
        if name not in oracle:
            n_rowsonly += 1
            print(f"  {name}: rows-only ({len(spark_df)} rows)")
            continue
        def is_oom(exc):
            # OutOfMemoryException is definitive; FatalException also
            # covers non-memory fatal states (INTERNAL Error, assertion
            # failures), so for it — and for any other type — require a
            # memory-spelled message too, or a genuine oracle bug gets
            # logged as resource-bound and pointlessly retried (the exact
            # misadjudication class r12-r14 untangled)
            oom_t = getattr(duckdb, "OutOfMemoryException", None)
            if oom_t and isinstance(exc, oom_t):
                return True
            msg = str(exc)
            return any(m in msg for m in
                       ("Out of Memory", "bad allocation", "std::bad_alloc"))
        def rebuild_con(threads=None):
            # an OOM'd oracle poisons the connection's buffer pool
            # (observed r13: every later query — even 2 KB reads —
            # failed); rebuild it so one heavy oracle can't fail
            # the rest of the board. Release is asynchronous, so
            # drop every reference, collect, and retry with a pause.
            import gc, time
            gc.collect()
            for attempt in range(6):
                time.sleep(5 * (attempt + 1))
                try:
                    return fresh_con(threads)
                except Exception:
                    gc.collect()
            return None
        try:
            ora_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            ora_df = None
            if is_oom(e):
                print(f"! {name}: oracle OOM ({e}); rebuilding connection "
                      "at 8 threads and retrying once", flush=True)
                try: con.close()
                except Exception: pass
                # 8 threads: per-thread expression state was the OOM
                # mechanism for every case diagnosed so far; the rest of
                # the board keeps the low-thread connection (correctness
                # runs are not timed)
                con = rebuild_con(threads=8)
                if con is None:
                    n_bad += 1
                    print(f"✗ {name}: ORACLE SQL ERROR: {e}", flush=True)
                    print("!! could not rebuild the DuckDB connection "
                          "after OOM; aborting remaining checks",
                          flush=True)
                    break
                # retry the OOM'd oracle ONCE on the fresh connection
                # (ADVICE r13): a query that failed only because of a
                # predecessor's buffer-pool residue must not be recorded
                # as genuinely resource-bound
                try:
                    ora_df = con.execute(oracle[name]).fetchdf()
                except Exception as e2:
                    n_bad += 1
                    print(f"✗ {name}: ORACLE SQL ERROR (persists on a "
                          f"fresh connection): {e2}", flush=True)
                    if is_oom(e2):
                        try: con.close()
                        except Exception: pass
                        con = rebuild_con(threads=8)
                        if con is None:
                            print("!! could not rebuild the DuckDB "
                                  "connection after OOM; aborting "
                                  "remaining checks", flush=True)
                            break
                    continue
            else:
                n_bad += 1
                print(f"✗ {name}: ORACLE SQL ERROR: {e}", flush=True)
                continue
        a, b = canon(spark_df), canon(ora_df)
        # driver hashes VALUES: an int64 vs float64 divergence (e.g. a
        # DuckDB HUGEINT fetched as float) stringifies differently and
        # fails the hash even when numerically equal — flag it here too
        dt_bad = [c for c in a.columns if c in b.columns and
                  ({str(a[c].dtype), str(b[c].dtype)} == {"int64", "float64"})]
        if dt_bad:
            n_bad += 1
            print(f"✗ {name}: DTYPE int-vs-float {dt_bad} "
                  f"(HUGEINT in oracle? cast to BIGINT)")
            continue
        if list(a.columns) != list(b.columns):
            n_bad += 1
            print(f"✗ {name}: COLUMNS spark={list(a.columns)} oracle={list(b.columns)}")
            continue
        if len(a) != len(b):
            n_bad += 1
            print(f"✗ {name}: ROWS spark={len(a)} oracle={len(b)}")
            continue
        # value compare with exact equality (hash-match proxy)
        try:
            eq = a.equals(b)
            if not eq:
                # dtype-tolerant elementwise check
                diff_cols = []
                for c in a.columns:
                    av, bv = a[c], b[c]
                    if not (av.astype(object).where(pd.notna(av), None)
                            .equals(bv.astype(object).where(pd.notna(bv), None))):
                        diff_cols.append(c)
                if diff_cols:
                    n_bad += 1
                    print(f"✗ {name}: VALUES differ in {diff_cols}")
                    for c in diff_cols[:2]:
                        mask = ~(a[c].eq(b[c]) | (a[c].isna() & b[c].isna()))
                        idx = mask[mask].index[:3]
                        for i in idx:
                            print(f"    row {i} col {c}: spark={a[c][i]!r} oracle={b[c][i]!r}")
                    continue
            n_ok += 1
            print(f"✓ {name}: match ({len(a)} rows)")
        except Exception as e:
            n_bad += 1
            print(f"✗ {name}: COMPARE ERROR {e}")
    print(f"\n{n_ok} ok, {n_bad} bad, {n_rowsonly} rows-only")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
