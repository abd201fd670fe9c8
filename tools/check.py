#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [only_query...]

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB against the
parquet tables in <sfDir>, and compares to the Spark result parquet at
<verifyOutDir>/<name>/*.parquet.  Mimics the driver: columns sorted by
name, values compared row-by-row (after normalizing dtypes).

Options (before positionals): --max-spill-gb=N (or env CHECK_MAX_SPILL_GB)
caps DuckDB's temp-directory spill; an oracle replay that would exceed it
raises OutOfMemoryException naming max_temp_directory_size and is recorded
as `SKIP name: oracle_spill_budget_exceeded(NGB)` — the exclusion becomes
machine-decided instead of ENOSPC-then-hand-curated (r16 verdict #7).

Exit codes: 0 = comparator ran, all compared keys pass; 3 = comparator ran,
>=1 key FAILed. Anything else (1 = uncaught exception, OOM-kill codes, ...)
means the comparator CRASHED and its stdout must not be read as a clean
column (r16 ADVICE).
"""
import sys, os, json, glob, math
import atexit, shutil
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            # compare at µs granularity (Spark writes µs)
            s = pd.to_datetime(s).dt.floor("us")
        elif pd.api.types.is_float_dtype(s):
            s = s.round(9)
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("Int64")
        elif s.dtype == object:
            # The REAL driver comparator crashes on array-valued cells
            # (round-1 fn_regex/fn_array_setops FAIL: pandas factorize on
            # numpy arrays). Mirror that: any array cell is a hard error
            # so the local gate can't green-light what the driver rejects.
            if s.map(lambda v: hasattr(v, "tolist") or isinstance(v, (list, tuple))).any():
                raise TypeError(f"array-valued cells in column {c!r} — "
                                "driver comparator cannot hash these; "
                                "stringify (array_join) in the query")
        out[c] = s
    return pd.DataFrame(out)

def main():
    argv = sys.argv[1:]
    max_spill_gb = os.environ.get("CHECK_MAX_SPILL_GB")
    while argv and argv[0].startswith("--"):
        opt = argv.pop(0)
        if opt.startswith("--max-spill-gb="):
            max_spill_gb = opt.split("=", 1)[1]
        else:
            sys.exit(f"check: unknown option {opt}")
    sfdir, outdir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    # Bounded + spillable: the sweep runs this next to a fat Spark JVM;
    # DuckDB's default limit (80% of RAM) ignores that neighbor, and a
    # heavy oracle (the sf1 IVF-PQ replay hit >100 GB when its CTEs
    # were still inlined) must degrade to disk, not take the box down.
    con.execute("SET memory_limit='32GB'")
    # UNIQUE temp dir per invocation: DuckDB names its spill files
    # sequentially (duckdb_temp_storage-N.tmp), so two concurrent
    # check.py runs sharing one temp_directory delete each other's
    # files and die with an IOException mid-oracle (r16 incident)
    import tempfile
    spill_dir = tempfile.mkdtemp(prefix="duckdb_spill_")
    # DuckDB cleans its tmp FILES but not the dir — without this, repeated
    # runs accumulate duckdb_spill_* dirs in /tmp (r16 ADVICE)
    atexit.register(shutil.rmtree, spill_dir, ignore_errors=True)
    con.execute(f"SET temp_directory='{spill_dir}'")
    if max_spill_gb:
        con.execute(f"SET max_temp_directory_size='{int(max_spill_gb)}GB'")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (e.g. the sf1 fixture): glob the parts
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    results = sorted(oracle.items())
    for name, sql in results:
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet"); n_fail += 1; continue
        try:
            exp = norm(con.execute(sql).df())
        except duckdb.OutOfMemoryException as e:
            # the machine-decided spill exclusion: the replay priced
            # itself over the declared budget; the dir was NOT filled
            if max_spill_gb and "max_temp_directory_size" in str(e):
                print(f"SKIP {name}: oracle_spill_budget_exceeded"
                      f"({int(max_spill_gb)}GB)")
                n_skip += 1; continue
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        act = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        if list(exp.columns) != list(act.columns):
            print(f"FAIL {name}: columns oracle={list(exp.columns)} spark={list(act.columns)}")
            n_fail += 1; continue
        if len(exp) != len(act):
            print(f"FAIL {name}: rows oracle={len(exp)} spark={len(act)}")
            n_fail += 1; continue
        bad = None
        dtype_drift = None
        for c in exp.columns:
            e, a = exp[c], act[c]
            # Driver parity: the driver hashes raw values, so an integer
            # Spark column against a float oracle column (e.g. DuckDB
            # SUM(BIGINT) -> HUGEINT -> float64 fetch) hash-mismatches
            # even when numerically equal.  Fail loudly on kind drift
            # instead of coercing it away (the r12 ts_changepoint escape).
            # Same for bool-vs-int and datetime-vs-anything-else: the
            # astype(str) compare below can render those equal while the
            # driver's raw hash would not.
            def kind(s):
                t = pd.api.types
                if t.is_float_dtype(s): return "float"
                if t.is_bool_dtype(s): return "bool"
                if t.is_datetime64_any_dtype(s): return "datetime"
                if t.is_integer_dtype(s): return "int"
                # Spark DATE parquet reads back as object(datetime.date)
                # while DuckDB DATE fetches as datetime64 — the driver's
                # comparator treats those as equal (7 date-output keys
                # are green in its gate), so kind them together.
                import datetime as _dt
                if s.map(lambda v: v is None or pd.isna(v)
                         or isinstance(v, (_dt.date, _dt.datetime))).all() \
                        and s.notna().any():
                    return "datetime"
                return "object"
            if kind(e) != kind(a):
                dtype_drift = (c, e.dtype, a.dtype); break
            if pd.api.types.is_float_dtype(e) or pd.api.types.is_float_dtype(a):
                ef = pd.to_numeric(e, errors="coerce").astype(float)
                af = pd.to_numeric(a, errors="coerce").astype(float)
                neq = ~((ef.isna() & af.isna()) | (abs(ef - af) <= 1e-9))
            else:
                neq = ~((e.isna() & a.isna()) | (e.astype(str) == a.astype(str)))
            if neq.any():
                i = int(neq.idxmax())
                bad = (c, i, e.iloc[i], a.iloc[i]); break
        if dtype_drift:
            c, ed, ad = dtype_drift
            print(f"FAIL {name}: col {c} dtype drift: oracle={ed} spark={ad} "
                  "(driver hashes raw — int vs float mismatches even when equal)")
            n_fail += 1
        elif bad:
            c, i, ev, av = bad
            print(f"FAIL {name}: col {c} row {i}: oracle={ev!r} spark={av!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)"); n_pass += 1
    # rows-only note for queries with no oracle
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracle:
            files = glob.glob(f"{d}/*.parquet")
            nr = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"NOTE {name}: TEST-only, rows={nr}")
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} skip ==")
    # 3 (not 1) on fails: rc 1 is what an uncaught exception exits with,
    # and a caller must be able to tell "ran, found fails" from "crashed"
    sys.exit(3 if n_fail else 0)

if __name__ == "__main__":
    main()
