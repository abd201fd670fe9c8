#!/usr/bin/env python3
"""Multi-SF correctness sweep (round-8 verdict item #3).

The driver's t2 gate hash-checks the inventory at sf0.01 only;
scale-dependent rounding/tie flukes (a double landing on a .5 boundary
at one corpus size, a rank tie appearing at another) would sail through
it. This target makes the three-scale sweep a one-command CI property:

    python3 tools/sweep.py [outJson]

runs `graft.Verify sf0.001,sf0.01,sf0.1 <tmp>` (one JVM, one session,
full inventory per scale), then the DuckDB compare per scale, and
writes ONE JSON summary (default SWEEP_r08.json) with per-SF pass/fail
per key, the TEST-only keys, and the float-bearing keys called out —
the keys whose outputs route doubles into rounds and so carry the
residual cross-engine boundary risk the sweep exists to catch.
"""
import json, os, re, subprocess, sys, tempfile

SFS = ["sf0.001", "sf0.01", "sf0.1"]
TESTDATA = "/root/testdata"
# double-derived outputs (rounded shares/rates/distances): the keys a
# scale-dependent .5-boundary fluke would hit first (r7 verdict #3)
FLOAT_SENSITIVE = ["sample_temperature", "quality_drift", "sim_kmeans",
                   "graph_pagerank", "sim_quantize_int8", "agg_corr",
                   "text_tfidf", "dedup_span_apply",
                   # single-division rounds (low risk by the parity
                   # rules, listed for completeness):
                   "graph_jaccard_neighbors", "ts_seasonal_decompose"]


def main():
    out_json = sys.argv[1] if len(sys.argv) > 1 else "SWEEP_r08.json"
    # optional extra args: SF dirs to sweep (bare names resolve under
    # /root/testdata; anything with a '/' is a path — e.g. the derived
    # fixtures/sf1 from graft.FixtureGen). Default: the shipped three.
    global SFS
    dirs = [d if "/" in d else f"{TESTDATA}/{d}" for d in sys.argv[2:]] \
        or [f"{TESTDATA}/{sf}" for sf in SFS]
    SFS = [d.rstrip("/").rsplit("/", 1)[-1] for d in dirs]
    # results are keyed by basename: two dirs sharing a final segment
    # (e.g. /root/testdata/sf1 and fixtures/sf1) would silently collapse
    # in the dict and mislabel every per-SF total (r14 ADVICE)
    if len(set(SFS)) != len(SFS):
        sys.exit(f"sweep: duplicate SF dir basenames {SFS} — "
                 "per-SF results would collapse; pass distinct basenames")
    sf_dir = dict(zip(SFS, dirs))
    tmp = tempfile.mkdtemp(prefix="sweep-")
    sf_arg = ",".join(dirs)
    # SWEEP_RUNNER=run.sh uses the direct-java launcher (tools/run.sh)
    # against the already-compiled classes — no compile step, and no
    # clash with a warm sbt shell holding the project lock
    cmd = (["tools/run.sh", "graft.Verify", sf_arg, tmp]
           if os.environ.get("SWEEP_RUNNER") == "run.sh"
           else ["sbt", "-batch", f"runMain graft.Verify {sf_arg} {tmp}"])
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except subprocess.CalledProcessError as e:
        # CalledProcessError doesn't print captured output — a CI sweep
        # failing in the build/run step must not be opaque (r8 ADVICE)
        sys.stderr.write(e.stdout or "")
        sys.stderr.write(e.stderr or "")
        raise
    sweep, totals = {}, {}
    for sf in SFS:
        proc = subprocess.run(
            ["python3", "tools/check.py", sf_dir[sf], f"{tmp}/{sf}"],
            capture_output=True, text=True)
        # a crashed comparator (missing fixture, OOM) emits no PASS/FAIL
        # lines — without this check it would machine-read as a clean
        # zero-failure column (r16 ADVICE). check.py's contract: 0 = ran
        # clean, 3 = ran with FAILs (still a valid column); anything else
        # is a crash.
        if proc.returncode not in (0, 3):
            sys.stderr.write(proc.stderr or "")
            sys.exit(f"sweep: check.py for {sf} exited {proc.returncode} — "
                     "comparator crash, not a clean pass")
        per = {}
        for line in proc.stdout.splitlines():
            # key name only — check.py's FAIL/NOTE lines carry a trailing
            # colon ('FAIL name: ...') that r8's (\S+) captured into the
            # key, splitting the namespace (r8 ADVICE)
            m = re.match(r"(PASS|FAIL|NOTE) ([^\s:]+)", line)
            if m:
                per[m.group(2)] = {"PASS": "pass", "FAIL": "fail",
                                   "NOTE": "test_only"}[m.group(1)]
        sweep[sf] = per
        totals[sf] = {
            "pass": sum(1 for v in per.values() if v == "pass"),
            "fail": sum(1 for v in per.values() if v == "fail"),
            "test_only": sum(1 for v in per.values() if v == "test_only"),
        }
    keys = sorted(set().union(*[set(v) for v in sweep.values()]))
    result = {
        "sfs": SFS,
        "totals": totals,
        "float_sensitive": {
            k: {sf: sweep[sf].get(k) for sf in SFS} for k in FLOAT_SENSITIVE},
        "fails": {sf: sorted(k for k, v in per.items() if v == "fail")
                  for sf, per in sweep.items()},
        "keys": {k: {sf: sweep[sf].get(k) for sf in SFS} for k in keys},
    }
    # ---- optional EXTRA column: a key SUBSET at one more (big) SF ------
    # r15 verdict #2: the sf10 oracle evidence must be a committed
    # machine-readable row, and at 60 M-row scale a full-inventory
    # Verify+DuckDB pass is neither affordable nor meaningful for every
    # key (some oracles are Θ(candidate-volume) replays). Env contract:
    #   SWEEP_EXTRA_DIR      = fixture dir (e.g. fixtures/sf10)
    #   SWEEP_EXTRA_KEYS     = comma keys to Verify+oracle there
    #   SWEEP_EXTRA_EXCLUDED = comma key=reason pairs recorded verbatim
    #                          in the artifact (the envelope-only keys,
    #                          named explicitly instead of in prose)
    extra_dir = os.environ.get("SWEEP_EXTRA_DIR")
    if extra_dir:
        extra_sf = extra_dir.rstrip("/").rsplit("/", 1)[-1]
        extra_keys = [k for k in
                      os.environ.get("SWEEP_EXTRA_KEYS", "").split(",") if k]
        excluded = dict(kv.split("=", 1) for kv in
                        os.environ.get("SWEEP_EXTRA_EXCLUDED", "").split(",")
                        if "=" in kv)
        etmp = tempfile.mkdtemp(prefix="sweep-extra-")
        ecmd = (["tools/run.sh", "graft.Verify", extra_dir, etmp] + extra_keys
                if os.environ.get("SWEEP_RUNNER") == "run.sh"
                else ["sbt", "-batch", "runMain graft.Verify " + extra_dir +
                      " " + etmp + " " + " ".join(extra_keys)])
        subprocess.run(ecmd, check=True, capture_output=True, text=True)
        # single-SF Verify writes directly into the out dir (no basename
        # subdir — the driver's t2 layout); pass the key subset through
        # to check.py too — oracle_sql.json carries ALL keys, and
        # un-subsetted the comparator records every non-dumped key as a
        # missing-dump FAIL
        # SWEEP_EXTRA_SPILL_GB: oracle-side spill budget for the big SF —
        # a replay that would ENOSPC the box instead prices itself out and
        # lands in `excluded` with its measured reason (r16 verdict #7)
        spill_gb = os.environ.get("SWEEP_EXTRA_SPILL_GB")
        spill_opt = [f"--max-spill-gb={spill_gb}"] if spill_gb else []
        proc = subprocess.run(
            ["python3", "tools/check.py"] + spill_opt +
            [extra_dir, etmp] + extra_keys,
            capture_output=True, text=True)
        per = {}
        for line in proc.stdout.splitlines():
            m = re.match(r"(PASS|FAIL|NOTE) ([^\s:]+)", line)
            if m:
                per[m.group(2)] = {"PASS": "pass", "FAIL": "fail",
                                   "NOTE": "test_only"}[m.group(1)]
            # machine-decided spill exclusions from check.py's
            # --max-spill-gb guard land in `excluded` with their measured
            # reason, same slot as the hand-curated env pairs
            ms = re.match(r"SKIP ([^\s:]+): (.*)", line)
            if ms:
                excluded[ms.group(1)] = ms.group(2)
        result["extra"] = {
            "sf": extra_sf, "dir": extra_dir,
            "keys": per,
            "excluded": excluded,
            # rc + stderr tail recorded in-artifact so a crashed extra-SF
            # comparator is distinguishable from a clean zero-fail column
            # (r16 ADVICE — the exact evidence row r15 verdict #2 demanded)
            "comparator_rc": proc.returncode,
            "totals": {
                "pass": sum(1 for v in per.values() if v == "pass"),
                "fail": sum(1 for v in per.values() if v == "fail"),
                "test_only": sum(1 for v in per.values() if v == "test_only"),
            },
        }
        totals[extra_sf] = result["extra"]["totals"]
        result["fails"][extra_sf] = sorted(
            k for k, v in per.items() if v == "fail")
        if proc.returncode not in (0, 3):
            result["extra"]["stderr_tail"] = (proc.stderr or "")[-2000:]
            # count the crash as a failure so the exit gate and any
            # machine reader of totals/fails both see it
            result["fails"][extra_sf].append(
                f"_comparator_crash_rc{proc.returncode}")
            totals[extra_sf]["fail"] += 1
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1, sort_keys=False)
    print(json.dumps({"totals": totals, "fails": result["fails"]}))
    if any(t["fail"] for t in totals.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
