#!/usr/bin/env python3
"""Per-query driver around check.py's compare logic, with a wall timeout.

For derived-tier sweeps: some oracles are INTENTIONALLY quadratic
(q_edit1_neighbors' all-pairs recall proof) and intractable one tier up —
a single check.py pass would hang on them. This runs each named query in
its own subprocess under a timeout and reports PASS/FAIL/TIMEOUT per
query, so the tier-green list is an empirical artifact, not a guess.

Usage: python3 scripts/check_one.py <sfDir> <outDir> <timeout_s> [q ...]
       (no q args = every query in outDir/oracle_sql.json)
"""
import json, os, subprocess, sys, tempfile

sfdir, outdir, timeout = sys.argv[1], sys.argv[2], float(sys.argv[3])
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sys.argv[4:] or sorted(oracle)

passed, failed, timed_out = [], [], []
for name in names:
    if name not in oracle:
        print(f"SKIP {name}: no oracle entry")
        continue
    with tempfile.TemporaryDirectory() as td:
        os.symlink(os.path.abspath(f"{outdir}/{name}"), f"{td}/{name}")
        json.dump({name: oracle[name]}, open(f"{td}/oracle_sql.json", "w"))
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(__file__), "check.py"),
                 sfdir, td],
                capture_output=True, text=True, timeout=timeout)
            out = r.stdout.strip().splitlines()
            line = next((l for l in out if l.startswith(("PASS", "FAIL"))), "")
            print(line or f"FAIL {name}: no verdict\n{r.stdout}\n{r.stderr}")
            (passed if line.startswith("PASS") else failed).append(name)
        except subprocess.TimeoutExpired:
            print(f"TIMEOUT {name} (> {timeout:.0f}s oracle)")
            timed_out.append(name)
    sys.stdout.flush()

print(f"\n{len(passed)} passed, {len(failed)} failed, {len(timed_out)} timed out")
if failed:
    print("failed:", " ".join(failed))
if timed_out:
    print("timed_out:", " ".join(timed_out))
sys.exit(1 if failed else 0)
