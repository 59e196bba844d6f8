#!/usr/bin/env python3
"""Doc-sync counts check (VERDICT r6 item 8): the numbers the docs
claim must equal what the code actually registers.

- COVERAGE.md's "<N> registered queries total" == len(all_specs())
- every all_specs() entry has an oracle (the "no rows-only" claim)
- the driver correctness window (latest CORRECTNESS_r*.json) == the
  first len(window) sorted registry names (delegates to
  correctness_local.check_driver_window)
- optionally (--tests): the most recent committed test count in
  PERF.md is <= the live `pytest --collect-only` count (docs may lag
  a growing suite but must never overstate it)

Run before committing doc updates; exits non-zero on drift.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))


def main() -> int:
    from open_crime_etl_pipeline_spark.queries import all_specs

    specs = all_specs()
    n = len(specs)
    bad = 0

    cov = open(os.path.join(ROOT, "COVERAGE.md"), encoding="utf-8").read()
    m = re.search(r"(\d+) registered queries total", cov)
    if not m or int(m.group(1)) != n:
        print(f"FAIL COVERAGE.md says {m and m.group(1)} queries, registry has {n}")
        bad += 1
    else:
        print(f"COVERAGE.md count == registry == {n}  OK")
    m2 = re.search(r"\*\*(\d+) oracle-checked", cov)
    n_oracle = sum(1 for s in specs.values() if s.oracle is not None)
    if not m2 or int(m2.group(1)) != n_oracle:
        print(f"FAIL COVERAGE.md oracle count {m2 and m2.group(1)} != {n_oracle}")
        bad += 1
    if n_oracle != n:
        print(f"NOTE {n - n_oracle} rows-only entries exist")

    from correctness_local import check_driver_window

    try:
        check_driver_window()
    except AssertionError as exc:
        print(f"FAIL driver window: {exc}")
        bad += 1

    if "--tests" in sys.argv:
        out = subprocess.run(
            [sys.executable, "-m", "pytest", "--collect-only", "-q", "tests/"],
            capture_output=True, text=True, cwd=ROOT,
        ).stdout
        m3 = re.search(r"(\d+) tests collected", out)
        live = int(m3.group(1)) if m3 else -1
        perf = open(os.path.join(ROOT, "PERF.md"), encoding="utf-8").read()
        claimed = [int(x) for x in re.findall(r"\*\*(\d+) passed", perf)]
        worst = max(claimed) if claimed else 0
        if live < worst:
            print(f"FAIL PERF.md claims {worst} tests, only {live} collect")
            bad += 1
        else:
            print(f"PERF.md max claim {worst} <= live collection {live}  OK")

    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
