#!/usr/bin/env python3
"""Distill an `sbt test` log into a machine-readable summary artifact.

Usage: python3 tools/test_summary.py /tmp/fulltest.log > TEST_SUMMARY.json

Emits one JSON object: suite/test counts, failed test names, wall time
and the git HEAD it was measured at — committed with the snapshot so the
round's test evidence is verifiable without a 10-minute re-run.
"""
import json
import re
import subprocess
import sys


def main(path: str) -> None:
    txt = open(path, encoding="utf-8", errors="replace").read()
    suites = re.search(r"Suites: completed (\d+), aborted (\d+)", txt)
    tests = re.search(
        r"Tests: succeeded (\d+), failed (\d+), canceled (\d+), "
        r"ignored (\d+), pending (\d+)", txt)
    total = re.search(r"Total number of tests run: (\d+)", txt)
    elapsed = re.search(r"Run completed in (.+?)\.", txt)
    failed_names = re.findall(r"^\[info\] - (.+?) \*\*\* FAILED \*\*\*",
                              txt, re.M)
    head = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                          text=True).stdout.strip()
    out = {
        "git_head": head,
        "suites_completed": int(suites.group(1)) if suites else None,
        "suites_aborted": int(suites.group(2)) if suites else None,
        "tests_total": int(total.group(1)) if total else None,
        "tests_succeeded": int(tests.group(1)) if tests else None,
        "tests_failed": int(tests.group(2)) if tests else None,
        "tests_canceled": int(tests.group(3)) if tests else None,
        "tests_ignored": int(tests.group(4)) if tests else None,
        "elapsed": elapsed.group(1) if elapsed else None,
        "failed_tests": failed_names,
    }
    json.dump(out, sys.stdout, indent=2)
    print()


if __name__ == "__main__":
    main(sys.argv[1])
