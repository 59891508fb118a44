#!/usr/bin/env python3
"""Regenerate README.md's count claims from artifacts, never by hand.

- query count  <- the [verify]-dumped oracle_sql.json (SparkEntry.queries),
                  falling back to a --queries N override
- test count   <- target/test-reports/*.xml (sum of tests, asserting
                  zero failures/errors so the README can't claim green
                  over a red run)

Usage:
  python3 tools/update_readme_counts.py [--queries N] [--check]

--check exits 1 (changing nothing) if the README is stale.
ReadmeClaimsSpec guards the query-count claims in-JVM on every sbt
test run; this script is the round-end refresher for the test count.
"""
import argparse
import glob
import json
import os
import re
import sys
import xml.etree.ElementTree as ET

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


MIN_PLAUSIBLE_QUERIES = 100  # the registry passed this in round 5


def query_count(override):
    n = override
    if not n:
        # ONLY the full-run artifact: a SPARK_GRAFT_ONLY-filtered dev
        # dump (e.g. /tmp/out) would silently rewrite README to its
        # tiny filtered count
        p = "/tmp/verify_sf001/oracle_sql.json"
        if not os.path.exists(p):
            sys.exit("no full-run oracle_sql.json at /tmp/verify_sf001;"
                     " pass --queries N")
        with open(p) as f:
            n = len(json.load(f))
    if n < MIN_PLAUSIBLE_QUERIES:
        sys.exit(f"query count {n} looks like a filtered dev run "
                 f"(registry has been > {MIN_PLAUSIBLE_QUERIES} since "
                 "round 5); refusing to rewrite README")
    return n


def test_count():
    xmls = glob.glob(os.path.join(ROOT, "target/test-reports/*.xml"))
    if not xmls:
        sys.exit("no target/test-reports/*.xml; run sbt test first")
    total, bad = 0, 0
    for x in xmls:
        s = ET.parse(x).getroot()
        total += int(s.get("tests", 0))
        bad += int(s.get("failures", 0)) + int(s.get("errors", 0))
    if bad:
        sys.exit(f"test reports record {bad} failures/errors; "
                 "README must not claim green")
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=0)
    ap.add_argument("--queries-only", action="store_true",
                    help="skip the test-count refresh (reports not "
                         "from a full green run yet)")
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    nq = query_count(args.queries)
    path = os.path.join(ROOT, "README.md")
    with open(path) as f:
        src = f.read()
    out = re.sub(r"\d+ named queries", f"{nq} named queries", src)
    out = re.sub(r"All \d+ match", f"All {nq} match", out)
    if not args.queries_only:
        nt = test_count()
        out = re.sub(r"`sbt test`: \d+ specs/properties",
                     f"`sbt test`: {nt} specs/properties", out)
    else:
        nt = "(unchanged)"
    if args.check:
        sys.exit(0 if out == src else
                 f"README counts stale (queries={nq} tests={nt}); "
                 "run tools/update_readme_counts.py")
    if out != src:
        with open(path, "w") as f:
            f.write(out)
        print(f"README updated: queries={nq} tests={nt}")
    else:
        print(f"README already current: queries={nq} tests={nt}")


if __name__ == "__main__":
    main()
