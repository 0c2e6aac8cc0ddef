#!/usr/bin/env python3
"""Regenerate COVERAGE.md's assurance-record counts from artifacts.

Two rounds running (r16, r17) the hand-written counts in the assurance
record drifted from the measured truth (278 vs 279 tests; 283 vs 284
plans). This tool makes the record mechanical: it parses the REAL
artifacts — the scalatest summary line, Explain ALL's own stdout, and
check.py's gate summary — and rewrites the block between the GENERATED
COUNTS markers in COVERAGE.md. Nothing in that block is hand-typed.

Usage (end of round):
    sbt -batch test                                  | tee /tmp/test.log
    sbt -batch "runMain graft.Explain /root/testdata/sf0.001 ALL" \
                                                     | tee /tmp/explain.log
    # (record Explain's exit code: echo $? > /tmp/explain.exit)
    python3 tools/check.py /root/testdata/sf0.01 target/verify_out \
                                                     | tee /tmp/gate.log
    python3 tools/sync_counts.py --round N \
        --test-log /tmp/test.log --explain-log /tmp/explain.log \
        --explain-exit /tmp/explain.exit --gate-log /tmp/gate.log
"""
import argparse
import re
import sys

COVERAGE = "/root/repo/COVERAGE.md"
BEGIN = "<!-- BEGIN GENERATED COUNTS (tools/sync_counts.py; do not hand-edit) -->"
END = "<!-- END GENERATED COUNTS -->"


def parse_test_log(path):
    txt = open(path, errors="replace").read()
    m = re.search(
        r"Tests: succeeded (\d+), failed (\d+), canceled (\d+), ignored (\d+)", txt)
    s = re.search(r"Suites: completed (\d+), aborted (\d+)", txt)
    if not m or not s:
        sys.exit(f"no scalatest summary in {path}")
    return dict(succeeded=int(m.group(1)), failed=int(m.group(2)),
                canceled=int(m.group(3)), ignored=int(m.group(4)),
                suites=int(s.group(1)), aborted=int(s.group(2)))


def parse_explain_log(path):
    txt = open(path, errors="replace").read()
    headers = re.findall(r"^========== (\S+) ==========$", txt, re.M)
    smells = re.findall(r"^!! ", txt, re.M)
    audit = re.search(r"\[streaming-state audit\] (\d+) plans, (\d+) smells", txt)
    if not audit:
        sys.exit(f"no streaming-state audit line in {path}")
    stream_plans = int(audit.group(1))
    # In ALL mode the "==========" headers are the BATCH queries only —
    # stream_* rows never print a header there; their state plans are
    # counted by the audit line. (Structural rule, not a pinned count:
    # batch headers + the audit line's plan count must equal the full
    # registry size at any round.)
    return dict(batch_plans=len(headers),
                stream_plans=stream_plans,
                total_plans=len(headers) + stream_plans,
                smell_lines=len(smells),
                stream_smells=int(audit.group(2)))


def parse_gate_log(path):
    txt = open(path, errors="replace").read()
    m = re.search(r"(\d+) pass, (\d+) fail, (\d+) rows-only", txt)
    if not m:
        sys.exit(f"no check.py summary in {path}")
    return dict(passed=int(m.group(1)), failed=int(m.group(2)),
                rows_only=int(m.group(3)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", required=True)
    ap.add_argument("--test-log", required=True)
    ap.add_argument("--explain-log", required=True)
    ap.add_argument("--explain-exit", help="file holding Explain's exit code")
    ap.add_argument("--gate-log", help="check.py output (optional)")
    args = ap.parse_args()

    t = parse_test_log(args.test_log)
    e = parse_explain_log(args.explain_log)
    exit_code = "unrecorded"
    if args.explain_exit:
        exit_code = open(args.explain_exit).read().strip()
    gate = ""
    if args.gate_log:
        g = parse_gate_log(args.gate_log)
        total = g["passed"] + g["failed"] + g["rows_only"]
        gate = (f" Gate (check.py, sf0.01): {total} queries — {g['passed']} "
                f"pass, {g['failed']} fail, {g['rows_only']} rows-only.")

    block = (
        f"{BEGIN}\n"
        f"Round-{args.round} measured counts (parsed from artifacts, not "
        f"hand-typed): `sbt test` {t['succeeded']}/"
        f"{t['succeeded'] + t['failed'] + t['canceled'] + t['ignored']} "
        f"succeeded, {t['failed']} failed, {t['canceled']} canceled, "
        f"{t['ignored']} ignored, across {t['suites']} suites "
        f"({t['aborted']} aborted). `Explain ALL`: {e['batch_plans']} batch "
        f"plans + {e['stream_plans']} streaming-state plans = "
        f"{e['total_plans']} total, {e['smell_lines']} smell lines "
        f"({e['stream_smells']} streaming), exit {exit_code}.{gate}\n"
        f"{END}")

    cov = open(COVERAGE).read()
    if BEGIN in cov:
        cov = re.sub(re.escape(BEGIN) + r".*?" + re.escape(END), block,
                     cov, flags=re.S)
    else:
        # first install: append to the end of the assurance-record area
        cov = cov.rstrip() + "\n\n" + block + "\n"
    open(COVERAGE, "w").write(cov)
    print(block)
    if t["failed"] or t["aborted"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
