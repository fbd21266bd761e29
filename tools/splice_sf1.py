#!/usr/bin/env python
"""Assemble the round-8 sf1 soak artifact from its partial runs.

The r8 soak's first execution (all 135 oracle-paired queries minus the
replay-verified ``text_pack_sequences``) crashed at query 124 when the
driving session died; the per-query result dicts for the completed 123
are in the run log (tools/check.py prints each one as it finishes).
Rather than re-pay the ~2h full soak, this tool splices:

1. the 123 completed results parsed from the crashed run's log,
2. the remaining-12 (+ ``text_bigram_lm_score``) re-run's --json-out,
3. the round-8 second-batch operators' own sf1 --json-out runs,
4. the ``text_pack_sequences`` O(n) replay (tools/verify_pack_sf1.py)
   appended afterwards, as in round 7,

into one CHECK_FULL_r8_sf1.json with per-entry ``method`` fields naming
the provenance (``live`` vs ``log-splice``).  Every entry is a real
Spark-vs-DuckDB comparison at sf1; only the transport differs.

Usage:
  python tools/splice_sf1.py --log /tmp/sf1_check.log \
      --json /tmp/sf1_rem.json /tmp/sf1_new4.json /tmp/sf1_vocab.json \
      --out CHECK_FULL_r8_sf1.json
"""

from __future__ import annotations

import argparse
import ast
import json
import re


def parse_log(path: str) -> dict[str, dict]:
    """Extract the printed per-query result dicts from a check.py log.

    Progress bars interleave with \\r on the same line, so match the
    dict syntactically rather than by line."""
    out: dict[str, dict] = {}
    text = open(path, errors="replace").read()
    # brace-aware: from each "{'name': ..." anchor, extend the candidate
    # span to successive closing braces until it parses — a result dict
    # containing a nested dict no longer truncates at the first '}'
    for m in re.finditer(r"\{'name': '[a-z0-9_]+'", text):
        start = m.start()
        d = None
        end = start
        for _ in range(8):  # results nest at most a level or two
            end = text.find("}", end + 1)
            if end < 0:
                break
            try:
                d = ast.literal_eval(text[start : end + 1])
                break
            except (ValueError, SyntaxError):
                continue
        if d is None:
            continue
        if isinstance(d, dict) and "status" in d:
            d["method"] = "log-splice"
            out[d["name"]] = d
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True)
    ap.add_argument("--json", nargs="+", default=[])
    ap.add_argument("--sf-dir", default="/root/repo/.testdata_sf1")
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--no-expect",
        action="store_true",
        help="skip validating coverage against the registry (the default "
        "check fails if the spliced keyset differs from the registered "
        "oracle-paired query list — ADVICE r8: a query missing from both "
        "inputs must not silently shrink the denominator)",
    )
    args = ap.parse_args()

    results = parse_log(args.log)
    for jpath in args.json:
        with open(jpath) as f:
            part = json.load(f)
        for name, r in part["results"].items():
            # keep an explicit provenance (check.py now stamps "live";
            # the replay tools stamp "replay") — only default legacy
            # method-less entries
            r.setdefault("method", "live")
            results[name] = r  # re-runs supersede log entries

    if not args.no_expect:
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        from sql2all_spark.registry import all_specs

        expected = set(all_specs())
        missing = sorted(expected - set(results))
        extra = sorted(set(results) - expected)
        if missing or extra:
            print(
                f"coverage mismatch vs registry: missing={missing} "
                f"extra={extra}",
            )
            return 1

    n_passed = sum(
        1 for r in results.values() if r["status"] in ("OK", "ROWS_ONLY")
    )
    with open(args.out, "w") as f:
        json.dump(
            {
                "sf_dir": args.sf_dir,
                "n_queries": len(results),
                "n_passed": n_passed,
                "results": dict(sorted(results.items())),
            },
            f,
            indent=1,
        )
    print(f"{n_passed}/{len(results)} passed -> {args.out}")
    return 0 if n_passed == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
