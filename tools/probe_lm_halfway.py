"""No-halfway proof for the r16 LM-ladder integer-average conversion.

VERDICT r15 #3: the older ladder queries averaged their fixed-point
sums with ROUND(CAST(SUM(s) AS DOUBLE)/COUNT(*)/1e6, 6) — a REAL
halfway hazard (the r15 KN trigram sprang it at sf0.01:
S=226625028, n=56 = 4.0468755 exactly; Spark HALF_UP rounds up,
DuckDB binary-double rounding rounds down).  Before converting them to
the exact-integer form `(2S+n) div (2n)` (kn_trigram.py pattern), this
probe proves the conversion is VALUE-NEUTRAL on the frozen fixtures:
for each affected query it runs the registered DuckDB oracle ONCE with
BOTH expressions as side-by-side columns and counts disagreements.

r16 recorded result (before the conversion landed): 0 diffs for all
five queries at sf0.001, sf0.01, sf0.1 AND sf1 — so the converted
queries keep their driver-green attestations (no stale marks).

Usage: python tools/probe_lm_halfway.py SF_DIR [SF_DIR ...]

NOTE: run this from a tree where the oracles still carry the OLD
ROUND form (e.g. `git stash` the conversion); on the converted tree
the snippet match below fails by design — the probe is a pre-flight
proof, kept for the record and for any future fixture regeneration.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from sql2all_spark.registry import all_specs
from sql2all_spark.tables import TABLE_NAMES

# query -> (old ROUND snippet in its oracle, integer-sum expression)
CASES = {
    "text_unigram_lm_score": (
        "ROUND(CAST(SUM(s_scaled) AS DOUBLE) / COUNT(*) / 1000000.0, 6)"
        "\n         AS avg_neglogp",
        "SUM(s_scaled)",
    ),
    "text_bigram_lm_score": (
        "ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*) / 1000000.0, 6)"
        "\n         AS avg_neglogp",
        "SUM(s)",
    ),
    "text_trigram_lm_score": (
        "ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*) / 1000000.0, 6)"
        "\n         AS avg_neglogp",
        "SUM(s)",
    ),
    "text_kn_bigram_score": (
        "ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*) / 1000000.0, 6)"
        "\n         AS avg_neglogp",
        "SUM(s)",
    ),
    "text_perplexity_buckets": (
        "ROUND(CAST(SUM(CAST(avg_neglogp AS DECIMAL(18,6))) AS DOUBLE)"
        "\n             / COUNT(*), 6) AS avg_score",
        "CAST(SUM(CAST(avg_neglogp AS DECIMAL(18,6))) * 1000000"
        " AS HUGEINT)",
    ),
}


def main() -> int:
    specs = all_specs()
    bad = 0
    for sf in sys.argv[1:]:
        con = duckdb.connect()
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
            )
        for name, (old_snip, sum_expr) in CASES.items():
            sql = specs[name].oracle
            if old_snip not in sql:
                print(
                    f"{sf} {name}: SKIP (oracle already converted — "
                    "run from a pre-conversion tree)"
                )
                continue
            new_expr = (
                f"CAST((2 * {sum_expr} + COUNT(*)) // (2 * COUNT(*))"
                " AS DOUBLE) / 1000000.0"
            )
            old_expr = old_snip.rsplit(" AS ", 1)[0].strip()
            dual = sql.replace(
                old_snip, f"{old_expr} AS old_v,\n       {new_expr} AS new_v"
            )
            t0 = time.time()
            n = con.execute(
                f"SELECT COUNT(*) FROM ({dual}) "
                "WHERE old_v IS DISTINCT FROM new_v"
            ).fetchone()[0]
            tot = con.execute(f"SELECT COUNT(*) FROM ({dual})").fetchone()[0]
            bad += n
            print(
                f"{sf} {name}: {n} diffs / {tot} rows "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )
        con.close()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
