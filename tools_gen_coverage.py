#!/usr/bin/env python
"""Regenerate COVERAGE.md's per-query freshness appendix (VERDICT r12
item 9): one row per registered query with its validation mode, strict
audit-twin pointer (where the production path is rows-only but a
hash-green twin audits its machinery), and the NEWEST driver
CORRECTNESS round, derived from the cumulative CORRECTNESS_r*.json
files. The appendix is rewritten between the marker lines; the curated
inventory tables above it are maintained by hand."""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BEGIN = "<!-- BEGIN GENERATED FRESHNESS TABLE (tools_gen_coverage.py) -->"
END = "<!-- END GENERATED FRESHNESS TABLE -->"

#: production rows-only operators -> the strict hash-green audit twin
#: that replays their machinery (same helpers, sha-derived hash family)
AUDIT_TWINS = {
    "d04_minhash_near_dups": "d21_minhash_audit (r12)",
    "d05_simhash_fingerprints": "d20_simhash_audit (r12)",
    "d08_simhash_near_dups": "d20_simhash_audit (r12)",
    "a16_cms_heavy_hitters": "a19_cms_audit (r12)",
    "d14_bloom_decontamination": "d22_bloom_audit (r12)",
    "v02_ann_lsh_topk": "v14_lsh_candidate_audit (r11)",
    "v04_ann_ivf_topk": "v15_ivf_audit (r12)",
    "v09_ann_ivfpq_topk": "v16_ivfpq_audit (r13)",
    "d13_near_dup_keep_list": "d23_keeplist_audit (r13)",
    "d11_semantic_dedup": "d24_semdedup_audit (r13)",
    "m06_perceptual_near_dup": "m09_phash_audit (r13)",
    "v08_pq_quantization_audit": "v16_ivfpq_audit (r13)",
    "a08_approx_aggregates": "(sketch estimates; APPROX_CHECKS differentials)",
    "a11_hll_distinct_rollup": "a20_hll_audit (r13)",
    "t05_fingerprint": "t36_winnow_audit (r13)",
}


def newest_rounds() -> dict[str, int]:
    newest: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        try:
            data = json.load(open(path))
        except Exception:
            continue
        for name, row in data.items():
            # "no_oracle" is the driver's rows-only check succeeding
            # (spark_rows recorded, no execution error) — it IS that
            # query's CORRECTNESS row
            if isinstance(row, dict) and row.get("err") in (None, "no_oracle"):
                newest[name] = max(newest.get(name, 0), rnd)
    return newest


def main() -> None:
    import __spark_entry__ as E

    qs = list(E.queries())
    oracles = set(E.oracle_sql())
    rounds = newest_rounds()
    lines = [
        BEGIN,
        "",
        "## Per-query freshness (generated)",
        "",
        f"{len(qs)} registered queries, {len(oracles)} oracle-backed. "
        "`newest row` = latest driver CORRECTNESS round with a "
        "non-error entry (`—` = first row pending next driver run); "
        "rows-only queries list the hash-green audit twin (or the "
        "declared-approximate policy) that covers their machinery.",
        "",
        "| query | check | newest row | audit twin / policy |",
        "|---|---|---|---|",
    ]
    for n in sorted(qs):
        mode = "oracle" if n in oracles else "rows-only"
        rnd = f"r{rounds[n]}" if n in rounds else "—"
        twin = AUDIT_TWINS.get(n, "")
        lines.append(f"| {n} | {mode} | {rnd} | {twin} |")
    lines += ["", END]
    block = "\n".join(lines)

    src = open("COVERAGE.md").read()
    if BEGIN in src:
        src = re.sub(
            re.escape(BEGIN) + r".*?" + re.escape(END),
            block,
            src,
            flags=re.S,
        )
    else:
        src = src.rstrip() + "\n\n" + block + "\n"
    open("COVERAGE.md", "w").write(src)
    missing = [n for n in qs if n not in rounds]
    print(
        f"freshness table: {len(qs)} queries, "
        f"{len([n for n in qs if n in rounds])} with driver rows, "
        f"pending first row: {missing}"
    )
    stale = sorted(
        (rounds[n], n) for n in qs if n in rounds
    )[:10]
    print("stalest:", stale)


if __name__ == "__main__":
    main()
