#!/usr/bin/env python
"""Deconfounded ngram_jaccard stress decomposition (VERDICT r05 item
3), the same protocol that settled the connected-components ratio in
r05: ONE session, PRE-MATERIALIZED inputs, best-of-3 per stage — so
the recorded growth is the operator's, not the sweep's scheduling or
session warmth. The full-workload ngram row swung 8.05× ↔ 12.2×
across identical-binary sweeps (its candidate join was separately
measured swinging 89 → 51 s), which makes any single sweep ratio
unusable as the prefix filter's structural evidence.

Decomposition:
  - candidates: shingle build → per-block rarity order → prefix
    index → (blk, shingle) equi-join + size filter + pair dedup
    (dedup.ngram_prefix_candidates — the half the prefix filter
    bounds, and the stage whose growth the ×10 dup-stress judges);
  - verify: exact Jaccard over the FULL shingle arrays for the
    materialized candidate set (dedup._verify_jaccard — linear in
    surviving candidates).

Inputs are localCheckpointed before any timing (the K× salted
replication is stress staging, not operator work). Each candidate rep
rebuilds the plan from the materialized input and re-counts; the
verify stage runs from a localCheckpointed candidate table plus the
already-persisted shingle table, so its reps measure verification
only.

Usage: python scripts/stress_ngram_decompose.py [sf_dir] [K ...]
Defaults: /root/testdata/sf0.1, K = 1 10. Feeds SCALING.md r06.
"""

from __future__ import annotations

import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from stress_scale import replicated  # noqa: E402

from evaluate_human_balance_with_spark_streaming_spark.caching import (  # noqa: E402
    release_managed,
)
from evaluate_human_balance_with_spark_streaming_spark.operators import (  # noqa: E402
    dedup,
)
from evaluate_human_balance_with_spark_streaming_spark.session import (  # noqa: E402
    get_spark,
)
from evaluate_human_balance_with_spark_streaming_spark.sources.testdata import (  # noqa: E402
    load_table,
)

from pyspark.sql import functions as F  # noqa: E402

REPS = 3

# The verify stage's best-of-3 spread 73.6-111 s across r06 sweeps on
# this box (SCALING.md r06, VERDICT r06 item 3) — the same
# under-sampling profile that earned dedup_minhash_lsh its best-of-5
# floor in bench.py (QUERY_REPS): the stage materializes ~225k output
# pairs through a freshly generated Jaccard-intersection kernel, and
# the first reps bill C2 JIT compile bandwidth that varies with
# whatever else the box compiled recently. Floor it at 5 so the
# recorded minimum samples the settled tail, not the compile ramp.
VERIFY_REPS_FLOOR = 5


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and not args[0].isdigit():
        sf_dir = args.pop(0)
    ks = [int(a) for a in args] or [1, 10]

    spark = get_spark("ngram-decompose")
    # Session warmup: one full small pass so K=ks[0] doesn't absorb
    # first-in-session JIT of the candidate/verify generated code.
    warm = load_table(spark, sf_dir, "documents").limit(200).localCheckpoint()
    dedup.ngram_jaccard_pairs(warm, "text", "doc_id", "source").count()
    release_managed()

    print(
        f"{'K':>3} {'cand_rows':>10} {f'cand_s (best of {REPS})':>24} "
        f"{'out_rows':>9} "
        f"{f'verify_s (best of {max(REPS, VERIFY_REPS_FLOOR)})':>26}"
    )
    results: dict[int, tuple[float, float]] = {}
    for k in ks:
        docs = replicated(
            load_table(spark, sf_dir, "documents"),
            k,
            id_cols=("doc_id",),
            salt_col="text",
        ).localCheckpoint()

        cand_times: list[float] = []
        n_cand = 0
        cand = sized = None
        for _ in range(REPS):
            release_managed()
            cand, sized = dedup.ngram_prefix_candidates(
                docs, "text", "doc_id", "source", shingle_n=2, threshold=0.3
            )
            t0 = time.time()
            n_cand = cand.count()
            cand_times.append(round(time.time() - t0, 2))

        # sized is persisted (managed) and already materialized by the
        # final candidate count; freeze the candidate set so verify
        # reps measure verification only.
        cand_m = cand.localCheckpoint()
        ver_times: list[float] = []
        n_out = 0
        for _ in range(max(REPS, VERIFY_REPS_FLOOR)):
            t0 = time.time()
            n_out = dedup._verify_jaccard(
                cand_m, sized.select(F.col("doc_id"), "sh"), "doc_id", 0.3
            ).count()
            ver_times.append(round(time.time() - t0, 2))
        release_managed()

        results[k] = (min(cand_times), min(ver_times))
        print(
            f"{k:>3} {n_cand:>10} {min(cand_times):>8.2f} {cand_times!s:>15} "
            f"{n_out:>9} {min(ver_times):>8.2f} {ver_times!s:>17}"
        )

    if len(ks) >= 2:
        lo, hi = ks[0], ks[-1]
        cl, vl = results[lo]
        ch, vh = results[hi]
        print(
            f"\ncandidate growth K={hi}/K={lo}: {ch / max(cl, 1e-9):.2f}x; "
            f"verify growth: {vh / max(vl, 1e-9):.2f}x"
        )


if __name__ == "__main__":
    main()
