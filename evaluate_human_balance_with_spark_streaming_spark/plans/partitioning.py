"""Partitioning discipline helpers.

Spark sizes scan partitions by bytes (spark.sql.files.maxPartitionBytes),
which is right for scan-bound work but wrong for CPU-heavy per-row
expressions over *small-bytes* inputs: a 5 MB parquet file arrives as
one partition and a 16-hash MinHash sweep runs on one core. These
helpers spread such stages without penalizing already-parallel inputs.
"""

from __future__ import annotations

import os
import re
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame

# Logical operators whose presence means the plan's output partitioning
# is (usually) governed by spark.sql.shuffle.partitions or an explicit
# repartition, NOT by the scan's file layout — the file-count estimate
# below is meaningless for such plans and repartitioning them again is
# a pure extra shuffle. Matched as node-name STEMS at line starts in
# the ANALYZED plan (analysis is already forced by inputFiles();
# physical planning still never runs here) — deliberately no trailing
# \b so the stems cover the suffixed node names Spark actually prints:
# RepartitionByExpression, FlatMapGroupsInPandas,
# FlatMapCoGroupsInPandas, WindowGroupLimit.
#
# Known over-conservatism (two classes, same resolution): (a) a
# logical Join that the planner will BROADCAST does not shuffle the
# stream side, so a 1-partition scan broadcast-joined to a dim stays
# narrow and this helper declines to spread it — whether a join
# broadcasts is a PHYSICAL decision this plan-build-light check
# cannot see; (b) the stems also match NARROW variants that keep the
# upstream width (Sort from sortWithinPartitions, Repartition from
# coalesce — the logical node names don't carry the global/shuffle
# flag in toString). The helper's contract on uncertain evidence is
# "never add a shuffle", so callers doing CPU-heavy work downstream
# of either shape should spread the scan FIRST (every in-repo caller
# feeds bare scans).
_SHUFFLE_NODES = re.compile(
    r"^[\s+:-]*(Aggregate|Join|Window|Sort|Repartition|Deduplicate|"
    r"Distinct|Except|Intersect|CoGroup|FlatMapGroups|MapGroups)",
    re.M,
)


def _has_shuffle_operator(df: DataFrame) -> bool:
    try:
        return bool(_SHUFFLE_NODES.search(str(df._jdf.queryExecution().analyzed())))
    except Exception:
        # Can't inspect (e.g. Spark Connect has no _jdf) → assume
        # shuffled, which makes the helper a no-op: never add a
        # shuffle on uncertain evidence. Loud, not silent — callers
        # relying on the spread (minhash's one-core hot-loop case)
        # should know it is disabled on this session type.
        import warnings

        warnings.warn(
            "ensure_min_partitions: cannot inspect the analyzed plan on "
            "this session type; scan-spreading is disabled (treating the "
            "plan as already shuffled)",
            RuntimeWarning,
            stacklevel=3,
        )
        return True

# Mirrors the spark.sql.files.maxPartitionBytes default (128 MB): used
# only to ESTIMATE how many scan tasks large files will split into, so
# a few-big-files input is not misread as few-partitions (which would
# buy a pointless full shuffle of an already-parallel scan).
_SPLIT_BYTES = 128 << 20


def _estimated_scan_parallelism(df: DataFrame) -> int | None:
    """Estimate the scan parallelism of ``df`` from FILE METADATA only
    — ``inputFiles()`` resolves the logical plan's file index but never
    builds the physical plan or an RDD (VERDICT r03 item 6: the old
    ``df.rdd.getNumPartitions()`` probe forced driver-side physical
    planning of the upstream plan on every operator build). Each input
    file contributes at least one task plus one per 128 MB of splits
    (sizes are read for local files; remote files conservatively count
    once, which at worst repartitions an input that was already
    parallel enough). None when the plan has no file scan to estimate
    (in-memory test data, post-shuffle inputs)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        # No file scan in the plan (in-memory/createDataFrame input):
        # nothing to estimate. NB inputFiles() does NOT distinguish a
        # bare scan from a post-shuffle plan — it walks to the leaf
        # relations either way; _has_shuffle_operator covers that case.
        return None
    est = len(files)
    for f in files:
        if f.startswith("file:"):
            # inputFiles() returns URIs, not raw paths: percent-encoded
            # characters (a space in sf_dir) or the file://host/ form
            # must be decoded before stat'ing, else a multi-GB local
            # file silently loses its per-128MB split credit and the
            # helper adds a shuffle the scan's own splitting makes
            # redundant (review finding).
            try:
                est += (
                    os.path.getsize(unquote(urlparse(f).path)) // _SPLIT_BYTES
                )
            except (OSError, ValueError):
                pass
    return est


def ensure_min_partitions(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition up to ``min_partitions`` (default: the
    session's default parallelism) iff the DataFrame is a narrow
    pipeline over a file scan that would produce fewer tasks. No-op —
    no added shuffle — when the scan is already at least that
    parallel, when the plan contains a shuffle-producing operator
    (its width is then set by spark.sql.shuffle.partitions, which the
    file estimate cannot see), or when there is no file scan to
    estimate (in-memory inputs arrive pre-spread at the session's
    parallelism). Safe to leave in scale paths. The check is
    plan-build-light: file metadata + the already-analyzed logical
    plan, never an RDD conversion or physical planning (asserted by
    tests/test_plan_shapes.py)."""
    if min_partitions is None:
        try:
            min_partitions = df.sparkSession.sparkContext.defaultParallelism
        except Exception:
            # Spark Connect exposes no sparkContext; this must take the
            # same warn-and-no-op fallback as the plan inspection below
            # — raising here would crash every operator build that
            # calls the helper with the default target.
            import warnings

            warnings.warn(
                "ensure_min_partitions: no sparkContext on this session "
                "type and no explicit min_partitions; scan-spreading is "
                "disabled",
                RuntimeWarning,
                stacklevel=2,
            )
            return df
    est = _estimated_scan_parallelism(df)
    if est is not None and est < min_partitions and not _has_shuffle_operator(df):
        return df.repartition(min_partitions)
    return df
