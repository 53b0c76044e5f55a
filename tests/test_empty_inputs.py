"""Zero-row inputs: every registered query must DEGRADE, not crash.

At production scale empty inputs are routine — a partition-pruned scan
that matched nothing, a tenant with no documents yet, a replay window
before the first event — and Spark 4's ANSI mode turns latent edge
assumptions (array[0] on nothing, aggregates feeding casts with null,
sampled centroid builds over an empty corpus, convergence loops over
zero edges) into runtime crashes rather than quiet nulls. The oracle
gate certifies values at sf0.01 but never exercises this regime, so
this sweep runs EVERY registry query against a zero-row mirror of all
ten tables (same schemas, written from limit(0) of sf0.001) and
asserts each one plans, executes, and returns a countable result.

Row counts are deliberately NOT asserted beyond >= 0: a global
aggregate legitimately returns one all-null/zero row on empty input
and a filter returns zero rows — the invariant under test is "no
operator crashes on the empty regime", not a semantics pin (the
oracle gate owns semantics).
"""

from __future__ import annotations

import pytest

from evaluate_human_balance_with_spark_streaming_spark.sources.testdata import (
    TABLES,
    load_table,
)

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory) -> str:
    """A directory shaped exactly like a driver sf dir — one
    <table>.parquet per table — holding zero rows each, schemas taken
    from the real test-scale tables via load_table (so events.ts is
    the post-conversion TimestampType, matching what queries see)."""
    out = tmp_path_factory.mktemp("empty-sf")
    for name in TABLES:
        load_table(spark, sf_dir, name).limit(0).write.mode(
            "overwrite"
        ).parquet(str(out / f"{name}.parquet"))
    return str(out)


def test_every_registered_query_tolerates_empty_tables(spark, empty_sf_dir):
    failures = []
    for name, fn in entrymod.queries().items():
        try:
            n = fn(spark, empty_sf_dir).count()
        except Exception as ex:  # collect all, report together
            failures.append(f"{name}: {type(ex).__name__}: {str(ex)[:300]}")
        else:
            assert n >= 0
    assert not failures, "queries crashed on zero-row inputs:\n" + "\n".join(
        failures
    )
