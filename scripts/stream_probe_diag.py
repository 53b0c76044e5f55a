#!/usr/bin/env python
"""Three-way stream-probe elevation diagnosis (VERDICT r13 item 1).

The stream calibration probe has read >=1.10x of its 1.337 s clean pin
for three consecutive rounds (37+ recordings) while the scan probe sat
at/below ITS pin on the same windows. That one-sided elevation has two
candidate causes the suite artifacts cannot distinguish:

  (A) I/O substrate — the probe's checkpoint/state-store writes land in
      /tmp, which on this box is plain disk (/dev/vda), so a host-level
      storage-contention change would tax ONLY the stream class;
  (B) streaming overhead — micro-batch scheduling/planning cost (CPU,
      same class the scan probe measures) grew, which would show up
      equally with state I/O removed.

This script runs the controlled experiment the verdict asks for, in one
process on one session, interleaved so all variants see the same load:

  variant                 stateful op    state provider  checkpoint dir
  stateful_hdfs_disk      window agg     HDFSBacked      /tmp (disk)   <- the shipped probe, bench.py:341-390
  stateful_hdfs_shm       window agg     HDFSBacked      /dev/shm (tmpfs)
  stateful_rocks_disk     window agg     RocksDB         /tmp (disk)
  stateful_rocks_shm      window agg     RocksDB         /dev/shm (tmpfs)
  stateless_disk          none (map)     n/a             /tmp (disk)
  stateless_shm           none (map)     n/a             /dev/shm (tmpfs)

All variants replay the SAME pre-written 8-file parquet wire in 4
availableNow micro-batches on the same small-width replay session —
identical to bench.streaming_calibration_probe's shape. The stateless
pair is the third calibration class: micro-batch machinery with zero
state-store I/O. Decision table over the settled (min) readings:

  - stateful_hdfs_shm << stateful_hdfs_disk  -> cause is checkpoint I/O
    substrate (A): split the stream pin, re-pin the I/O-bound component
    on the current substrate (FORCE-protocol, documented in SCALING.md).
  - stateless also elevated vs its share       -> cause is (B) or load:
    the scan-probe control readings decide which.
  - RocksDB column: provider sensitivity — moves snapshot/changelog I/O
    into RocksDB's own write path; a large HDFS/Rocks gap on the same
    dir isolates provider overhead from substrate.

Protocol: one unmeasured warmup cycle (JIT settle, same role as the
probe's settle barrier), then N measured cycles; within each cycle the
variants run once each in a rotated order (cycle i starts at variant
i mod 6) so slow-drifting load cannot bias one variant. A 4-rep scan
probe runs before each cycle as the window-cleanliness control.

Usage: python scripts/stream_probe_diag.py [CYCLES=4] [OUT=STREAM_PROBE_DIAG.json]
Writes the full evidence JSON to OUT and prints one summary JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import bench  # noqa: E402

HDFS_PROVIDER = (
    "org.apache.spark.sql.execution.streaming."
    "state.HDFSBackedStateStoreProvider"
)
ROCKS_PROVIDER = (
    "org.apache.spark.sql.execution.streaming."
    "state.RocksDBStateStoreProvider"
)
DISK_BASE = tempfile.gettempdir()  # /tmp -> /dev/vda on this box
SHM_BASE = "/dev/shm"


def _build(rs, schema, path, stateful: bool):
    from pyspark.sql import functions as F

    from evaluate_human_balance_with_spark_streaming_spark.sources.files import (
        stream_parquet_dir,
    )

    stream = stream_parquet_dir(rs, path, schema, max_files_per_trigger=2)
    if stateful:
        # Byte-identical plan to bench.streaming_calibration_probe.
        return (
            stream.withWatermark("ts", "30 seconds")
            .groupBy(F.window("ts", "60 seconds").alias("w"), F.col("k"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
        ), "complete"
    # Map-only: same source, same micro-batching, zero state stores.
    return (
        stream.select(
            F.col("id"),
            F.col("k"),
            F.md5(F.col("id").cast("string")).alias("h"),
        )
    ), "append"


def _drain_once(rs, df, mode: str, ckpt_base: str, provider: str | None) -> float:
    """One timed bounded replay: start -> availableNow drain -> count,
    then drop the sink view + checkpoint (cleanup outside the timer,
    like the probe's release_managed_since)."""
    if provider is not None:
        rs.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    name = f"diag_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="ehb-diag-ckpt-", dir=ckpt_base)
    t0 = time.time()
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        # ADVICE r14: awaitTermination(timeout) returns False when the
        # bound is hit with the drain still running — counting partial
        # results then would record ~300s as a valid variant reading
        # and silently pollute the diag evidence. A timed-out drain is
        # a broken experiment, not a data point: stop the query and
        # raise so the cycle aborts loudly.
        if not q.awaitTermination(300):
            # ADVICE r15: a hung query's stop() can itself throw; if
            # it does, it must not mask the diagnosis below — the
            # evidence log needs the 'did not terminate' RuntimeError,
            # not whatever stop() died with.
            try:
                q.stop()
            except Exception:
                pass
            raise RuntimeError(
                f"diag drain {name} did not terminate within 300s — "
                "reading invalid, aborting this cycle"
            )
        rs.table(name).count()
        elapsed = round(time.time() - t0, 3)
    finally:
        try:
            rs.catalog.dropTempView(name)
        except Exception:
            pass
        shutil.rmtree(ckpt, ignore_errors=True)
    return elapsed


def main() -> int:
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        HERE, "STREAM_PROBE_DIAG.json"
    )
    from pyspark.sql.types import StructType

    from evaluate_human_balance_with_spark_streaming_spark.session import get_spark
    from evaluate_human_balance_with_spark_streaming_spark.streaming.runner import (
        replay_session,
    )

    spark = get_spark("ehb-stream-probe-diag")
    rs = replay_session(spark)
    wire = bench._stream_probe_input(spark)
    schema = StructType.fromDDL("id bigint, ts timestamp, k bigint")

    variants = [
        ("stateful_hdfs_disk", True, DISK_BASE, HDFS_PROVIDER),
        ("stateful_hdfs_shm", True, SHM_BASE, HDFS_PROVIDER),
        ("stateful_rocks_disk", True, DISK_BASE, ROCKS_PROVIDER),
        ("stateful_rocks_shm", True, SHM_BASE, ROCKS_PROVIDER),
        ("stateless_disk", False, DISK_BASE, None),
        ("stateless_shm", False, SHM_BASE, None),
    ]
    series: dict[str, list[float]] = {n: [] for n, *_ in variants}
    scan_control: list[dict] = []
    loadavg: list[float] = []

    # Warmup cycle (unmeasured): JIT/classload settle for every plan
    # shape + both providers, same role as the probe settle barrier.
    print("# diag: warmup cycle", file=sys.stderr)
    for name, stateful, base, provider in variants:
        df, mode = _build(rs, schema, wire, stateful)
        _drain_once(rs, df, mode, base, provider)

    for c in range(cycles):
        smin, sseries = bench.calibration_probe(spark, min_reps=2, max_reps=4)
        scan_control.append({"min": smin, "series": sseries})
        loadavg.append(round(os.getloadavg()[0], 2))
        order = variants[c % len(variants):] + variants[: c % len(variants)]
        for name, stateful, base, provider in order:
            df, mode = _build(rs, schema, wire, stateful)
            series[name].append(_drain_once(rs, df, mode, base, provider))
        print(
            f"# diag cycle {c + 1}/{cycles}: scan {smin}s, "
            + ", ".join(f"{n} {series[n][-1]}s" for n, *_ in variants),
            file=sys.stderr,
        )

    ref = bench._clean_probe_reference()
    summary = {
        n: {
            "min_s": min(v),
            "median_s": sorted(v)[len(v) // 2],
            "series": v,
        }
        for n, v in series.items()
    }
    evidence = {
        "cycles": cycles,
        "rows": bench.STREAM_CALIBRATION_ROWS,
        "files": bench.STREAM_CALIBRATION_FILES,
        "disk_base": DISK_BASE,
        "shm_base": SHM_BASE,
        "scan_control": scan_control,
        "scan_pin_s": ref["probe_s"],
        "stream_pin_s": ref["stream_probe_s"],
        "loadavg_per_cycle": loadavg,
        "variants": summary,
    }
    with open(out_path, "w") as f:
        json.dump(evidence, f, indent=1)
    # One-line verdict helper: substrate delta on the shipped shape.
    disk = summary["stateful_hdfs_disk"]["min_s"]
    shm = summary["stateful_hdfs_shm"]["min_s"]
    stateless = summary["stateless_disk"]["min_s"]
    print(
        json.dumps(
            {
                "metric": "stream_probe_diag",
                "stateful_hdfs_disk_s": disk,
                "stateful_hdfs_shm_s": shm,
                "substrate_delta_s": round(disk - shm, 3),
                "stateless_disk_s": stateless,
                "scan_control_min_s": min(c["min"] for c in scan_control),
                "stream_pin_s": ref["stream_probe_s"],
                "disk_vs_pin": round(disk / ref["stream_probe_s"], 3),
                "out": out_path,
            }
        )
    )
    bench.shutdown_spark(spark)
    return 0


if __name__ == "__main__":
    sys.exit(main())
