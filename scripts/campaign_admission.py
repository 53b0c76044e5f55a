#!/usr/bin/env python
"""Admission-outcome tally over a campaign sidecar (VERDICT r14 item
5): under the r14 re-pinned clean-probe references, `probe_clean`
should partition windows roughly symmetrically instead of reading
false forever (it read true once in 5 record runs in r14). This
script reports the split and the per-class probe-ratio distribution
from the JSONL evidence, so SCALING.md's table is derived from the
sidecar instead of typed prose — and so the "stream pin still too
tight" trigger (probe_clean true on <10% of windows) is checkable.

Usage: python scripts/campaign_admission.py [CAMPAIGN_r15.jsonl] [--json]
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def _dist(vals: list[float]) -> dict | None:
    vals = sorted(
        v for v in vals if isinstance(v, (int, float)) and not isinstance(v, bool)
    )
    if not vals:
        return None
    # ADVICE r15: vals[n//2] is the upper-middle element for even n —
    # a biased-high "median" for the vs-pin distributions the <10%
    # clean-windows trigger discussion leans on. True median: average
    # the two middle elements when n is even.
    mid = len(vals) // 2
    med = vals[mid] if len(vals) % 2 else (vals[mid - 1] + vals[mid]) / 2
    return {
        "n": len(vals),
        "min": vals[0],
        "median": round(med, 6),
        "max": vals[-1],
    }


def tally(path: str) -> dict:
    """{overall: {...}, by_kind: {kind: {...}}} — probe_clean
    true/false/unknown counts and scan/stream vs-pin distributions.
    Torn lines are skipped; a line without probes still counts toward
    the split as 'unknown' (no evidence is not evidence of a clean
    window). Pure file-reading, no Spark."""
    buckets: dict[str, dict] = {}

    def bucket(kind: str) -> dict:
        return buckets.setdefault(
            kind,
            {"runs": 0, "clean_true": 0, "clean_false": 0, "clean_unknown": 0,
             "scan_vs_pin": [], "stream_vs_pin": []},
        )

    with open(path) as f:
        for raw in f:
            raw = raw.strip()
            if not raw:
                continue
            try:
                line = json.loads(raw)
            except ValueError:
                continue
            for b in (bucket(str(line.get("kind"))), bucket("__all__")):
                b["runs"] += 1
                pc = line.get("probe_clean")
                key = (
                    "clean_true" if pc is True
                    else "clean_false" if pc is False
                    else "clean_unknown"
                )
                b[key] += 1
                b["scan_vs_pin"].append(line.get("probe_vs_pin"))
                b["stream_vs_pin"].append(line.get("stream_vs_pin"))
    out: dict = {"by_kind": {}}
    for kind, b in buckets.items():
        rec = {
            "runs": b["runs"],
            "clean_true": b["clean_true"],
            "clean_false": b["clean_false"],
            "clean_unknown": b["clean_unknown"],
            "clean_frac": round(b["clean_true"] / b["runs"], 3) if b["runs"] else None,
            "scan_vs_pin": _dist(b["scan_vs_pin"]),
            "stream_vs_pin": _dist(b["stream_vs_pin"]),
        }
        if kind == "__all__":
            out["overall"] = rec
        else:
            out["by_kind"][kind] = rec
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--json"]
    as_json = "--json" in sys.argv[1:]
    path = args[0] if args else os.path.join(HERE, "CAMPAIGN_r15.jsonl")
    if not os.path.exists(path):
        print(f"no campaign sidecar at {path}", file=sys.stderr)
        return 2
    t = tally(path)
    if as_json:
        print(json.dumps(t, sort_keys=True))
        return 0
    rows = [("overall", t.get("overall"))] + sorted(t["by_kind"].items())
    for kind, r in rows:
        if not r:
            continue
        scan, stream = r["scan_vs_pin"], r["stream_vs_pin"]
        fmt = lambda d: (
            f"{d['min']:.2f}/{d['median']:.2f}/{d['max']:.2f}" if d else "n/a"
        )
        print(
            f"{kind:<10} runs {r['runs']:>3}  clean {r['clean_true']}T/"
            f"{r['clean_false']}F/{r['clean_unknown']}?"
            f" (frac {r['clean_frac']})  scan min/med/max {fmt(scan)}"
            f"  stream {fmt(stream)}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
