#!/usr/bin/env python
"""Best-window per-query floors from a campaign sidecar (VERDICT r12
item 6's consumer): for every query observed in CAMPAIGN JSONL lines
(suite runs and solo series), print the minimum recorded seconds, the
line it came from (kind/run), that window's probe ratios, and the
ratio vs the standing merged baseline — the exact numbers a watch-item
discharge cites, computed from the sidecar instead of prose.

Torn/corrupt sidecar lines are skipped (one bad line must not hide
the rest), but a query name is NEVER dropped: a query absent from the
merged baseline is still reported, with baseline_s/vs_baseline None
(printed as 'n/a'), so a renamed query surfaces in the report instead
of vanishing (VERDICT r13 item 4; pinned in tests/test_bench_gate.py::
test_campaign_floors_surfaces_unknown_query).

Usage: python scripts/campaign_floors.py [CAMPAIGN_r13.jsonl] [--json]
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import bench  # noqa: E402

# Vintage annotations (VERDICT r14 item 3): bars recorded under a
# probe class the r14 controlled experiment proved extinct
# (STREAM_PROBE_DIAG.json — the stream machinery class shifted
# structurally ~x1.18 on this host) structurally floor above 1.0x and
# can never clear. The stamp-at-floor patch protocol refuses to loosen
# them (correctly), so the floors report carries the adjusted
# expectation instead: adjusted = baseline_s * (current clean stream
# pin / the pin vintage the bar was recorded under). The factor is
# derived from the two recorded pins, never hand-typed; annotation
# applies only when the current pin is SLOWER than the recorded one
# (a faster class would demand a re-record, not an annotation).
VINTAGE_FILE = "BASELINE_VINTAGE.json"


def _vintage_adjustments(here: str = HERE) -> dict[str, dict]:
    try:
        with open(os.path.join(here, VINTAGE_FILE)) as f:
            d = json.load(f)
        return d if isinstance(d, dict) else {}
    except (OSError, ValueError):
        return {}


def floors(path: str) -> dict[str, dict]:
    """{query: {floor_s, kind, run, probe_vs_pin, stream_vs_pin,
    probe_clean, baseline_s, vs_baseline}} — min over every line that
    carries the query. Pure file-reading, no Spark."""
    best: dict[str, dict] = {}
    with open(path) as f:
        for raw in f:
            raw = raw.strip()
            if not raw:
                continue
            try:
                line = json.loads(raw)
            except ValueError:
                continue  # a torn/corrupt line must not hide the rest
            for q, secs in (line.get("queries") or {}).items():
                if not isinstance(secs, (int, float)) or isinstance(secs, bool):
                    continue
                if q not in best or secs < best[q]["floor_s"]:
                    best[q] = {
                        "floor_s": secs,
                        "kind": line.get("kind"),
                        "run": line.get("run"),
                        "probe_vs_pin": line.get("probe_vs_pin"),
                        "stream_vs_pin": line.get("stream_vs_pin"),
                        "probe_clean": line.get("probe_clean"),
                    }
    baseline = bench._baseline_timings()
    vintage = _vintage_adjustments()
    cur_pin = bench._clean_probe_reference().get("stream_probe_s")
    for q, rec in best.items():
        b = baseline.get(q)
        rec["baseline_s"] = b
        rec["vs_baseline"] = round(rec["floor_s"] / b, 3) if b else None
        rec["vintage_adjusted_baseline_s"] = None
        rec["vs_vintage_adjusted"] = None
        ann = vintage.get(q) or {}
        old_pin = ann.get("recorded_stream_pin_s")
        if (
            b
            and isinstance(old_pin, (int, float))
            and not isinstance(old_pin, bool)
            and old_pin > 0
            and isinstance(cur_pin, (int, float))
            and cur_pin > old_pin
        ):
            adj = b * (cur_pin / old_pin)
            rec["vintage_adjusted_baseline_s"] = round(adj, 3)
            rec["vs_vintage_adjusted"] = round(rec["floor_s"] / adj, 3)
    return best


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--json"]
    as_json = "--json" in sys.argv[1:]
    path = args[0] if args else os.path.join(HERE, "CAMPAIGN_r13.jsonl")
    if not os.path.exists(path):
        print(f"no campaign sidecar at {path}", file=sys.stderr)
        return 2
    best = floors(path)
    if as_json:
        print(json.dumps(best, sort_keys=True))
        return 0
    # `... | head` closes stdout early; that is a normal way to read
    # this report, not an error worth a traceback in the evidence log.
    # ADVICE r15: SIGPIPE is Unix-only — guard so a non-POSIX host
    # still prints the report instead of raising AttributeError.
    import signal

    if hasattr(signal, "SIGPIPE"):
        signal.signal(signal.SIGPIPE, signal.SIG_DFL)
    width = max((len(q) for q in best), default=10)
    for q in sorted(best, key=lambda q: -(best[q]["vs_baseline"] or 0)):
        r = best[q]
        vs = f"{r['vs_baseline']:.2f}x" if r["vs_baseline"] else "  n/a"
        adj = (
            f"  adj {r['vs_vintage_adjusted']:.2f}x"
            f" (vintage bar {r['vintage_adjusted_baseline_s']}s)"
            if r.get("vs_vintage_adjusted")
            else ""
        )
        print(
            f"{q:<{width}}  floor {r['floor_s']:>7.3f}s  vs_baseline {vs}{adj}"
            f"  window scan {r['probe_vs_pin']} stream {r['stream_vs_pin']}"
            f"  ({r['kind']} run {r['run']})"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
