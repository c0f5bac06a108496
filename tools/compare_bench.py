"""Compare two bench JSON lines under the README's normalization rule.

    python tools/compare_bench.py OLD.json NEW.json [--threshold 1.0]

Implements the calibration discipline documented in README ("Bench
calibration"): a per-query regression is REAL only if

    new_median / old_median  >  threshold * (new_probe / old_probe)

i.e. the query slowed down by more than the machine itself did between
the two runs (probe = the fixed-cost range-sum each bench run brackets
itself with; its timing moves only with ambient load). Inputs are
bench.py output lines — either raw files whose last line is the JSON,
or driver BENCH_r{N}.json records (the ``tail`` field is parsed
best-effort for the per-query map).

Prints one JSON line: machine factor, per-query normalized ratios for
everything above threshold, new/removed queries, and a geomean over
the shared set — the exact numbers a round-over-round review needs.
Exit code 1 when any normalized regression clears the threshold.
"""

from __future__ import annotations

import argparse
import json
import math
import re
import sys


def _load(path: str) -> tuple[dict[str, float], float | None]:
    """(queries, probe) from a bench output file or driver record."""
    with open(path) as f:
        text = f.read()
    queries: dict[str, float] = {}
    probe = None
    obj = None
    _load.last_disagreement = None  # reset per call (stale-state guard)
    _load.last_shelf = []  # new-entry shelf of the loaded run, if any
    for candidate in (text, text.strip().splitlines()[-1] if text.strip() else ""):
        try:
            obj = json.loads(candidate)
            break
        except json.JSONDecodeError:
            continue
    # driver record carrying the fully-parsed bench line: unwrap and
    # fall through to the bench-line branch (same probe/shelf rules
    # for both input kinds — the r10 review found the two paths had
    # drifted: min-vs-mean probes, no disagreement, polluted queries)
    if (
        isinstance(obj, dict)
        and "tail" in obj
        and isinstance(obj.get("parsed"), dict)
        and "queries" in obj["parsed"]
    ):
        obj = obj["parsed"]
    if isinstance(obj, dict) and "queries" in obj:
        queries = dict(obj["queries"])
        _load.last_shelf = list(obj.get("shelf") or [])
        calib = obj.get("calibration") or {}
        vals = [calib.get("start"), calib.get("end")]
        vals = [v for v in vals if isinstance(v, (int, float))]
        # MEAN of the bracketing probes (load often shifts mid-run;
        # min would credit the quiet moment to the whole run); the
        # caller surfaces the start/end disagreement separately
        probe = sum(vals) / len(vals) if vals else None
        if len(vals) == 2 and min(vals) > 0:
            _load.last_disagreement = round(max(vals) / min(vals), 2)
        return queries, probe
    # legacy driver record (no `parsed`): per-query pairs live in the
    # truncated `tail`. Scan ONLY inside the "queries" object when the
    # marker survives truncation, so run-level numeric fields (runs,
    # spread_ratio_med, sf, value, ...) can't pollute the query map.
    if isinstance(obj, dict) and "tail" in obj:
        tail = obj["tail"]
        start = tail.find('"queries"')
        region = tail[start:] if start >= 0 else tail
        end_brace = region.find("}")
        if start >= 0 and end_brace >= 0:
            region = region[: end_brace + 1]
        for m in re.finditer(r'"([a-z_0-9]+)":\s*([0-9.]+)', region):
            queries[m.group(1)] = float(m.group(2))
        probes = []
        for key in ("start", "end"):
            m = re.search(rf'"{key}":\s*([0-9.]+)', tail)
            if m:
                probes.append(float(m.group(1)))
        # MEAN, matching the bench-line branch and the README rule
        probe = sum(probes) / len(probes) if probes else None
        if len(probes) == 2 and min(probes) > 0:
            _load.last_disagreement = round(max(probes) / min(probes), 2)
        m = re.search(r'"shelf":\s*\[([^\]]*)\]', tail)
        if m:
            _load.last_shelf = re.findall(r'"([^"]+)"', m.group(1))
        for drop in (
            "n", "rc", "cpus", "sf", "value", "start", "end",
            "runs", "spread_ratio_med",
        ):
            queries.pop(drop, None)
        return queries, probe
    raise SystemExit(f"{path}: not a bench JSON line or driver record")


def compare(
    old_path: str, new_path: str, threshold: float = 1.0
) -> dict:
    """The comparison as a dict — the library entry remeasure.py and
    the CLI share."""
    old_q, old_p = _load(old_path)
    old_dis = getattr(_load, "last_disagreement", None)
    old_shelf = set(getattr(_load, "last_shelf", []))
    new_q, new_p = _load(new_path)
    new_dis = getattr(_load, "last_disagreement", None)
    new_shelf = set(getattr(_load, "last_shelf", []))
    machine = (
        (new_p / old_p) if old_p and new_p else 1.0
    )  # no probes -> raw comparison, flagged below
    # the regression gate and geomean read the STABLE CORE only:
    # either side's new-entry shelf is excluded, so cross-round
    # numbers compare code changes, not list growth (a first baseline
    # has no old max to clear) — bench.py "SHELF"
    shelf = old_shelf | new_shelf
    shared = sorted(
        k for k in old_q if k in new_q and old_q[k] > 0 and k not in shelf
    )
    ratios = {
        k: round((new_q[k] / old_q[k]) / machine, 3) for k in shared
    }
    regressions = {
        k: v for k, v in ratios.items() if v > threshold
    }
    geomean = (
        round(
            math.exp(sum(math.log(v) for v in ratios.values()) / len(ratios)),
            3,
        )
        if ratios
        else None
    )
    noisy = any(d and d > 1.5 for d in (old_dis, new_dis))
    return {
        "machine_factor": round(machine, 3),
        "calibrated": bool(old_p and new_p),
        "probe_disagreement": {"old": old_dis, "new": new_dis},
        "noisy": noisy,  # load shifted >1.5x mid-run on a side --
                         # treat per-query ratios as indicative only
        "n_shared": len(shared),
        "geomean_normalized": geomean,
        "regressions": dict(
            sorted(regressions.items(), key=lambda x: -x[1])
        ),
        "added": sorted(k for k in new_q if k not in old_q),
        "removed": sorted(k for k in old_q if k not in new_q),
        "shelf_excluded": sorted(shelf & set(old_q) & set(new_q)),
        # raw per-query medians + probes, for downstream standalone
        # re-measures (remeasure.py normalizes against a fresh probe)
        "old_medians": {k: old_q[k] for k in shared},
        "new_medians": {k: new_q[k] for k in shared},
        "old_probe": old_p,
        "new_probe": new_p,
    }


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("old")
    p.add_argument("new")
    p.add_argument(
        "--threshold",
        type=float,
        default=1.0,
        help="normalized ratio above which a regression is real "
        "(1.0 = any slowdown beyond the machine's own)",
    )
    args = p.parse_args(argv)
    out = compare(args.old, args.new, args.threshold)
    # the raw median maps are remeasure.py plumbing, not review output
    out = {
        k: v for k, v in out.items()
        if k not in ("old_medians", "new_medians", "old_probe", "new_probe")
    }
    print(json.dumps(out))
    return 1 if out["regressions"] else 0


if __name__ == "__main__":
    sys.exit(main())
