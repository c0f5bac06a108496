"""Generate REGISTRY.md — the full query-registry inventory.

One row per ``__spark_entry__.queries()`` entry: implementing module
and function, whether a DuckDB oracle twin exists, whether the query
sits in the driver's 50-entry correctness window, the query's driver
CORRECTNESS history (from the per-round CORRECTNESS_r*.json files),
and the first docstring line. Run after adding queries:

    python tools/inventory.py            # warns on coverage gaps
    python tools/inventory.py --strict   # exit 1 on coverage gaps

A coverage gap is an oracle-able query that has NEVER held a driver
CORRECTNESS row and is NOT in the current window — exactly the silent
growth that reached 9 driver-unseen queries by round 6.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def driver_history(through: int | None = None) -> dict[str, list[tuple[str, bool]]]:
    """query -> [(round, green), ...] from CORRECTNESS_r*.json files.

    ``through`` limits history to rounds <= through — used by the
    staleness test to recount totals as of the round REGISTRY.md
    says it was generated at (the driver runs post-commit, so at
    judging time the newest CORRECTNESS file legitimately postdates
    the committed registry by exactly one round)."""
    hist: dict[str, list[tuple[str, bool]]] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = f.rsplit("_r", 1)[1].split(".")[0]
        if through is not None and int(rnd) > through:
            continue
        with open(f) as fh:
            for q, r in json.load(fh).items():
                ok = bool(
                    r.get("rows_match")
                    and r.get("schema_match")
                    and r.get("hash_match")
                )
                hist.setdefault(q, []).append((rnd, ok))
    return hist


def current_round() -> int:
    """The round now being built = latest CORRECTNESS file's round + 1."""
    rounds = [
        int(f.rsplit("_r", 1)[1].split(".")[0])
        for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    ]
    return (max(rounds) + 1) if rounds else 1


_LEDGER_PATH = os.path.join(REPO, "tools", "registry_ledger.json")


def _update_ledger(registry_names) -> dict[str, int]:
    """query -> round it first appeared in the registry. Persisted so
    the staleness check below has a registration age to reason about;
    queries are added on first sight, never removed (a deregistered
    query simply stops being checked)."""
    ledger: dict[str, int] = {}
    if os.path.exists(_LEDGER_PATH):
        with open(_LEDGER_PATH) as f:
            ledger = json.load(f)
    rnd = current_round()
    new = [q for q in registry_names if q not in ledger]
    if new:
        # backfill: a query with driver history predates the ledger —
        # its first CORRECTNESS round bounds its registration round
        hist = driver_history()
        for q in new:
            seen = [int(r) for r, _ in hist.get(q, [])]
            ledger[q] = min(seen) if seen else rnd
        tmp = _LEDGER_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(ledger, f, indent=0, sort_keys=True)
        os.replace(tmp, _LEDGER_PATH)
    return ledger


def stale_unrotated() -> list[str]:
    """HARD-CHECK input (tools/check.py fails on a non-empty result):
    oracle-able queries registered 2+ rounds ago that have never held
    a green driver CORRECTNESS row and are not queued in the current
    50-entry window — i.e. rotation has been forgotten for at least
    one full round. New queries get a one-round grace period (the
    window may legitimately be full the round they land)."""
    import __spark_entry__ as entry

    registry = entry.queries()
    oracles = entry.oracle_sql()
    window = set(list(registry)[:50])
    hist = driver_history()
    ledger = _update_ledger(list(registry))
    rnd = current_round()
    return sorted(
        q
        for q in registry
        if q in oracles
        and not any(ok for _, ok in hist.get(q, []))
        and q not in window
        and rnd - ledger.get(q, rnd) >= 2
    )


def main() -> int:
    strict = "--strict" in sys.argv

    import __spark_entry__ as entry

    registry = entry.queries()
    oracles = entry.oracle_sql()
    window = set(list(registry)[:50])
    hist = driver_history()

    def driver_cell(name: str) -> str:
        h = hist.get(name, [])
        greens = [rnd for rnd, ok in h if ok]
        if greens:
            return f"r{greens[-1]}" + (f" (x{len(greens)})" if len(greens) > 1 else "")
        if h:
            return f"RED r{h[-1][0]}"
        return "never"

    # the staleness guard: oracle-able, never driver-checked, not queued
    gaps = sorted(
        q
        for q in registry
        if q in oracles
        and not any(ok for _, ok in hist.get(q, []))
        and q not in window
    )

    n_green_ever = sum(
        1 for q in registry if any(ok for _, ok in hist.get(q, []))
    )
    through = current_round() - 1
    lines = [
        "# REGISTRY — query inventory",
        "",
        # machine-readable totals: tests/test_tools.py recomputes these
        # from the CORRECTNESS files + live registry and fails loudly
        # when the committed REGISTRY.md predates the newest driver
        # round (the r11 staleness: generated pre-run, showed 177)
        f"<!-- totals: queries={len(registry)} "
        f"oracles={sum(1 for k in registry if k in oracles)} "
        f"green_ever={n_green_ever} through_round={through} -->",
        "",
        "Generated by `tools/inventory.py`. One row per "
        "`__spark_entry__.queries()` entry; `oracle` = has a DuckDB SQL "
        "twin (hash-checked by `tools/check.py` and the driver), "
        "`window` = inside the driver's 50-entry correctness window "
        "this round, `driver` = latest round with a green driver "
        "CORRECTNESS row (xN = green in N rounds). Rows-only entries "
        "(no SQL twin by design) are covered by pytest cross-checks "
        "instead.",
        "",
        f"Totals: {len(registry)} queries, "
        f"{sum(1 for k in registry if k in oracles)} with oracle twins, "
        f"{len(window)} in the driver window, "
        f"{n_green_ever} with at least one green driver row "
        f"(driver history through round {through}).",
        "",
    ]
    if gaps:
        lines += [
            "**DRIVER-COVERAGE GAPS** — oracle-able queries that have "
            "never held a driver row and are not in the current window "
            "(rotate these in next round): "
            + ", ".join(f"`{q}`" for q in gaps),
            "",
        ]
    else:
        lines += [
            "Driver-coverage ledger: every oracle-able query has either "
            "held a green driver row or sits in the current window.",
            "",
        ]
    lines += [
        "| query | implementation | oracle | window | driver | summary |",
        "|---|---|---|---|---|---|",
    ]
    for name, fn in registry.items():
        doc = (fn.__doc__ or "").strip().splitlines()
        summary = doc[0].strip() if doc else ""
        if len(summary) > 90:
            summary = summary[:87] + "..."
        summary = summary.replace("|", "\\|")
        impl = f"`{fn.__module__}.{fn.__name__}`"
        lines.append(
            f"| {name} | {impl} | {'y' if name in oracles else 'rows-only'} "
            f"| {'y' if name in window else ''} | {driver_cell(name)} "
            f"| {summary} |"
        )
    out = os.path.join(REPO, "REGISTRY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(registry)} rows)")
    if gaps:
        print(
            f"WARNING: {len(gaps)} oracle-able queries never driver-checked "
            f"and not in the window: {', '.join(gaps)}"
        )
        return 1 if strict else 0
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
