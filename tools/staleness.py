"""Driver-row staleness ledger: which round last green-checked each query.

Unions every ``CORRECTNESS_r*.json`` in the repo root and prints one
line per registry query: latest green round, latest red round (if
any), and a NEVER marker for queries with no driver row yet.  The
rotation planner (HEADLINE composition, see queries.py) retires the
oldest tail first; this script is the ledger that composition reads.

    python tools/staleness.py            # full ledger, oldest first
    python tools/staleness.py --queue 30 # next N rotation candidates
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from high_throughput_etl_pipeline_spark.queries import QUERIES  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def rows_of(path: str) -> dict:
    """Per-query status dict of one CORRECTNESS file; tolerate the two
    historical shapes ({"queries": {...}} and flat {...})."""
    try:
        data = json.load(open(path))
    except (OSError, json.JSONDecodeError):
        return {}
    if isinstance(data, dict) and isinstance(data.get("queries"), dict):
        data = data["queries"]
    return data if isinstance(data, dict) else {}


def is_green(entry) -> bool:
    """A green row = every recorded comparison matched.  Entries are
    dicts like {"rows_match": true, "schema_match": true,
    "values_match": true, ...} in current files; older files used
    {"status": "pass"}."""
    if isinstance(entry, dict):
        if "status" in entry:
            return str(entry["status"]).startswith(("pass", "ok"))
        checks = [
            v
            for k, v in entry.items()
            if k.endswith("_match") and v is not None
        ]
        return bool(checks) and all(checks)
    return False


def ledger() -> dict[str, dict]:
    out: dict[str, dict] = {
        n: {"green": None, "red": None} for n in QUERIES
    }
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else -1
        for name, entry in rows_of(path).items():
            if name not in out:
                continue  # renamed/retired query
            key = "green" if is_green(entry) else "red"
            cur = out[name][key]
            out[name][key] = rnd if cur is None else max(cur, rnd)
    return out


def main() -> None:
    queue_n = None
    if "--queue" in sys.argv:
        queue_n = int(sys.argv[sys.argv.index("--queue") + 1])
    led = ledger()

    def sort_key(item):
        name, st = item
        g = st["green"]
        return (g is not None, g if g is not None else 0, name)

    items = sorted(led.items(), key=sort_key)
    if queue_n is not None:
        items = items[:queue_n]
    never = reds = 0
    for name, st in items:
        g, r = st["green"], st["red"]
        tag = f"r{g:02d}" if g is not None else "NEVER"
        extra = ""
        if r is not None and (g is None or r > g):
            extra = f"  RED r{r:02d}"
            reds += 1
        if g is None:
            never += 1
        print(f"{tag}  {name}{extra}")
    print(
        f"# {len(led)} queries, {never} never-checked, "
        f"{reds} latest-red",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
