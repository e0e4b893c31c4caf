"""Query-fingerprint drift gate (round-5 process fix).

Round 4 shipped a semantic change to `text_stats` (n_bpe_tokens)
AFTER its last driver gate — green locally, but the driver had never
checked the shipped form. This tool makes that class of drift
mechanically impossible:

- QUERY_HASHES.json records, per registry query, an md5 fingerprint
  of (oracle SQL text + Spark query-function source) and the round
  whose driver gate window last covered that exact fingerprint.
- `check` (the default; also invoked by tools/plan_report.py and
  tools/compare_oracle.py) recomputes every fingerprint and FAILS if
  any query's fingerprint differs from the recorded one while the
  query is NOT inside the current first-WINDOW registry slice — i.e.
  a gated query changed outside its gate window.
- `update --round N` refreshes the recorded fingerprint/round for
  every in-window query and REFUSES to record an out-of-window
  change (run it when rotating the window for a new round).

The fingerprint is deliberately shallow (SQL string + top-level
function source, no Spark plan): it is cheap enough to run in every
local gate and catches exactly the failure mode observed — an edited
query/oracle shipping ungated. Library-level changes below the query
function are covered by the behavioral gates themselves
(tools/compare_oracle.py re-runs all queries against DuckDB every
round).

Usage:
    python tools/query_fingerprints.py            # check (exit 1 on drift)
    python tools/query_fingerprints.py update --round 5
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HASHES_PATH = os.path.join(REPO, "QUERY_HASHES.json")
WINDOW = 50  # the driver gates the first 50 _REGISTRY entries


def _fingerprints() -> dict[str, str]:
    import __spark_entry__ as entry

    out = {}
    for name, (fn, sql_fn) in entry._REGISTRY.items():
        sql = sql_fn() if sql_fn is not None else "<no-oracle>"
        src = inspect.getsource(fn)
        out[name] = hashlib.md5((sql + "\x1f" + src).encode()).hexdigest()
    return out


def _window_names() -> list[str]:
    import __spark_entry__ as entry

    return list(entry._REGISTRY)[:WINDOW]


def _load() -> dict:
    if not os.path.exists(HASHES_PATH):
        return {"window": WINDOW, "queries": {}}
    with open(HASHES_PATH) as f:
        return json.load(f)


def check() -> int:
    rec = _load()["queries"]
    cur = _fingerprints()
    window = set(_window_names())
    bad = []
    for name, md5 in cur.items():
        old = rec.get(name)
        if old is not None and old["md5"] == md5:
            continue
        if name in window:
            continue  # changed/new but scheduled for this round's gate
        why = "NEW" if old is None else "CHANGED"
        bad.append(f"  {name}: {why} since its round-{old['gated_round'] if old else '?'} "
                   f"gate but NOT in the current first-{WINDOW} window")
    for name in rec:
        if name not in cur:
            print(f"query_fingerprints: note — recorded query {name!r} no "
                  f"longer in the registry", file=sys.stderr)
    if bad:
        print("query_fingerprints: DRIFT — gated queries changed outside "
              "the gate window:\n" + "\n".join(bad), file=sys.stderr)
        print("fix: move them into the first-%d registry slice (or revert)"
              % WINDOW, file=sys.stderr)
        return 1
    n_changed = sum(1 for n, m in cur.items()
                    if rec.get(n, {}).get("md5") != m)
    print(f"query_fingerprints: OK — {len(cur)} queries, "
          f"{n_changed} changed-or-new (all inside the gate window)")
    return 0


def update(round_no: int) -> int:
    data = _load()
    rec = data["queries"]
    cur = _fingerprints()
    window = _window_names()
    refused = []
    for name, md5 in cur.items():
        old = rec.get(name)
        if name in window:
            rec[name] = {"md5": md5, "gated_round": round_no}
        elif old is None or old["md5"] != md5:
            refused.append(name)
    for name in [n for n in rec if n not in cur]:
        del rec[name]
    if refused:
        print("query_fingerprints: REFUSED to record out-of-window "
              f"changes: {refused} — rotate them into the window first",
              file=sys.stderr)
        return 1
    data["window"] = WINDOW
    with open(HASHES_PATH, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"query_fingerprints: recorded {len(window)} in-window queries "
          f"at round {round_no} ({len(rec)} total tracked)")
    return 0


def main() -> int:
    args = sys.argv[1:]
    if args and args[0] == "update":
        rnd = int(args[args.index("--round") + 1]) if "--round" in args else 0
        if rnd <= 0:
            print("usage: query_fingerprints.py update --round N",
                  file=sys.stderr)
            return 2
        return update(rnd)
    return check()


if __name__ == "__main__":
    sys.exit(main())
