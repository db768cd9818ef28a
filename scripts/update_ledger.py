#!/usr/bin/env python3
"""Regenerate ledger.LAST_CHECKED from the driver's CORRECTNESS_r*.json.

Run once per round, after the driver publishes CORRECTNESS_r{N}.json:

    python scripts/update_ledger.py

Rewrites the LAST_CHECKED literal in live_data_spark/ledger.py in place
(name -> most recent round whose row hash-matched, or — for no-oracle
entries — whose rows-only check ran). Also prints names that should be
REMOVED from CHANGED_SINCE_CHECK (re-checked green since their edit) and
names whose latest row is red (candidates for RED). Those two tuples stay
hand-maintained: the script cannot know when code was edited, and a red
row needs a human-confirmed fix before it leaves RED.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
LEDGER = REPO / "live_data_spark" / "ledger.py"


def collect() -> tuple[dict[str, tuple[int, str]], dict[str, int]]:
    """last_ok: name -> (round, kind) of the MOST RECENT green row, where
    kind is 'hash' (oracle hash-matched) or 'rows' (rows-only check ran).
    The kind travels into ledger.LAST_CHECKED so check_order can treat
    stale rows-only evidence on a since-promoted oracle entry as
    never-checked (no manual CHANGED_SINCE_CHECK append needed)."""
    last_ok: dict[str, tuple[int, str]] = {}
    last_red: dict[str, int] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f.name)
        rnd = int(m.group(1))
        for name, row in json.loads(f.read_text()).items():
            if row.get("hash_match") is True:
                kind = "hash"
            elif row.get("err") == "no_oracle":
                kind = "rows"
            else:
                last_red[name] = max(last_red.get(name, 0), rnd)
                continue
            if name not in last_ok or rnd >= last_ok[name][0]:
                last_ok[name] = (rnd, kind)
    return last_ok, last_red


def main() -> int:
    last_ok, last_red = collect()

    src = LEDGER.read_text()
    body = "".join(
        f'    "{n}": ({r}, "{k}"),\n'
        for n, (r, k) in sorted(last_ok.items(), key=lambda kv: (kv[1][0], kv[0]))
    )
    new_src, n_subs = re.subn(
        r"(LAST_CHECKED: dict\[str, tuple\[int, str\]\] = \{\n).*?(\})",
        r"\g<1>" + body + r"\g<2>",
        src,
        flags=re.S,
    )
    if n_subs != 1:
        print("ERROR: LAST_CHECKED literal not found in ledger.py", file=sys.stderr)
        return 1
    LEDGER.write_text(new_src)
    print(f"LAST_CHECKED rewritten: {len(last_ok)} entries")

    sys.path.insert(0, str(REPO))  # `python scripts/update_ledger.py` puts scripts/, not the repo, on sys.path
    from live_data_spark import ledger  # noqa: E402  (import after rewrite is fine: values below come from collect())

    still_red = [n for n, r in last_red.items() if last_ok.get(n, (0, ""))[0] < r]
    clear_changed = [n for n in ledger.CHANGED_SINCE_CHECK if n in last_ok]
    clear_red = [n for n in ledger.RED if n not in still_red and n in last_ok]
    if still_red:
        print(f"latest row RED (keep/add in ledger.RED): {still_red}")
    if clear_red:
        print(f"re-checked green — REMOVE from RED: {clear_red}")
    if clear_changed:
        print(f"re-checked — consider removing from CHANGED_SINCE_CHECK (if no edits since): {clear_changed}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
