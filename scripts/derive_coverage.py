"""Re-derive COVERAGE.md's driver-status marks from CORRECTNESS artifacts.

Marks are never hand-written: this script scans every CORRECTNESS_r*.json
at the repo root, takes the row from the HIGHEST round that mentions each
query, and rewrites the mark that follows each backticked query name in
COVERAGE.md:

    `query_name` ✓r3   -- green driver row in round 3 (rows+schema+hash)
    `query_name` ✗r3   -- red driver row in round 3
    `query_name`       -- no driver row in any round (local parity only)

Run after each round's CORRECTNESS file lands:  python scripts/derive_coverage.py
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_status() -> dict[str, str]:
    rounds: list[tuple[int, str]] = []
    for f in os.listdir(ROOT):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", f)
        if m:
            rounds.append((int(m.group(1)), os.path.join(ROOT, f)))
    status: dict[str, str] = {}
    for n, path in sorted(rounds):  # later rounds overwrite earlier ones
        with open(path) as fh:
            data = json.load(fh)
        for name, row in data.items():
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and row.get("err") is None
            )
            status[name] = f"{'✓' if ok else '✗'}r{n}"
    return status


def main() -> None:
    status = load_status()
    cov_path = os.path.join(ROOT, "COVERAGE.md")
    with open(cov_path) as fh:
        text = fh.read()

    names = sorted(status, key=len, reverse=True)
    changed = 0
    for name in names:
        # `name` optionally followed by an existing mark (✓ / ✗ / ✓rN ...)
        pat = re.compile(rf"`{re.escape(name)}`(\s*[✓✗](?:r\d+)?)?")
        new = f"`{name}` {status[name]}"
        text, n = pat.subn(new, text)
        changed += n
    with open(cov_path, "w") as fh:
        fh.write(text)
    greens = sum(1 for v in status.values() if v.startswith("✓"))
    reds = len(status) - greens
    print(f"marked {changed} mentions of {len(status)} driver-checked queries "
          f"({greens} green, {reds} red)")


if __name__ == "__main__":
    sys.exit(main())
