#!/usr/bin/env python3
"""Structural diff of two plan-snapshot directories (golden_plans/ or a
Verify run's plans/). Same normalization as PlanSnapshotSpec: the formatted
tree reduced to its operator-name sequence, so attribute ids and statistics
don't produce noise. Exit 1 when any query's plan shape changed.

Usage: plan_diff.py <old_dir> <new_dir>
"""
import re
import sys
from pathlib import Path


def signature(text: str):
    out = []
    for line in text.splitlines():
        if line.startswith("(1)"):
            break  # details section
        line = re.sub(r"^[+:\-\s|]*", "", line)
        if not line or line == "== Physical Plan ==":
            continue
        out.append(re.sub(r"\(\d+\)$", "", line).strip())
    return [l for l in out if l]


def main(old_dir: str, new_dir: str) -> int:
    old, new = Path(old_dir), Path(new_dir)
    old_files = {p.stem: p for p in old.glob("*.txt") if ".final" not in p.name}
    new_files = {p.stem: p for p in new.glob("*.txt") if ".final" not in p.name}
    drifted, added, removed = [], sorted(new_files - old_files.keys()), sorted(
        old_files - new_files.keys())
    for name in sorted(old_files.keys() & new_files.keys()):
        a = signature(old_files[name].read_text())
        b = signature(new_files[name].read_text())
        if a != b:
            drifted.append(name)
            print(f"[DRIFT] {name}")
            print(f"  old: {' | '.join(a)}")
            print(f"  new: {' | '.join(b)}")
    for n in added:
        print(f"[NEW]   {n}")
    for n in removed:
        print(f"[GONE]  {n}")
    print(f"\n{len(drifted)} drifted, {len(added)} new, {len(removed)} gone, "
          f"{len(old_files.keys() & new_files.keys()) - len(drifted)} unchanged")
    return 1 if drifted or removed else 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
