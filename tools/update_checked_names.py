"""Regenerate ``registry._DRIVER_CHECKED`` from CORRECTNESS_r*.json.

Run at the start of each round (after the driver writes the previous
round's CORRECTNESS file) and paste the emitted block over the existing
``_DRIVER_CHECKED`` literal in ``registry.py``; it also prints which
``_FRONT`` entries are now checked and safe to rotate out.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            seen |= set(json.load(f))
    names = sorted(seen)
    print(f"# {len(names)} driver-checked names")
    print("_DRIVER_CHECKED: frozenset[str] = frozenset((")
    for i in range(0, len(names), 3):
        print("    " + " ".join(f'"{n}",' for n in names[i : i + 3]))
    print("))")

    sys.path.insert(0, REPO)
    from ml_feature_store_enterprise_grade_spark import registry

    registry.load_all()
    rotatable = [n for n in registry._FRONT if n in seen]
    pending = [n for n in registry._FRONT if n not in seen]
    print(f"\n# _FRONT entries already checked (rotatable): {len(rotatable)}")
    print(f"# _FRONT entries still awaiting a driver row: {pending}")
    if registry.DEFERRED_QUERIES:
        print(f"# deferred queries awaiting promotion: {list(registry.DEFERRED_QUERIES)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
