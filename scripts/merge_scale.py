#!/usr/bin/env python3
"""Merge per-run ScaleBench artifacts into the cumulative record.

Usage: merge_scale.py TARGET.json SOURCE.json [SOURCE2.json ...]

Each source's `queries` entries overwrite the target's (a re-measurement
supersedes the old row); methodology fields (factor/passes/base/scaled)
must agree with the target or the source is rejected — artifacts at
different factors belong in different files.
"""
import json
import sys


def main() -> int:
    target_path, sources = sys.argv[1], sys.argv[2:]
    with open(target_path) as f:
        target = json.load(f)
    for src_path in sources:
        with open(src_path) as f:
            src = json.load(f)
        for key in ("metric", "factor"):
            if src.get(key) != target.get(key):
                print(f"REJECT {src_path}: {key} {src.get(key)!r} != "
                      f"{target.get(key)!r}")
                return 1
        target["queries"].update(src["queries"])
    with open(target_path, "w") as f:
        json.dump(target, f, separators=(",", ":"))
        f.write("\n")
    print(f"merged {len(sources)} source(s) -> {target_path} "
          f"({len(target['queries'])} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
