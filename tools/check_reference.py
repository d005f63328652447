#!/usr/bin/env python
"""SURVEY.md §0.1 verification checklist, automated.

The reference snapshot at /root/reference was EMPTY when this framework was
built; SURVEY.md's file map and several design hypotheses are tagged [R]
(reconstructed). Run this the moment the snapshot appears: it inventories
the tree, answers each §0.1 item mechanically where possible, and prints
the manual follow-ups (golden regeneration, loss formulation).

    python tools/check_reference.py [/root/reference]
"""

import os
import sys


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
    files = []
    for dirpath, _, names in os.walk(root):
        for n in names:
            p = os.path.join(dirpath, n)
            rel = os.path.relpath(p, root)
            try:
                loc = sum(1 for _ in open(p, "rb")) if n.endswith(".py") else None
            except OSError:
                loc = None
            files.append((rel, loc))

    if not files:
        print(f"{root} is still EMPTY — SURVEY.md §0 status unchanged.")
        return 1

    print(f"§0.1 item 1 — inventory ({len(files)} files):")
    for rel, loc in sorted(files):
        print(f"  {rel}" + (f"  ({loc} lines)" if loc else ""))

    # Item 2: framework detection.
    py = [rel for rel, _ in files if rel.endswith(".py")]
    kinds = {"tensorflow": 0, "keras": 0, "torch": 0}
    for rel in py:
        try:
            src = open(os.path.join(root, rel), errors="ignore").read()
        except OSError:
            continue
        for k in kinds:
            if f"import {k}" in src or f"from {k}" in src:
                kinds[k] += 1
    print(f"\n§0.1 item 2 — framework imports: {kinds}")

    # Items 3-5: where to look.
    def find(*needles):
        return [rel for rel in py if any(n in rel.lower() for n in needles)]

    print("\n§0.1 item 3 — loss formulation: inspect", find("train", "loss") or "(train scripts)")
    print("§0.1 item 4 — IEF/backbone/params: inspect", find("model", "network", "encoder", "ief") or "(model builder)")
    pkls = [rel for rel, _ in files if rel.endswith((".pkl", ".npz"))]
    print("§0.1 item 5 — SMPL asset files:", pkls or "(none found)")
    native = [rel for rel, _ in files if rel.endswith((".c", ".cc", ".cpp", ".cu", ".rs"))]
    print("§0.1 item 6 — native code:", native or "NONE (as [R] predicted)")
    print("§0.1 item 7 — README metrics: inspect",
          [rel for rel, _ in files if "readme" in rel.lower()] or "(no README)")

    print(
        "\nManual follow-ups: regenerate goldens from the real code "
        "(replace utils/oracle.py anchoring), diff hyperparameters into "
        "configs.py, and update SURVEY.md [R] tags with citations."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
