"""SURVEY.md §0 re-verification checklist, automated.

The reference mount `/root/reference` has been EMPTY every round (survey,
round 1, 2, 3). The moment it populates, this script runs the §0 checklist
mechanically and prints a worklist for the parity pass (VERDICT round-2
item 9 / round-3 task #1), so no session has to re-derive it:

1. full file inventory + LoC, diffed against SURVEY §2's expected names
2. module-name resolution (models_*.py vs networks_*.py, utils.py vs
   percivaltts.py, critic location)
3. native-binary scan (checklist item 5: REAPER or other f0 executables)
4. hyperparameter grep (WGAN-GP lambda/n_critic/betas, feature dims)
5. tests/ directory listing (checklist 6)
6. README/docs benchmark-number grep (checklist 7)

Run: PYTHONPATH=.:$PYTHONPATH python scripts/ref_checklist.py
Read-only with respect to /root/reference.
"""

import os
import re
import sys

# override for testing the populated-mount path (e.g. on a fixture tree)
REF = os.environ.get("REF_ROOT", "/root/reference")

# SURVEY §2 expected files, with the name alternatives §0 flags for
# resolution. Each entry: (component, [candidate relpaths/globs]).
EXPECTED = [
    ("core utils/config", ["percivaltts/utils.py", "percivaltts/percivaltts.py"]),
    ("vocoder layer", ["percivaltts/vocoders.py"]),
    ("PML vocoder (vendored)", ["percivaltts/external/pulsemodel"]),
    ("merlin label normalisation", ["percivaltts/external/merlin/label_normalisation.py"]),
    ("feature composition", ["percivaltts/compose.py"]),
    ("data loading", ["percivaltts/data.py"]),
    ("model base", ["percivaltts/modeltts.py", "percivaltts/model.py"]),
    ("generator basic", ["percivaltts/models_basic.py", "percivaltts/networks_basic.py"]),
    ("generator cnn", ["percivaltts/models_cnn.py", "percivaltts/networks_cnn.py"]),
    ("critic", ["percivaltts/models_critic.py", "percivaltts/optimizertts_wgan.py"]),
    ("trainer LSE", ["percivaltts/optimizertts.py"]),
    ("trainer WGAN", ["percivaltts/optimizertts_wgan.py"]),
    ("experiment driver", ["percivaltts/run.py", "percivaltts/clone.sh", "percivaltts/setenv.sh"]),
    ("tests", ["tests"]),
    ("build/CI", ["Makefile", "setup.py", ".travis.yml"]),
]

HYPERPARAM_PATTERNS = [
    (r"n_critic|ncritic|critic_it", "n_critic"),
    (r"lambda|gp_?weight|gradient_?penalty", "GP lambda"),
    (r"beta_?1|beta1|adam", "Adam betas"),
    (r"0\.5\s*,\s*0\.9|\.5,\s*\.9", "WGAN-GP beta literals"),
    (r"spec_size|specsize|dftlen", "spec dims"),
    (r"nm_size|nmsize|noise.?mask", "nm dims"),
]


def main() -> int:
    if not os.path.isdir(REF):
        print(f"{REF}: not a directory — mount absent")
        return 1
    files = []
    for root, _dirs, names in os.walk(REF):
        for n in names:
            p = os.path.join(root, n)
            rel = os.path.relpath(p, REF)
            try:
                loc = sum(1 for _ in open(p, "rb"))
            except OSError:
                loc = -1
            files.append((rel, loc))
    if not files:
        print(f"{REF}: EMPTY — still nothing to verify (checked "
              f"{len(files)} files). SURVEY §0 stands.")
        return 1

    print(f"=== inventory: {len(files)} files, "
          f"{sum(l for _, l in files if l > 0)} total lines ===")
    for rel, loc in sorted(files):
        print(f"{loc:6d}  {rel}")

    print("\n=== SURVEY §2 name resolution ===")
    relset = {rel for rel, _ in files}
    reldirs = {os.path.dirname(rel) for rel in relset} | {
        d for rel in relset for d in [rel.split("/")[0]]
    }
    for comp, cands in EXPECTED:
        hits = [c for c in cands if c in relset or c in reldirs or any(
            r.startswith(c + "/") or r == c for r in relset)]
        mark = "OK " if hits else "MISS"
        print(f"[{mark}] {comp}: {hits or cands}")

    print("\n=== native binaries / shell-outs (checklist 5) ===")
    native = [rel for rel, _ in files if re.search(
        r"\.(c|cc|cpp|cu|rs|so|pyx)$|reaper|REAPER", rel)]
    print(native or "none found by name")
    for rel, _ in files:
        if rel.endswith(".py"):
            try:
                txt = open(os.path.join(REF, rel), errors="ignore").read()
            except OSError:
                continue
            for m in re.finditer(
                r"(subprocess\.\w+|os\.system|os\.popen|Popen|check_call|check_output)\s*\(",
                txt,
            ):
                print(f"  shell-out in {rel}: ...{txt[max(0,m.start()-40):m.end()+60]!r}")

    print("\n=== hyperparameters (checklist 4) ===")
    for rel, _ in files:
        if not rel.endswith(".py"):
            continue
        try:
            lines = open(os.path.join(REF, rel), errors="ignore").readlines()
        except OSError:
            continue
        for i, line in enumerate(lines, 1):
            for pat, label in HYPERPARAM_PATTERNS:
                if re.search(pat, line, re.I) and re.search(r"=\s*[\d.]", line):
                    print(f"  [{label}] {rel}:{i}: {line.strip()[:100]}")
                    break

    print("\n=== benchmark numbers in docs (checklist 7) ===")
    found = False
    for rel, _ in files:
        if re.search(r"readme|\.md$|\.rst$|\.txt$", rel, re.I):
            try:
                txt = open(os.path.join(REF, rel), errors="ignore").read()
            except OSError:
                continue
            for m in re.finditer(
                r".{0,60}(MCD|RMSE|frames?/s|it/s|epoch time|benchmark).{0,60}",
                txt, re.I,
            ):
                print(f"  {rel}: {m.group(0).strip()!r}")
                found = True
    if not found:
        print("  none — BASELINE.md's 'not published' rows stand")

    print("\nNEXT (pre-empts all other work per VERDICT): wc/cite SURVEY §2, "
          "regenerate tests/golden from reference features, run `cli "
          "measures` ref-vs-pred, record parity rows in BASELINE.md.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
