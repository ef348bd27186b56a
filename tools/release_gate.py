"""One-command release gate (round-9 VERDICT stretch #7).

Collapses the three manual pre-commit gates the README describes into
a single command a future round can't forget:

1. the full Spark-vs-DuckDB oracle differential at sf0.001,
2. the same differential at sf0.01 (the two-scale discipline
   established in round 9 — a query or oracle carrying a
   scale-coupled assumption passes one scale and fails the other),
3. the generated-inventory freshness tests (tests/test_docs_sync.py —
   OPMAP.md / PLANS.md regenerated in step with the registry).

Each step runs as a subprocess so a crashed Spark/DuckDB session in
one step can't poison the next; the gate streams each step's own
output and exits non-zero if ANY step fails.

Usage: python tools/release_gate.py [sf_dir ...]
  (sf_dir args override the default two certification scales — e.g.
  a single dir for a quick pre-push check.)
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_SCALES = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


def main() -> int:
    scales = sys.argv[1:] or list(DEFAULT_SCALES)
    steps: list[tuple[str, list[str]]] = [
        (
            f"oracle differential @ {os.path.basename(d) or d}",
            [sys.executable, "tools/check_oracle.py", d],
        )
        for d in scales
    ]
    steps.append(
        (
            "generated-doc freshness (tests/test_docs_sync.py)",
            [sys.executable, "-m", "pytest", "tests/test_docs_sync.py",
             "-q"],
        )
    )

    failed: list[str] = []
    for label, cmd in steps:
        print(f"== release gate: {label} ==", flush=True)
        t0 = time.time()
        rc = subprocess.call(cmd, cwd=ROOT)
        status = "OK" if rc == 0 else f"FAIL rc={rc}"
        print(
            f"== release gate: {label}: {status} "
            f"[{time.time() - t0:.0f}s] ==",
            flush=True,
        )
        if rc:
            failed.append(label)

    if failed:
        print(f"RELEASE GATE FAILED ({len(failed)}): " + "; ".join(failed))
        return 1
    print(
        f"RELEASE GATE GREEN: {len(scales)}-scale oracle differential "
        "+ docs sync"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
