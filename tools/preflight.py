"""Pre-snapshot gate: the full test suite AND the full oracle sweep
must be green before an end-of-round commit ships.

Exists because round 3's final commit landed a schema refactor with
three call sites un-migrated — caught only after the snapshot.  Run:

    python tools/preflight.py            # pytest + check at sf0.01
    python tools/preflight.py --fast     # pytest only

Exits nonzero on ANY failing test or oracle mismatch.
"""

from __future__ import annotations

import subprocess
import sys
import time

REPO = "/root/repo"


def run(label: str, cmd: list[str]) -> bool:
    print(f"== preflight: {label}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO)
    dt = time.time() - t0
    status = "OK" if proc.returncode == 0 else f"FAIL (rc={proc.returncode})"
    print(f"== preflight: {label}: {status} [{dt:.0f}s]", flush=True)
    return proc.returncode == 0


def main() -> int:
    fast = "--fast" in sys.argv
    steps = [("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"])]
    if not fast:
        steps.append(
            (
                "oracle sweep",
                [sys.executable, "tools/check.py", "/root/testdata/sf0.01"],
            )
        )
    ok = True
    for label, cmd in steps:
        ok = run(label, cmd) and ok
    print(f"== preflight: {'GREEN' if ok else 'RED'}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
