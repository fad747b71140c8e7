"""Codegen-fallback gate: run registry queries through the oracle
sweep in a SUBPROCESS and fail if the JVM logged any whole-stage
codegen compile failure ("ERROR CodeGenerator ... Failed to compile").

Spark's fallback makes these failures SILENT — the query still
answers correctly, interpreted, at a large multiple of the codegen
cost — so a correctness sweep alone never sees them. The only
reliable, version-stable signal is the driver-side ERROR log line, so
this gate re-execs the sweep with stderr captured (the JVM inherits
the Python process's stderr) and greps.

Usage:
    python tools/codegen_gate.py [sf_dir] [query ...]

With no queries: the full registry (slow — the per-round sweep).
Exit 0 = sweep green AND zero codegen compile failures.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys


def run_gate(sf_dir: str, queries: list[str]) -> tuple[int, int, str]:
    """Returns (sweep_exit_code, n_codegen_failures, stderr_tail)."""
    here = os.path.dirname(os.path.abspath(__file__))
    cmd = [sys.executable, os.path.join(here, "check_oracle.py"), sf_dir,
           *queries]
    proc = subprocess.run(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=os.path.dirname(here),
    )
    n_fail = len(re.findall(
        r"ERROR CodeGenerator: Failed to compile", proc.stderr))
    sys.stdout.write(proc.stdout)
    return proc.returncode, n_fail, proc.stderr[-2000:]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    queries = sys.argv[2:]
    code, n_fail, tail = run_gate(sf_dir, queries)
    if code != 0:
        print(f"codegen_gate: sweep FAILED (exit {code})")
        print(tail)
        return code
    if n_fail:
        print(f"codegen_gate: {n_fail} whole-stage codegen compile "
              "failure(s) — queries fell back to interpreted mode; "
              "re-run with stderr visible and stage the offending "
              "expressions (see operators/layout._dilate for the "
              "pattern)")
        return 3
    print("codegen_gate: sweep green, zero codegen fallbacks")
    return 0


if __name__ == "__main__":
    sys.exit(main())
