#!/usr/bin/env python
"""Run the REFERENCE's own evaluation scripts on produced trajectories.

The reference's acceptance path scores TUM-format trajectories with
scripts/evaluate_ate.py and scripts/evaluate_rpe.py (invoked by
runPUTSLAM.py:36-40; Horn alignment + RMSE at evaluate_ate.py:47-133).
Those scripts are Python 2; this runner loads them VERBATIM from
/root/reference/scripts, applies only the mechanical 2→3 statement shims
(print statements → print()), and executes them with the caller's CLI
arguments. No reference code is copied into the repo — the scripts run
from their mounted location, so the numbers they print are the reference
toolchain's own.

Usage:
  python tools/run_reference_eval.py ate <groundtruth.txt> <trajectory.res> [args...]
  python tools/run_reference_eval.py rpe <groundtruth.txt> <trajectory.res> [args...]
"""

import os
import re
import subprocess
import sys
import tempfile

REF_SCRIPTS = "/root/reference/scripts"

_PRINT_STMT = re.compile(r"^(\s*)print (.+)$")
_DICT_KEYS = re.compile(r"\b([\w.]+)\.keys\(\)")


def _shim_py2(src: str) -> str:
    out = []
    for line in src.splitlines():
        # Python 2 allowed mixed tabs/spaces (tab = next multiple of 8);
        # expand leading whitespace to spaces so Python 3 accepts it
        body = line.lstrip("\t ")
        lead = line[:len(line) - len(body)].expandtabs(8)
        line = lead + body
        m = _PRINT_STMT.match(line)
        if m and not m.group(2).startswith("("):
            line = f"{m.group(1)}print({m.group(2)})"
        # py2 dict.keys() was a mutable list (associate.py .remove()s from it)
        line = _DICT_KEYS.sub(r"list(\1.keys())", line)
        out.append(line)
    return "\n".join(out) + "\n"


def run(kind: str, argv, capture: bool = False):
    script = {"ate": "evaluate_ate.py", "rpe": "evaluate_rpe.py"}[kind]
    with tempfile.TemporaryDirectory() as td:
        for name in (script, "associate.py"):
            with open(os.path.join(REF_SCRIPTS, name)) as f:
                src = f.read()
            with open(os.path.join(td, name), "w") as f:
                f.write(_shim_py2(src))
        env = dict(os.environ)
        env["MPLBACKEND"] = "Agg"
        proc = subprocess.run(
            [sys.executable, os.path.join(td, script)] + list(argv),
            capture_output=capture, text=True, env=env, cwd=td)
        if capture:
            return proc.returncode, proc.stdout, proc.stderr
        return proc.returncode


def evaluate(kind: str, gt_file: str, est_file: str, extra=()):
    """Programmatic entry: returns the script's stdout (float on the first
    line for the default non-verbose mode)."""
    # the scripts execute with cwd inside the temp dir — absolutize paths
    rc, out, err = run(kind, [os.path.abspath(gt_file),
                              os.path.abspath(est_file), *extra],
                       capture=True)
    if rc != 0:
        raise RuntimeError(f"reference {kind} eval failed: {err.strip()}")
    return out


if __name__ == "__main__":
    if len(sys.argv) < 2 or sys.argv[1] not in ("ate", "rpe"):
        print(__doc__)
        raise SystemExit(2)
    raise SystemExit(run(sys.argv[1], sys.argv[2:]))
