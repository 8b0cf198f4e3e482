#!/usr/bin/env python
"""Batch experiment driver + result aggregation.

The analog of the reference's experiment tooling (scripts/runPUTSLAM.py:15-40
— iterate over ``configs/*`` preset directories, copy each over resources/,
run demoMatching, evaluate ATE/RPE — and scripts/summarizeResults.py:16-30,
which aggregates the per-run RMSEs into ``resultSummary``). Here each preset
directory is loaded directly as an operating point (no copy step) and the
engine runs in-process.

Usage:
    # sweep every preset under CONFIGS (each a reference-style resources/
    # directory of XML files) over one dataset or a synthetic sequence
    python tools/run_experiments.py --configs CONFIGS \
        [--dataset /data/fr1_desk | --synthetic 60] --out results/

Writes one subdirectory per preset (the usual trajectory/fps/times outputs)
plus ``resultSummary.json`` with per-preset ATE/RPE/fps and min/mean/max
aggregates.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def discover_presets(configs_dir: str):
    """Preset = any subdirectory containing at least one putslam*.xml (the
    reference's configs/<name>/ layout); the configs dir itself counts if it
    holds the XMLs directly."""
    presets = []
    if any(f.startswith("putslam") and f.endswith(".xml")
           for f in os.listdir(configs_dir)):
        presets.append(("default", configs_dir))
    for name in sorted(os.listdir(configs_dir)):
        sub = os.path.join(configs_dir, name)
        if os.path.isdir(sub) and any(
                f.startswith("putslam") and f.endswith(".xml")
                for f in os.listdir(sub)):
            presets.append((name, sub))
    return presets


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", required=True,
                    help="directory of preset resources/ directories")
    ap.add_argument("--dataset", default=None)
    ap.add_argument("--dataset-name", default=None,
                    help="datasetConfig/<name>.xml inside each preset")
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--out", default="results")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from putslam_tpu import run as run_mod

    presets = discover_presets(args.configs)
    if not presets:
        print(f"no presets found under {args.configs}", file=sys.stderr)
        return 1

    summary = {}
    for name, path in presets:
        out_dir = os.path.join(args.out, name)
        cli = ["--reference-resources", path, "--out", out_dir,
               "--seed", str(args.seed)]
        if args.dataset_name:
            cli += ["--dataset-name", args.dataset_name]
        if args.dataset:
            cli += ["--dataset", args.dataset]
        else:
            cli += ["--synthetic", str(args.synthetic or 60)]
        print(f"== preset {name} ({path})", file=sys.stderr, flush=True)
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = run_mod.main(cli)
        line = [l for l in buf.getvalue().splitlines() if l.startswith("{")]
        report = json.loads(line[-1]) if line else {}
        report["returncode"] = rc
        summary[name] = report
        print(json.dumps({name: report}), file=sys.stderr, flush=True)

    # aggregate (summarizeResults.py analog)
    def agg(key):
        vals = [r[key] for r in summary.values() if key in r]
        if not vals:
            return None
        return {"min": min(vals), "max": max(vals),
                "mean": sum(vals) / len(vals), "n": len(vals)}

    result = {
        "presets": summary,
        "aggregate": {k: agg(k) for k in
                      ("ate_rmse_m", "ate_before_final_m", "rpe_trans_m",
                       "rpe_rot_rad", "fps")},
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "resultSummary.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["aggregate"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
