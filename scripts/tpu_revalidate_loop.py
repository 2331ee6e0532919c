"""Persistent wrapper around tpu_revalidate.py for an intermittent tunnel.

The axon tunnel wedges for tens of minutes at a time (observed rounds 3-4).
This loop re-invokes scripts/tpu_revalidate.py, each time running only the
steps that have not yet succeeded, and merges the per-step results into one
report. It exits when every step has rc==0 or after --max-hours.

Usage: python scripts/tpu_revalidate_loop.py [--out /tmp/tpu_revalidate_r5.json]
       [--max-hours 6] [--sleep 300]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Step order mirrors tpu_revalidate.STEPS (critical numbers first).
ALL_STEPS = ["probe", "kernels", "bench", "train_scaling", "eval_tracking",
             "infer", "nms", "trace_b2", "trace_b4", "train_second",
             "train_voxelnext", "conv_layout", "bench_exact", "eval",
             "sparse", "track", "serve", "roofline"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/tpu_revalidate_r5.json")
    ap.add_argument("--max-hours", type=float, default=6.0)
    ap.add_argument("--sleep", type=float, default=300.0)
    args = ap.parse_args()

    merged = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            merged = json.load(f)

    deadline = time.time() + args.max_hours * 3600
    attempt = 0
    while time.time() < deadline:
        pending = [s for s in ALL_STEPS
                   if merged.get(s, {}).get("rc") != 0]
        # Always re-probe at the head of an attempt so a wedged tunnel
        # aborts the chain instead of burning step timeouts one by one.
        todo = ["probe"] + [s for s in pending if s != "probe"]
        if todo == ["probe"] and merged.get("probe", {}).get("rc") == 0:
            break
        attempt += 1
        part = args.out + f".attempt{attempt}"
        print(f"=== attempt {attempt}: {','.join(todo)}", flush=True)
        subprocess.run([sys.executable, "scripts/tpu_revalidate.py",
                        "--out", part, "--only", ",".join(todo)],
                       cwd=REPO)
        if os.path.exists(part):
            with open(part) as f:
                for k, v in json.load(f).items():
                    # keep the first success; overwrite failures
                    if merged.get(k, {}).get("rc") != 0:
                        merged[k] = v
            os.remove(part)
        with open(args.out, "w") as f:
            json.dump(merged, f, indent=1)
        still = [s for s in ALL_STEPS if merged.get(s, {}).get("rc") != 0]
        print(f"=== after attempt {attempt}: pending={still}", flush=True)
        if not still:
            print("ALL STEPS GREEN")
            return 0
        time.sleep(args.sleep)
    print("deadline reached; pending:",
          [s for s in ALL_STEPS if merged.get(s, {}).get("rc") != 0])
    return 1


if __name__ == "__main__":
    sys.exit(main())
