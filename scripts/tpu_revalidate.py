"""One-shot TPU hardware revalidation — ROADMAP.md's "Next TPU session
checklist" as a single resumable command.

Usage: python scripts/tpu_revalidate.py [--out /tmp/tpu_revalidate.json]
       [--only STEP[,STEP...]]

Probes the tunnel first (300 s trivial-matmul timeout in a subprocess so a
wedged tunnel cannot hang the runner; first contact regularly takes
60-120 s even when healthy, and host CPU contention can double that;
the probe retries up to 3 times before aborting), then executes, in
order:

  probe    trivial matmul answers within 300 s (3 attempts)
  kernels  scripts/tpu_kernel_parity.py — the Pallas kernels compiled by
           Mosaic on the chip vs their XLA / host oracles
  sparse_mosaic  scripts/tpu_sparse_parity.py — the fused Pallas
           submanifold conv lowered through real Mosaic (fwd/grad/bf16
           vs the XLA gather+einsum path)
  bench    python bench.py (headline north-star JSON line)
  train    scripts/bench_train.py (flagship configs incl. bf16 ext-targets)
  eval     scripts/bench_eval.py + --tracking (per-frame numbers)
  sparse   scripts/bench_sparse.py (SECOND neighbor-map + conv)
  infer    scripts/bench_infer.py (serving configs incl. voxelnext and
           the fused detect+track step)
  track    scripts/bench_track.py (host vs device vs fused tracker)
  serve    examples/serve_tracking.py (live fused-serving latency)
  roofline scripts/roofline.py (XLA cost_analysis bytes/flops vs measured
           time: achieved HBM fraction + train-step MFU)
  exact_profile  scripts/profile_exact_voxel.py (stage ladder of the
           two-limb exact voxelizer + xplane trace)
  riou_sweep     scripts/bench_riou_sweep.py --no-plot (n=1..5000 size
           sweep over the four rotated-IoU paths; plot from the JSON
           afterwards on CPU)

Each step's stdout tail, wall time and rc land in the JSON report; steps
run in subprocesses with hard timeouts, so one hung step does not lose
the session. Re-run with --only to redo individual steps after a blip.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = ("import jax, jax.numpy as jnp; "
         "print(float((jnp.ones((256,256)) @ jnp.ones((256,256)))[0,0]))")

STEPS = [
    # first tunnel contact regularly takes 60-120 s even when healthy
    # (observed round 3); 45 s misclassified a live tunnel as down
    ("probe", [sys.executable, "-c", PROBE], 300),
    # round-5 priorities: kernel parity (incl. the new blocked NMS), the
    # post-BN-fix train ladder, the scan-path tracking evaluator, serving
    ("kernels", [sys.executable, "scripts/tpu_kernel_parity.py"], 1200),
    ("bench", [sys.executable, "bench.py"], 1200),
    ("train_scaling", [sys.executable, "scripts/bench_train.py",
                       "--scaling"], 3600),
    ("eval_tracking", [sys.executable, "scripts/bench_eval.py", "--tracking",
                       "--frames", "64"], 1200),
    ("infer", [sys.executable, "scripts/bench_infer.py"], 1800),
    ("nms", [sys.executable, "scripts/bench_nms.py"], 2400),
    ("trace_b2", [sys.executable, "scripts/profile_train.py", "4",
                  "--batch", "2", "--ext-targets"], 1800),
    ("trace_b4", [sys.executable, "scripts/profile_train.py", "4",
                  "--batch", "4", "--ext-targets"], 1800),
    ("train_second", [sys.executable, "scripts/bench_train.py", "--model",
                      "second", "--steps", "10"], 3600),
    ("train_voxelnext", [sys.executable, "scripts/bench_train.py", "--model",
                         "voxelnext", "--steps", "10"], 3600),
    ("conv_layout", [sys.executable, "scripts/bench_conv_layout.py"], 1800),
    ("bench_exact", [sys.executable, "bench.py", "--voxelizer", "exact"],
     1200),
    ("eval", [sys.executable, "scripts/bench_eval.py", "--frames", "128"],
     1200),
    ("sparse", [sys.executable, "scripts/bench_sparse.py"], 1200),
    ("track", [sys.executable, "scripts/bench_track.py"], 1200),
    ("serve", [sys.executable, "examples/serve_tracking.py",
               "--frames", "20"], 1200),
    ("roofline", [sys.executable, "scripts/roofline.py"], 2400),
]


def run_step(name, cmd, timeout):
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                              timeout=timeout)
        rc, out = proc.returncode, proc.stdout + proc.stderr
    except subprocess.TimeoutExpired as e:
        rc = -1
        out = ((e.stdout or b"").decode(errors="replace") if
               isinstance(e.stdout, bytes) else (e.stdout or ""))
        out += f"\n<timeout after {timeout}s>"
    dt = time.time() - t0
    tail = "\n".join(out.strip().splitlines()[-15:])
    print(f"== {name}: rc={rc} ({dt:.0f}s)\n{tail}\n", flush=True)
    return {"rc": rc, "seconds": round(dt, 1), "tail": tail}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/tpu_revalidate.json")
    ap.add_argument("--only", default=None,
                    help="comma-separated step names to run")
    args = ap.parse_args()

    only = set(args.only.split(",")) if args.only else None
    report = {}
    for name, cmd, timeout in STEPS:
        if only is not None and name not in only:
            continue
        report[name] = run_step(name, cmd, timeout)
        if name == "probe":
            attempts = 1
            while report[name]["rc"] != 0 and attempts < 3:
                attempts += 1
                print(f"probe retry {attempts}/3", flush=True)
                report[name] = run_step(name, cmd, timeout)
            if report[name]["rc"] != 0:
                print("tunnel DOWN — aborting (re-run when it answers)")
                break
        elif report[name]["rc"] == -1:
            # a step TIMED OUT mid-chain: distinguish a slow workload from
            # a wedged tunnel with a cheap re-probe, else every remaining
            # step burns its full timeout against a dead tunnel
            reprobe = run_step("probe(recheck)",
                               [sys.executable, "-c", PROBE], 300)
            if reprobe["rc"] != 0:
                print("tunnel WEDGED mid-chain — aborting this attempt")
                with open(args.out, "w") as f:
                    json.dump(report, f, indent=1)
                break
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    print("report:", args.out)
    ok = all(r["rc"] == 0 for r in report.values())
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
