#!/usr/bin/env python
"""On-TPU production soak (VERDICT r3 item 3).

Runs the REAL trainer CLI at production defaults (mygan, b8, bf16,
flow_scale 0.5, fused kernels) against on-device synthetic data
(--synthetic_data), in a subprocess on the attached TPU:

  phase 1: train with periodic test sweeps + async autosave, SIGTERM it
           mid-run -> the engine parks a resumable 'latest' checkpoint;
  phase 2: --resume from that checkpoint, run to --steps total.

Then audits the combined metrics.jsonl stream: finite losses end to end,
monotone step continuity across the resume, test sweeps scored (ROC
present), and steady-state steps/s vs bench.py's number.  Writes
SOAK_RUN.json at the repo root.

Usage: python tools/soak.py [--steps 500] [--sigterm_frac 0.6] [--batch 8]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_trainer(extra, tag):
    cmd = [sys.executable, "-m", "vfd_gan_tpu.cli.trainer"] + extra
    print(f"[soak:{tag}] {' '.join(cmd)}", flush=True)
    return subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


def drain(proc, tag, log):
    for line in proc.stdout:
        log.append(line)
        if any(k in line for k in ("SAVE PATH", "Interrupted", "Stopped",
                                   "Training model", "Loaded", "error")):
            print(f"[{tag}] {line.rstrip()}", flush=True)
    return proc.wait()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--freq", type=int, default=100)
    ap.add_argument("--sigterm_frac", type=float, default=0.6)
    ap.add_argument("--root", default="/tmp/vfd_soak")
    ap.add_argument("--model", default="mygan")
    ap.add_argument("--learning", action="store_true",
                    help="thick-region synthetic GT (--synthetic_thick_masks)"
                         " so the opened-binary sweep ROC can move off 0.5 — "
                         "demonstrates end-to-end learning on hardware, not "
                         "just numerical stability (VERDICT r4 item 7); "
                         "audits ROC rising and writes SOAK_LEARNING_RUN.json")
    ap.add_argument("--out", default="")
    ap.add_argument("--lr", default="",
                    help="override trainer lr (learning mode: the production "
                         "2e-5 moves the scored ROC too slowly for a 500-step "
                         "demo; 2e-4 crosses the 0.5 binarisation within it)")
    args = ap.parse_args()

    # Unique subdir per invocation: the step-watcher and the newest()
    # checkpoint/metrics lookups glob under args.root — a REUSED root
    # with a finished run inside made the watcher read the OLD
    # metrics.jsonl (already at max_steps) and SIGTERM phase 1 during
    # init (found round 5 on the second --learning run).
    args.root = os.path.join(args.root, time.strftime("%Y%m%d-%H%M%S"))
    os.makedirs(args.root, exist_ok=True)
    common = ["--model", args.model, "--synthetic_data", "64",
              "--synthetic_test_batches", "2",
              "--isize", "128", "--nfr", "16",
              "--batchsize", str(args.batch), "--ep", "100000",
              "--freq", str(args.freq),
              "--autosave_every", str(args.freq), "--autosave_async",
              "--no-tensorboard", "--result_root", args.root,
              "--max_steps", str(args.steps)]
    if args.learning:
        common += ["--synthetic_thick_masks"]
    if args.lr:
        common += ["--lr", args.lr]

    # ---- phase 1: run, then SIGTERM mid-flight ----
    t0 = time.time()
    log1: list[str] = []
    p = run_trainer(common, "phase1")
    # wait until the run dir + metrics stream show real progress, then
    # interrupt at ~sigterm_frac of the target steps
    target_step = int(args.steps * args.sigterm_frac)
    sig_sent = False
    import threading
    rc_holder = {}

    def _drain():
        rc_holder["rc"] = drain(p, "phase1", log1)
    th = threading.Thread(target=_drain)
    th.start()
    while th.is_alive():
        time.sleep(5)
        last = last_step(args.root)
        if not sig_sent and last >= target_step:
            print(f"[soak] step {last} >= {target_step}: sending SIGTERM",
                  flush=True)
            p.send_signal(signal.SIGTERM)
            sig_sent = True
    th.join()
    rc1 = rc_holder.get("rc", -1)
    if not sig_sent:
        print("[soak] WARNING: run finished before the SIGTERM point "
              "(freq too coarse?); continuity check degrades to trivial")
    assert rc1 == 0, f"phase 1 exited {rc1}\n{''.join(log1[-30:])}"

    latest = newest(os.path.join(args.root, args.model, "*", "*", "weights",
                                 "latest"))
    assert latest, "no parked 'latest' checkpoint found"
    mfile = newest(os.path.join(args.root, args.model, "*", "*",
                                "metrics.jsonl"))
    recs1 = [json.loads(ln) for ln in open(mfile)] if mfile else []

    # ---- phase 2: exact resume to the full step target ----
    # (a fresh timestamped run dir: its metrics.jsonl continues the step
    # numbering from the restored global_step)
    log2: list[str] = []
    p2 = run_trainer(common + ["--resume", latest], "phase2")
    rc2 = drain(p2, "phase2", log2)
    assert rc2 == 0, f"phase 2 exited {rc2}\n{''.join(log2[-30:])}"
    wall = time.time() - t0

    mfile2 = newest(os.path.join(args.root, args.model, "*", "*",
                                 "metrics.jsonl"))
    assert mfile2 and mfile2 != mfile, "phase 2 produced no new run dir"
    recs = recs1 + [json.loads(ln) for ln in open(mfile2)]
    audit(recs, recs1, args, wall)


def last_step(root) -> int:
    mfile = newest(os.path.join(root, "*", "*", "*", "metrics.jsonl"))
    if not mfile:
        return 0
    try:
        lines = open(mfile).read().strip().splitlines()
        return json.loads(lines[-1])["step"] if lines else 0
    except (OSError, ValueError, KeyError, IndexError):
        return 0


def newest(pattern):
    hits = glob.glob(pattern)
    return max(hits, key=os.path.getmtime) if hits else None


def audit(recs, recs1, args, wall) -> None:
    assert recs, "no metrics records"
    steps = [r["step"] for r in recs]
    assert steps == sorted(steps), "steps not monotone across resume"
    assert steps[-1] >= args.steps, (steps[-1], args.steps)
    numeric = [(k, v) for r in recs for k, v in r.items()
               if isinstance(v, float)]
    bad = [(k, v) for k, v in numeric
           if not (v == v and abs(v) != float("inf"))]
    assert not bad, f"non-finite telemetry: {bad[:5]}"
    rocs = [r.get("score/roc") for r in recs if "score/roc" in r]
    assert rocs and all(x == x for x in rocs), "sweeps missing/NaN ROC"
    sps = [r["perf/steps_per_sec"] for r in recs
           if "perf/steps_per_sec" in r and r["perf/steps_per_sec"] > 0]
    # per-window numbers cover train steps only (engine_base sync-window
    # measurement); median over windows = the steady state
    import statistics
    steady = statistics.median(sps) if sps else 0.0
    clips = steady * args.batch

    d_errs = [r.get("d/err_d/train") for r in recs if "d/err_d/train" in r]
    g_errs = [r.get("g/err_g/train") for r in recs if "g/err_g/train" in r]

    if args.learning:
        # the learning leg's whole point: the scored metric moved off the
        # 0.5 pin (a random G's opened-binary sweep scores ~0.5; the
        # non-learning soak sits there for all 500 steps by construction).
        # Gate on distance from 0.5, not on a sweep-to-sweep rise: at
        # lr 2e-4 the thick-mask task is already >0.95 ROC by the FIRST
        # freq-100 sweep, so demanding rocs[-1] > rocs[0]+0.05 failed a
        # run that had learned *faster* than the audit assumed.
        assert max(rocs) > 0.75, f"ROC never rose off 0.5: {rocs}"
        assert rocs[-1] > 0.75, f"ROC did not STAY learned: {rocs}"

    out = {
        "when": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        "learning_mode": args.learning,
        "model": args.model, "batch": args.batch,
        "steps": steps[-1], "wall_sec": round(wall, 1),
        "resume_at_step": recs1[-1]["step"] if recs1 else None,
        "sweeps": len(rocs), "roc_trajectory": [round(x, 4) for x in rocs],
        "d_err_trajectory": [round(x, 4) for x in d_errs if x is not None],
        "g_err_trajectory": [round(x, 4) for x in g_errs if x is not None],
        "steady_steps_per_sec": round(steady, 3),
        "steady_clips_per_sec": round(clips, 2),
        "window_steps_per_sec": [round(x, 3) for x in sps],
    }
    name = args.out or ("SOAK_LEARNING_RUN.json" if args.learning
                        else "SOAK_RUN.json")
    with open(os.path.join(REPO, name), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
