"""Sequential held-out-PSNR seed grid on the TPU (VERDICT r2 #6 / #9).

Runs tools/quality_run.py once per (seed, sampler[, jitter]) cell IN
SEQUENCE (one tunnel client at a time — CLAUDE.md) and appends each run's
RESULT_JSON line to benchmarks/seed_grid_r3.jsonl. Decision rule
(benchmarks/MFU.md): keep sampling_impl='overdraw' as the default only if
the per-seed held-out PSNR deltas vs 'gumbel' stay within the seed spread;
vessel PSNR is NOT a decision metric (±3 dB swing between adjacent evals).

Usage: python tools/seed_grid.py [--iters 20000] [--seeds 0,1,2,3]
       [--out benchmarks/seed_grid_r3.jsonl]
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cells(seeds):
    for seed in seeds:
        for sampling in ("gumbel", "overdraw"):
            yield {"seed": seed, "sampling": sampling, "jitter": False}
    # jitter column (2 seeds, default sampler): quality-neutrality check
    # for the grid_jitter default (training/config.py)
    for seed in seeds[:2]:
        yield {"seed": seed, "sampling": "overdraw", "jitter": True}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20000)
    ap.add_argument("--seeds", default="0,1,2,3")
    ap.add_argument("--out", default=os.path.join(REPO, "benchmarks", "seed_grid_r3.jsonl"))
    ap.add_argument("--timeout", type=int, default=1800, help="per-run seconds")
    ap.add_argument(
        "--max_tunnel_wait", type=int, default=3600,
        help="seconds to wait out a wedged tunnel before giving up",
    )
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]

    done = set()
    if os.path.exists(args.out):
        import json

        with open(args.out) as f:
            for line in f:
                try:
                    r = json.loads(line)
                    done.add((r["seed"], r["sampling"], bool(r.get("jitter"))))
                except Exception:
                    pass

    def tunnel_healthy(timeout=60):
        """One trivial op in a throwaway process — a wedged tunnel hangs
        or errors; don't burn a cell's 30-min budget on init retries."""
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; print(float(jnp.ones(4).sum()))"],
            capture_output=True, timeout=timeout + 10, text=True,
        )
        return probe.returncode == 0

    def wait_for_tunnel(max_wait=args.max_tunnel_wait):
        waited = 0
        while waited < max_wait:
            try:
                if tunnel_healthy():
                    return True
            except subprocess.TimeoutExpired:
                pass
            print(f"tunnel unhealthy; retrying in 120s ({waited}s waited)", flush=True)
            time.sleep(120)
            waited += 180
        return False

    for cell in cells(seeds):
        key = (cell["seed"], cell["sampling"], cell["jitter"])
        if key in done:
            print(f"skip (done): {key}", flush=True)
            continue
        if not wait_for_tunnel():
            print(f"tunnel down >1h; giving up at {key}", flush=True)
            break
        cmd = [
            sys.executable, os.path.join(REPO, "tools", "quality_run.py"),
            "--iters", str(args.iters), "--seed", str(cell["seed"]),
            "--sampling", cell["sampling"],
        ]
        if cell["jitter"]:
            cmd.append("--jitter")
        print(f"=== {key} @ {time.strftime('%H:%M:%S')}", flush=True)
        try:
            out = subprocess.run(
                cmd, capture_output=True, text=True, timeout=args.timeout
            )
        except subprocess.TimeoutExpired:
            print(f"TIMEOUT: {key}", flush=True)
            continue
        line = next(
            (l for l in out.stdout.splitlines() if l.startswith("RESULT_JSON ")),
            None,
        )
        if out.returncode != 0 or line is None:
            sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-2000:] + "\n")
            print(f"FAILED: {key} (rc={out.returncode})", flush=True)
            continue
        with open(args.out, "a") as f:
            f.write(line[len("RESULT_JSON "):] + "\n")
        print(line, flush=True)


if __name__ == "__main__":
    main()
