"""Summarize a training run's metrics.jsonl into a compact table.

Usage: python benchmarks/summarize_run.py <workdir> [every]
Prints a markdown table of loss/Elo over iterations plus totals.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    wd = sys.argv[1]
    every = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    iters, evals = [], []
    with open(os.path.join(wd, "metrics.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if r.get("kind") == "iter":
                iters.append(r)
            elif r.get("kind") == "eval":
                evals.append(r)
    if not iters:
        print("no iterations logged")
        return 1
    total_steps = sum(r["env_steps"] for r in iters)
    total_games = sum(r["games_finished"] for r in iters)
    total_time = sum(r["iter_seconds"] for r in iters)
    print(f"iterations: {len(iters)}  env-steps: {total_steps:,.0f}  "
          f"games: {total_games:,.0f}  device-time: {total_time/60:.1f} min  "
          f"mean steps/s: {total_steps/total_time:,.0f}")
    print()
    print("| iter | loss | policy | value | KL(pi,p) |")
    print("|---:|---:|---:|---:|---:|")
    for r in iters:
        if r["iter"] % every == 0:
            print(f"| {r['iter']} | {r['loss']:.3f} | "
                  f"{r['policy_loss']:.3f} | {r['value_loss']:.3f} | "
                  f"{r['kl_pi_p']:.3f} |")
    if evals:
        print()
        print("| iter | score vs anchor | anchor rollouts | Elo |")
        print("|---:|---:|---:|---:|")
        for r in evals:
            print(f"| {r['iter']} | {r['score']:.3f} | "
                  f"{r['anchor_rollouts']} | {r['elo']:.0f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
