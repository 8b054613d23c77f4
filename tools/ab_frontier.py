"""Interleaved A/B frontier bench: HEAD vs a pinned reference commit.

VERDICT r3 "wrong" #1: the composite frontier headline declined two
rounds running (14.5k -> 13.7k -> 9.0k mean URLs/s) with a 47.9%
recorded spread — too noisy for sequential comparisons ("never
compare A/B numbers measured hours apart").  This protocol removes
the time-of-measurement confound:

* the reference commit is checked out into a detached git worktree
  (source tree only; nothing in the live repo changes);
* HEAD and REF run `bench.py --frontier-only` ALTERNATELY in fresh
  JVMs, back-to-back, >= N pairs, with the in-pair order flipping
  every pair so slow drift cancels;
* the paired ratio (head/ref per pair, then mean) is the verdict —
  machine noise hits both sides of a pair roughly equally.

Writes BENCH/AB_FRONTIER.json and prints one JSON line.
Usage: python tools/ab_frontier.py [--ref 8328354] [--pairs 4] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys


def run_one(repo_dir: str, cpus: int, profile: bool = False) -> dict:
    cmd = [sys.executable, "bench.py", "--frontier-only", "--cpus", str(cpus)]
    if profile:
        cmd.append("--profile")
    out = subprocess.run(
        cmd, cwd=repo_dir, capture_output=True, text=True, check=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="8328354", help="baseline commit")
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wt = f"/tmp/spark_graft_ab_{args.ref}"
    if not os.path.exists(wt):
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, args.ref],
            cwd=repo,
            check=True,
        )

    out_path = os.path.join(repo, "BENCH", "AB_FRONTIER.json")
    pairs = []
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                prev = json.load(f)
            # accumulate evidence across sessions for the same
            # comparison (pairs are self-normalizing, so merging is
            # sound even across machine-state changes)
            if prev.get("ref_commit") == args.ref and prev.get("cpus") == args.cpus:
                pairs = prev.get("pairs", [])
        except (OSError, json.JSONDecodeError):
            pass
    for i in range(args.pairs):
        order = (
            [("head", repo), ("ref", wt)]
            if i % 2 == 0
            else [("ref", wt), ("head", repo)]
        )
        rec = {}
        for name, d in order:
            rec[name] = run_one(d, args.cpus)["urls_per_sec"]
        rec["ratio"] = round(rec["head"] / rec["ref"], 3)
        pairs.append(rec)
        print(json.dumps(rec), flush=True)

    ratios = [p["ratio"] for p in pairs]
    heads = [p["head"] for p in pairs]
    refs = [p["ref"] for p in pairs]
    summary = {
        "ref_commit": args.ref,
        "cpus": args.cpus,
        "pairs": pairs,
        "head_mean": round(statistics.mean(heads), 1),
        "ref_mean": round(statistics.mean(refs), 1),
        "ratio_mean": round(statistics.mean(ratios), 3),
        "ratio_min": min(ratios),
        "ratio_max": max(ratios),
        "verdict": (
            "within-noise"
            if min(ratios) <= 1.0 <= max(ratios)
            or abs(statistics.mean(ratios) - 1.0)
            <= 2 * (statistics.pstdev(ratios) or 0.02)
            else ("head-slower" if statistics.mean(ratios) < 1 else "head-faster")
        ),
    }
    out_path = os.path.join(repo, "BENCH", "AB_FRONTIER.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
