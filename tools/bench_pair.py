#!/usr/bin/env python3
"""Paired same-window benchmark (r12 — VERDICT ask 7).

The r10/r11 drift investigations proved this box swings +/-25-44% across
hours, so a bench artifact is only comparable to one taken BACK-TO-BACK
in the same window. This tool makes that protocol mechanical:

  1. materialize the BASE tree (a git ref) into a temp worktree, or use
     an existing --base-dir;
  2. run `sbt runMain graft.Bench` alternately per round, base first
     (base, current, base, current, ...), same SF dir, same box, same
     window;
  3. per tree: per-query MIN across rounds (each Bench run is itself
     min-of-iters); write both artifacts;
  4. print the shared-query comparison: total ratio (current/base),
     median per-query ratio, and the biggest movers.

Usage:
  python3 tools/bench_pair.py --ref <base-git-ref> \
      [--rounds 1] [--sf /root/testdata/sf0.1] \
      [--out-base BENCH_base.json] [--out-cur BENCH_cur.json]
  python3 tools/bench_pair.py --base-dir /path/to/tree ...
"""
import argparse, json, os, re, statistics, subprocess, sys, tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(tree, sf, env_extra=None):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf, **(env_extra or {}))
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        cwd=tree, env=env, capture_output=True, text=True, timeout=7200)
    for line in out.stdout.splitlines():
        line = re.sub(r"^\[info\]\s*", "", line.strip())
        if line.startswith("{") and '"metric":"total"' in line:
            return json.loads(line)
    sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-3000:] + "\n")
    raise RuntimeError(f"no bench JSON line from {tree}")


def merge_min(arts):
    """Per-query min across rounds; total recomputed from the mins."""
    base = dict(arts[0])
    qs = {}
    for a in arts:
        for q, v in a["queries"].items():
            if v < 0:
                continue
            qs[q] = min(qs.get(q, float("inf")), v)
    base["queries"] = qs
    base["value"] = sum(qs.values())
    base["rounds"] = len(arts)
    return base


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", help="base git ref (materialized as a worktree)")
    ap.add_argument("--base-dir", help="existing base tree (skips worktree)")
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out-base", default=os.path.join(REPO, "BENCH_pair_base.json"))
    ap.add_argument("--out-cur", default=os.path.join(REPO, "BENCH_pair_cur.json"))
    args = ap.parse_args()
    if not args.ref and not args.base_dir:
        ap.error("one of --ref / --base-dir is required")

    base_dir = args.base_dir
    wt = None
    if base_dir is None:
        wt = tempfile.mkdtemp(prefix="benchpair-")
        subprocess.run(["git", "worktree", "add", "--detach", wt, args.ref],
                       cwd=REPO, check=True)
        base_dir = wt
    try:
        base_arts, cur_arts = [], []
        for r in range(args.rounds):
            print(f"[pair] round {r + 1}/{args.rounds}: base tree", flush=True)
            base_arts.append(run_bench(base_dir, args.sf))
            print(f"[pair] round {r + 1}/{args.rounds}: current tree", flush=True)
            cur_arts.append(run_bench(REPO, args.sf))
        base, cur = merge_min(base_arts), merge_min(cur_arts)
        json.dump(base, open(args.out_base, "w"), indent=0)
        json.dump(cur, open(args.out_cur, "w"), indent=0)
        shared = sorted(set(base["queries"]) & set(cur["queries"]))
        rb = sum(base["queries"][q] for q in shared)
        rc = sum(cur["queries"][q] for q in shared)
        ratios = {q: cur["queries"][q] / base["queries"][q]
                  for q in shared if base["queries"][q] > 0}
        movers = sorted(ratios.items(), key=lambda kv: -abs(kv[1] - 1))[:10]
        print(json.dumps({
            "shared_queries": len(shared),
            "base_total_shared": round(rb, 2),
            "cur_total_shared": round(rc, 2),
            "total_ratio": round(rc / rb, 4) if rb else None,
            "median_query_ratio": round(statistics.median(ratios.values()), 4)
            if ratios else None,
            "top_movers": {q: round(v, 3) for q, v in movers},
            "only_base": sorted(set(base["queries"]) - set(cur["queries"])),
            "only_cur": sorted(set(cur["queries"]) - set(base["queries"])),
        }, indent=2))
    finally:
        if wt:
            subprocess.run(["git", "worktree", "remove", "--force", wt],
                           cwd=REPO, check=False)


if __name__ == "__main__":
    main()
