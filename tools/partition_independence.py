#!/usr/bin/env python3
"""Suite-wide partition-independence gate: run graft.Verify twice at
different parallelism (SPARK_GRAFT_CPUS / shuffle partitions), then
assert every query's result rows are identical (column-sorted,
row-sorted — the driver's canonicalization). Determinism under
repartition is spec'd per-op (q234, q101); this gates it for the WHOLE
suite, which is what a 1000-executor deployment actually relies on.

Usage: python3 tools/partition_independence.py <sfDir> [cpusA=4] [cpusB=8] [query ...]
Optional query names limit both passes (targeted gate for new queries).
Writes nothing into the repo; exits non-zero on any mismatch.
"""
import math, os, subprocess, sys, tempfile
import duckdb


def canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return repr(val)
    if isinstance(val, list):
        return "[" + ",".join(canon(v) for v in val) + "]"
    return str(val)


def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def run_verify(sf_dir, out_dir, cpus, only=()):
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    names = " ".join(only)
    proc = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out_dir} {names}".strip()],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True)
    if proc.returncode != 0:
        # surface WHY a determinism-gate pass failed instead of a bare
        # CalledProcessError with discarded output
        sys.stderr.write(proc.stdout[-4000:] + proc.stderr[-4000:])
        raise SystemExit(f"verify pass (cpus={cpus}) failed rc={proc.returncode}")


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__.strip())
    sf_dir = sys.argv[1]
    cpus_a = sys.argv[2] if len(sys.argv) > 2 else "4"
    cpus_b = sys.argv[3] if len(sys.argv) > 3 else "8"
    only = tuple(sys.argv[4:])
    base = tempfile.mkdtemp(prefix="graft-pindep-")
    out_a, out_b = f"{base}/a", f"{base}/b"
    print(f"verify pass A (cpus={cpus_a}) ...", flush=True)
    run_verify(sf_dir, out_a, cpus_a, only)
    print(f"verify pass B (cpus={cpus_b}) ...", flush=True)
    run_verify(sf_dir, out_b, cpus_b, only)
    con = duckdb.connect()
    names = sorted(d for d in os.listdir(out_a) if os.path.isdir(f"{out_a}/{d}"))
    n_pass = n_fail = 0
    for name in names:
        if not os.path.isdir(f"{out_b}/{name}"):
            print(f"FAIL {name}: missing in pass B"); n_fail += 1; continue
        sides = []
        for out in (out_a, out_b):
            cur = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'")
            sides.append(rows_key([d[0] for d in cur.description], cur.fetchall()))
        if sides[0] == sides[1]:
            n_pass += 1
        else:
            print(f"FAIL {name}: rows differ between parallelism configs")
            n_fail += 1
    print(f"== partition independence: {n_pass} pass, {n_fail} fail "
          f"(cpus {cpus_a} vs {cpus_b}, {len(names)} queries) ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
