#!/usr/bin/env python3
"""Measure the REFERENCE extractor's single-node parse throughput on a
generated TEBIS corpus (driver-side measurement tooling, not engine code).

Imports the reference's own get_parsed_file/create_data_points from
/root/reference with its network SDK imports stubbed out, then times the
full parse->datapoints transform per file — the same work
graft.TebisCsv.files does distributed.

Usage: python3 tools/bench_tebis.py <corpusDir> [--gen N_FILES N_SERIES N_ROWS]
"""
import sys, time, types, os, pathlib


def gen(corpus, n_files, n_series, n_rows):
    os.makedirs(corpus, exist_ok=True)
    t0 = 1550000000
    for f in range(n_files):
        p = os.path.join(corpus, f"TEBIS_GEN_{t0 + f * n_rows}.csv")
        with open(p, "w", encoding="latin-1") as fh:
            fh.write(";" + ";".join(f"{100+s} : SER{s}" for s in range(n_series)) + "\n")
            fh.write("Zeit" + ";bar" * n_series + "\n")
            for r in range(n_rows):
                ts = t0 + f * n_rows + r
                fh.write(str(ts) + ";" + ";".join(f"{s},{r % 1000:06d}" for s in range(n_series)) + "\n")
    print(f"generated {n_files} files x {n_series} series x {n_rows} rows")


def bench_reference(corpus):
    # stub the reference's network-SDK imports (unused by the parse path)
    for mod in ["cognite", "cognite.client", "cognite.client.exceptions",
                "cognite.client.data_classes", "cognite.client.data_classes.time_series",
                "requests", "prometheus_client", "google", "google.cloud",
                "google.cloud.logging"]:
        sys.modules.setdefault(mod, types.ModuleType(mod))
    sys.modules["cognite.client"].CogniteClient = object
    sys.modules["cognite.client.exceptions"].CogniteAPIError = Exception
    sys.modules["cognite.client.data_classes"].TimeSeries = object
    sys.modules["cognite.client.data_classes.time_series"].TimeSeries = object
    sys.path.insert(0, "/root/reference/csv-extractor")
    import csv_extractor  # noqa: E402

    paths = sorted(pathlib.Path(corpus).glob("*.csv"))
    t0 = time.time()
    n_points = 0
    for p in paths:
        parsed = csv_extractor.get_parsed_file(p)
        timestamps = parsed.pop("", [])[1:]
        for col, v in parsed.items():
            dps = csv_extractor.create_data_points(v[1:], timestamps)
            n_points += len(dps)
    dt = time.time() - t0
    print(f"reference parse: {len(paths)} files, {n_points} datapoints "
          f"in {dt:.2f}s = {n_points/dt:,.0f} points/s (single-threaded)")


if __name__ == "__main__":
    corpus = sys.argv[1]
    if "--gen" in sys.argv:
        i = sys.argv.index("--gen")
        gen(corpus, int(sys.argv[i+1]), int(sys.argv[i+2]), int(sys.argv[i+3]))
    bench_reference(corpus)
