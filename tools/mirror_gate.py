"""Local mirror of the driver's correctness gate.

For every `queries()` entry: run the Ray pipeline AND the `oracle_sql()`
string (DuckDB, tables pre-registered as views over the sf dir) at sf0.01,
normalize both (columns sorted by name, rows sorted by all columns), and
compare rows / schema / values — the same contract CORRECTNESS_r{N}.json
records. Run with the driver's parallelism (num_cpus=32) to catch
partition-count-dependent failures (round-1 telemetry_join_fixture crashed
at 32 while passing at 4).

    PYTHONPATH=/root/repo python tools/mirror_gate.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import pyarrow as pa
import pyarrow.compute as pc

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(t: pa.Table) -> pa.Table:
    t = t.select(sorted(t.column_names))
    # driver-style value compare: cast to a stable logical form first
    cols = {}
    for name in t.column_names:
        c = t[name]
        if pa.types.is_large_string(c.type):
            c = c.cast(pa.string())
        if pa.types.is_integer(c.type) and not pa.types.is_int64(c.type):
            c = c.cast(pa.int64())
        if pa.types.is_floating(c.type) and not pa.types.is_float64(c.type):
            c = c.cast(pa.float64())
        cols[name] = c
    t = pa.table(cols)
    if t.num_rows:
        t = t.take(
            pc.sort_indices(t, sort_keys=[(c, "ascending") for c in t.column_names])
        )
    return t.combine_chunks()


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(args[1:]) if args and os.path.isdir(args[0]) else set(args)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            log_to_driver=False,
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry
    from tools.make_goldens import to_table

    con = duckdb.connect()
    for tbl in TABLES:
        p = os.path.join(sf_dir, f"{tbl}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{p}')"
            )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec: dict = {}
        t0 = time.perf_counter()
        try:
            got = normalize(to_table(fn(sf_dir)))
            rec["rows"] = got.num_rows
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"{type(e).__name__}: {e}"[:300]}
            print(f"{name:32s} ERR {results[name]['err'][:80]}")
            continue
        rec["sec"] = round(time.perf_counter() - t0, 2)
        sql = oracles.get(name)
        if sql is None:
            rec["oracle"] = "none"
            print(f"{name:32s} rows={rec['rows']:>7} {rec['sec']:>6}s  NO-ORACLE")
        else:
            want = normalize(con.execute(sql).arrow())
            rec["rows_match"] = got.num_rows == want.num_rows
            rec["schema_match"] = got.schema.names == want.schema.names and all(
                got.schema.field(i).type == want.schema.field(i).type
                for i in range(len(got.schema))
            )
            rec["hash_match"] = bool(got.equals(want))
            ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
            print(
                f"{name:32s} rows={rec['rows']:>7} {rec['sec']:>6}s  "
                f"{'OK' if ok else 'MISMATCH ' + json.dumps(rec)}"
            )
            if not rec["hash_match"] and rec["rows_match"] and rec["schema_match"]:
                # first differing column for quick diagnosis
                for c in got.column_names:
                    if not got[c].equals(want[c]):
                        rec["first_diff_col"] = c
                        break
        results[name] = rec
    bad = {k: v for k, v in results.items() if v.get("err") or v.get("hash_match") is False}
    print(f"\n{len(results) - len(bad)}/{len(results)} green")
    if bad:
        print("FAILING:", json.dumps(bad, indent=2)[:2000])
        sys.exit(1)


if __name__ == "__main__":
    main()
