"""Head pre-verification artifact (VERDICT r9 #2).

Both r8 and r9 closed with the builder and the judge re-running ad
hoc strictchecks of the next round's declared head.  This tool makes
that a COMMITTED artifact: it strictcheck-verifies a query list
typed-equal at sf0.01 (the driver-gate canonicalizer, via
tools/strictcheck.canon) and writes per-query sha256 hashes of the
canonical rows, so the next judge diffs a file instead of re-running
ten minutes of checks.

Usage:
  python tools/headcheck.py --ledger
      Print the rotation ledger: per-query last-driver-checked round
      (from CORRECTNESS_r*.json) in registration order — the queue
      the next head must lead with.
  python tools/headcheck.py --current [--out HEADCHECK_rN.json]
      Verify the CURRENT `_DRIVER_HEAD[:50]` (what the driver's next
      CORRECTNESS artifact will check) and write the hash artifact.
  python tools/headcheck.py --queries q1 q2 ... [--out FILE]
      Verify an explicit list (e.g. the NEXT round's declared lead
      cohort at round close).

sf_dir defaults to /root/testdata/sf0.01 (override with --sf DIR).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_checked_rounds() -> dict[str, int]:
    """query -> last round whose driver CORRECTNESS artifact checked it."""
    out: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        r = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for q in json.load(open(f)):
            out[q] = max(out.get(q, 0), r)
    return out


def registration_order() -> list[str]:
    from hive_jq_udtf_spark.plans.queries import QUERIES

    return list(QUERIES)


def print_ledger() -> int:
    last = last_checked_rounds()
    cur = max(last.values())
    print(f"registration-order rotation ledger (latest artifact: r{cur:02d})")
    by_round: dict[int, list[str]] = {}
    for q in registration_order():
        r = last.get(q, 0)
        by_round.setdefault(r, []).append(q)
    for r in sorted(by_round):
        qs = by_round[r]
        tag = "NEVER DRIVER-CHECKED" if r == 0 else f"last r{r:02d}"
        print(f"\n[{tag}] ({len(qs)}):")
        for q in qs:
            print(f"  {q}")
    return 0


def main() -> int:
    args = sys.argv[1:]
    if "--ledger" in args:
        return print_ledger()

    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        sf_dir = args[args.index("--sf") + 1]
    out_path = None
    if "--out" in args:
        out_path = args[args.index("--out") + 1]

    if "--queries" in args:
        i = args.index("--queries") + 1
        names = []
        while i < len(args) and not args[i].startswith("--"):
            names.append(args[i])
            i += 1
        label = "explicit"
    else:
        import __spark_entry__ as entrymod

        names = list(entrymod._DRIVER_HEAD)[:50]
        label = "current_head"

    import duckdb

    from pyspark.sql import SparkSession
    from pyspark.sql import types as T

    import __spark_entry__ as entrymod
    from tools.strictcheck import canon

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .appName("headcheck")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    result: dict[str, dict] = {}
    n_fail = 0
    for name in names:
        fn = queries.get(name)
        sql = oracles.get(name)
        if fn is None:
            result[name] = {"error": "not registered"}
            n_fail += 1
            continue
        try:
            sdf = fn(spark, sf_dir)
            bad = [
                f.name
                for f in sdf.schema.fields
                if isinstance(f.dataType, (T.ArrayType, T.MapType))
            ]
            if bad:
                raise ValueError(f"array/map top-level column(s) {bad}")
            a = canon(sdf.toPandas())
            b = canon(con.execute(sql).df()) if sql else None
        except Exception as ex:
            result[name] = {"error": f"{type(ex).__name__}: {str(ex)[:160]}"}
            n_fail += 1
            print(f"FAIL  {name}: {result[name]['error']}", flush=True)
            continue
        h = hashlib.sha256(repr(a).encode()).hexdigest()[:16]
        ok = (b is None) or (a == b)
        result[name] = {
            "rows": len(a),
            "typed_equal": ok,
            "hash": h,
            "oracle": sql is not None,
        }
        if not ok:
            n_fail += 1
        print(
            f"{'pass ' if ok else 'FAIL '} {name}: {len(a)} rows hash={h}",
            flush=True,
        )
    artifact = {
        "label": label,
        "sf_dir": sf_dir,
        "n": len(names),
        "n_typed_equal": sum(
            1 for v in result.values() if v.get("typed_equal")
        ),
        "queries": result,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
        print(f"\nwrote {out_path}")
    print(f"\n{artifact['n_typed_equal']}/{len(names)} typed-equal")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
