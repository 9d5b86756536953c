"""Local stand-in for the driver's correctness gate: run every queries()
entry and its oracle_sql() side-by-side on DuckDB, compare rowcount +
schema-ordered value hash. Usage: python tools/check_contract.py [sf_dir]"""
import hashlib
import logging
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    if not isinstance(df, pd.DataFrame):
        try:
            df = df.to_pandas()
        except AttributeError:
            df = pd.DataFrame(df)
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def vhash(df: pd.DataFrame) -> str:
    c = canon(df)
    # normalize dtypes: ints -> int64, floats -> rounded strings
    parts = []
    for col in c.columns:
        s = c[col]
        if pd.api.types.is_float_dtype(s):
            parts.append(s.map(lambda x: "%.9g" % x).to_numpy())
        else:
            parts.append(s.astype(str).to_numpy())
    joined = ["|".join(row) for row in zip(*parts)] if parts else []
    return hashlib.sha1("\n".join(sorted(joined)).encode()).hexdigest()[:16]


def main(sf_dir: str):
    import ray

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as m

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, sqls = m.queries(), m.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            got = canon(fn(sf_dir))
        except Exception as e:
            print(f"FAIL  {name:28s} engine error: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        el = time.perf_counter() - t0
        if name in sqls:
            try:
                exp = canon(con.execute(sqls[name]).df())
            except Exception as e:
                print(f"FAIL  {name:28s} oracle error: {e}")
                n_bad += 1
                continue
            rows_ok = len(got) == len(exp)
            cols_ok = [c.lower() for c in got.columns] == [c.lower() for c in exp.columns]
            h_ok = vhash(got) == vhash(exp)
            status = "ok" if (rows_ok and cols_ok and h_ok) else "MISMATCH"
            if status == "ok":
                n_ok += 1
            else:
                n_bad += 1
            print(f"{status:5s} {name:28s} rows {len(got)}/{len(exp)} cols={cols_ok} hash={h_ok}  {el:.1f}s")
            if status != "ok" and len(got) < 20:
                print(" got:", got.head(10).to_dict("records"))
                print(" exp:", exp.head(10).to_dict("records"))
        else:
            print(f"rows  {name:28s} rows={len(got)} (no oracle)  {el:.1f}s")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    # smoke entry()
    t0 = time.perf_counter()
    r = m.entry()
    print(f"entry(): {len(r)} rows, cols {list(r.columns)[:5]}, {time.perf_counter()-t0:.1f}s")
    ray.shutdown()
    return n_bad


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))
