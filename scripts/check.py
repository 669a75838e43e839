#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Runs each oracle SQL in DuckDB against the same parquet tables, loads the
Verify output parquet, and compares: schema (column names), row count, and
a value hash computed the driver's way (columns sorted by name).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                type(v).__name__ == "ndarray" else v)
    return df.reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    # row-order-sensitive hash over stringified cells (floats repr'd at 12
    # significant digits to absorb last-ulp noise, like a tolerant driver)
    def cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.12g}"
        return repr(v)
    import hashlib
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(cell(v) for v in row) + "\n").encode())
    return h.hexdigest()


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        # ScaleUp-generated tiers are spark-written DIRECTORIES named
        # <table>.parquet; the driver tiers are single files
        p = f"{sf_dir}/{t}.parquet"
        import os
        if not os.path.exists(p):
            # table-subset ScaleUp tiers (e.g. documents+embeddings only):
            # skip — an oracle that needs the table fails loudly anyway
            continue
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_raw = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            failures += 1
            continue
        try:
            exp_raw = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error ({e})")
            failures += 1
            continue
        problems = []
        # positional compare BEFORE norm's sort — the driver may compare
        # schemas positionally, so a column-order mismatch must fail here
        if list(got_raw.columns) != list(exp_raw.columns):
            problems.append(
                f"col order spark={list(got_raw.columns)} duck={list(exp_raw.columns)}")
        got, exp = norm(got_raw), norm(exp_raw)
        if len(got) != len(exp):
            problems.append(f"rows spark={len(got)} duck={len(exp)}")
        if not problems:
            if [str(t) for t in got.dtypes] != [str(t) for t in exp.dtypes]:
                problems.append(
                    f"dtypes spark={[str(t) for t in got.dtypes]} duck={[str(t) for t in exp.dtypes]}")
        if not problems and value_hash(got) != value_hash(exp):
            diff = (got.astype(str) != exp.astype(str)).any(axis=1)
            idx = diff[diff].index[:3].tolist()
            problems.append(f"hash mismatch, first diff rows {idx}: "
                            f"spark={got.iloc[idx[:1]].to_dict('records') if idx else '?'} "
                            f"duck={exp.iloc[idx[:1]].to_dict('records') if idx else '?'}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    # rows-only queries (no oracle): just report
    import os
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            try:
                n = len(pd.read_parquet(p))
                print(f"ROWS {name} ({n} rows, no oracle)")
            except Exception as e:
                print(f"FAIL {name}: unreadable rows-only output ({e})")
                failures += 1
    print(f"{'PASS' if failures == 0 else 'FAIL'}: {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
