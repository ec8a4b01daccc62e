#!/usr/bin/env python3
"""Dev-only oracle checker (mirrors the driver's DuckDB correctness gate).

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>

For each query result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB against the sf parquet tables,
sorts columns by name and rows by all columns, and compares values.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # lists -> tuples so they sort/compare
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or hasattr(v, "__len__") and not isinstance(v, str)).any():
            df[c] = df[c].map(lambda v: tuple(v) if not isinstance(v, str) and hasattr(v, "__iter__") else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet"); n_fail += 1; continue
        try:
            spark_df = norm(con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf())
            ora_df = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1; continue
        if list(spark_df.columns) != list(ora_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(ora_df.columns)}"); n_fail += 1; continue
        if len(spark_df) != len(ora_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(ora_df)}"); n_fail += 1; continue
        eq = spark_df.astype(str).equals(ora_df.astype(str))
        if eq:
            print(f"PASS {name} ({len(spark_df)} rows)"); n_pass += 1
        else:
            diff = (spark_df.astype(str) != ora_df.astype(str))
            bad = diff.any(axis=1)
            print(f"FAIL {name}: value mismatch in {int(bad.sum())}/{len(spark_df)} rows")
            print("  spark:", spark_df[bad].head(3).to_dict("records"))
            print("  oracle:", ora_df[bad].head(3).to_dict("records"))
            n_fail += 1
    # Rows-only queries (no oracle SQL): sane output + recall gates.
    # Any column named like a recall self-report must clear the
    # reference's 0.70 threshold — this is what catches a broken
    # truth/scoring path that row counts alone would hide.
    all_dirs = sorted(d for d in os.listdir(out_dir)
                      if os.path.isdir(f"{out_dir}/{d}") and d not in oracles)
    for name in all_dirs:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet"); n_fail += 1; continue
        df = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if len(df) == 0:
            print(f"FAIL {name}: empty result"); n_fail += 1; continue
        recall_cols = [c for c in df.columns
                       if "recall" in c.lower() and not c.lower().endswith("_gate")]
        # avg/pair recall: the reference's 0.70 gate; min over queries:
        # looser (a single hard query may dip without the path being
        # broken). NaN FAILS explicitly — "NaN < gate" is False, so a
        # 0/0 recall would otherwise print PASS, the exact broken-
        # scoring case this gate exists to catch.
        # Units: *_per_10k columns are fixed-point integers on the 10^4
        # scale — normalized BEFORE gating (the r13 units bug: a per-10k
        # 6863 must gate as 0.6863, not pass "6863 >= 0.70" trivially).
        # A sibling `<col>_gate` column (same units) is a deliberate
        # per-row bar: that column gates by worst margin >= 0 instead.
        import math
        bad = []
        for c in recall_cols:
            scale = 10000.0 if c.lower().endswith("_per_10k") else 1.0
            if f"{c}_gate" in df.columns:
                v = float((df[c] - df[f"{c}_gate"]).min()) / scale
                if math.isnan(v) or v < 0.0:
                    bad.append((f"{c}_margin", v, "gate 0.0"))
            else:
                v = float(df[c].min()) / scale
                gate = 0.30 if c.lower().startswith("min_") else 0.70
                if math.isnan(v) or v < gate:
                    bad.append((c, v, f"gate {gate}"))
        # pass_* columns are explicit invariants (monotone sweep
        # frontiers, top-end recall, designed class ordering): every
        # row must carry 1 — a 0 means the invariant itself failed.
        pass_cols = [c for c in df.columns if c.lower().startswith("pass_")]
        for c in pass_cols:
            v = float(df[c].min())
            if math.isnan(v) or v < 1.0:
                bad.append((c, v, "gate 1.0"))
        if bad:
            print(f"FAIL {name}: recall gate failed: {bad}"); n_fail += 1
        else:
            gated = recall_cols + pass_cols
            extra = f", gates {[f'{c}={float(df[c].min()):.2f}' for c in gated]}" if gated else ""
            print(f"PASS {name} ({len(df)} rows, rows-only{extra})"); n_pass += 1
    # Cross-round DRIFT gate (hard since round 12): Verify annotates
    # every RECALL metric with prev/drift_ok (value >= previous round's
    # value - 0.05). The gated values are deterministic given the
    # fixture, so drift_ok=false is a REAL behavior change even when the
    # absolute 0.70/0.30/1.0 gates still pass — e.g. a 0.99 -> 0.72
    # recall erosion. A deliberate algorithm change that legitimately
    # trades >0.05 of a metric must update/remove the stale RECALL.json
    # entry consciously, not ride through.
    recall_path = f"{out_dir}/recall.json"
    if os.path.exists(recall_path):
        rec = json.load(open(recall_path))
        for qname in sorted(rec):
            if qname == "_meta":
                continue
            drifted = [(c, m) for c, m in rec[qname].items()
                       if isinstance(m, dict) and m.get("drift_ok") is False]
            if drifted:
                for c, m in drifted:
                    print(f"FAIL {qname}: drift gate: {c}={m.get('value')} "
                          f"< prev {m.get('prev')} - 0.05")
                n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
