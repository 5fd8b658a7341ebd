#!/usr/bin/env python3
"""Dev-side replica of the driver's correctness gate: run each oracle
SQL in DuckDB against the sf tables and compare with the Spark parquet
dumps (column-name-sorted, row-sorted, exact values)."""
import json, sys, glob
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    # synthetic corpora (CorpusGen) carry only documents/embeddings —
    # skip absent tables so the same gate runs on the 10×/100× dirs
    try:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    except Exception:
        pass

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        rel = con.sql(sql)
        # STRICT DTYPE GATE: the driver hashes the SERIALIZED value, so a
        # DuckDB HUGEINT (what integer sum() widens to) or DECIMAL column
        # hashes differently from Spark's BIGINT/DOUBLE even when every
        # value is identical (round-11 corpus_pack). Fail loudly here so
        # the dev gate can never again pass a row the driver hashes red.
        bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
               if str(t) in ("HUGEINT", "UHUGEINT")
               or str(t).startswith("DECIMAL")]
        if bad:
            print(f"{name:24s} ORACLE-DTYPE {bad} (cast to BIGINT/DOUBLE in the SQL)")
            fails.append(name)
            continue
        exp = rel.df()
    except Exception as e:
        print(f"{name:24s} ORACLE-ERROR {str(e)[:160]}")
        fails.append(name)
        continue
    try:
        got = pd.concat([pd.read_parquet(p) for p in
                         glob.glob(f"{outdir}/{name}/*.parquet")])
    except Exception as e:
        print(f"{name:24s} SPARK-MISSING {e}")
        fails.append(name)
        continue
    exp = exp[sorted(exp.columns)]
    got = got[sorted(got.columns)]
    if list(exp.columns) != list(got.columns):
        print(f"{name:24s} SCHEMA exp={list(exp.columns)} got={list(got.columns)}")
        fails.append(name)
        continue
    exp = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    if len(exp) != len(got):
        print(f"{name:24s} ROWS exp={len(exp)} got={len(got)}")
        fails.append(name)
        continue
    # normalize dtypes for value compare — but first require the two
    # sides to agree on the int/float/other CLASS: the driver hashes
    # serialized values, so int 50 vs float 50.0 is a driver mismatch
    # even though a normalized compare says equal.
    ok = True
    for c in exp.columns:
        e, g = exp[c], got[c]
        if (e.dtype.kind in "iu") != (g.dtype.kind in "iu"):
            print(f"{name:24s} DTYPE col={c} exp={e.dtype} got={g.dtype}")
            ok = False
            break
        if e.dtype.kind in "fc" or g.dtype.kind in "fc":
            import numpy as np
            ee, gg = e.astype(float).values, g.astype(float).values
            # The driver hashes the SERIALIZED value, so -0.0 vs 0.0 is
            # a mismatch even though == says equal — compare sign bits too.
            same = (pd.isna(ee) & pd.isna(gg)) | (
                (ee == gg) & (np.signbit(ee) == np.signbit(gg)))
            if not same.all():
                idx = int(np.argmax(~same))
                print(f"{name:24s} VAL col={c} row={idx} exp={ee[idx]!r} got={gg[idx]!r}")
                ok = False
                break
        else:
            if not (e.astype(str).values == g.astype(str).values).all():
                bad = (e.astype(str).values != g.astype(str).values)
                import numpy as np
                idx = int(np.argmax(bad))
                print(f"{name:24s} VAL col={c} row={idx} exp={e.iloc[idx]!r} got={g.iloc[idx]!r}")
                ok = False
                break
    if ok:
        print(f"{name:24s} OK rows={len(exp)}")
    else:
        fails.append(name)

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} OK; fails: {fails}")
sys.exit(1 if fails else 0)
