#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
against DuckDB oracles and diff. Usage:
    python3 scripts/local_verify.py /tmp/verify_out /root/testdata/sf0.01
"""
import sys, json, math, glob, os
import duckdb

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet written"); n_fail += 1; continue
        got = con.sql(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows)"); n_pass += 1
            continue
        try:
            exp = con.sql(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        # driver-style compare: sort columns by name, compare values
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        # dtype parity: the driver hashes typed values, so an oracle
        # whose sum()/count() leaks HUGEINT (-> float64 in fetchdf)
        # hash-mismatches even when every value is numerically equal.
        # Python == can't see it (4568 == 4568.0), so compare dtype
        # KINDS (int vs float vs object ...) explicitly. Same-kind
        # width differences (int32 vs int64) are warned, not failed:
        # the driver compares stringified cell values, which width
        # does not change.
        # int vs uint is NOT a leak (the driver's stringified values are
        # identical); and a float-vs-int mismatch where the float side
        # carries NaN is pandas NULL-masking (a nullable int column
        # materializes as float64 on one engine only) — value-compare
        # those instead of false-FAILing. A float-vs-int mismatch with
        # NO NaN anywhere stays a hard FAIL: that is the HUGEINT-style
        # type leak this check exists to catch.
        dt_bad = []
        for c in got.columns:
            gk, ek = got[c].dtype.kind, exp[c].dtype.kind
            if gk == ek:
                continue
            if {gk, ek} <= {"i", "u"}:
                print(f"warn {name}: col {c} int/uint kind"
                      f" ({got[c].dtype} vs {exp[c].dtype}); value-comparing")
                continue
            if {gk, ek} in ({"f", "i"}, {"f", "u"}):
                fl = got[c] if gk == "f" else exp[c]
                # NULL masking only ever produces INTEGRAL floats (the
                # int column's values plus NaN); a float side with a
                # fractional value is a genuine engine-level float/int
                # type leak that happens to sit on a nullable column —
                # the driver's stringified compare ('3.5' vs '3') would
                # FAIL it, so the replica must too, NaN or not.
                if fl.isna().any() and bool((fl.dropna() % 1 == 0).all()):
                    print(f"warn {name}: col {c} float from NULL masking"
                          f" ({got[c].dtype} vs {exp[c].dtype});"
                          f" value-comparing")
                    continue
            dt_bad.append((c, str(got[c].dtype), str(exp[c].dtype)))
        if dt_bad:
            c, gd, ed = dt_bad[0]
            print(f"FAIL {name}: dtype kind col {c}: got {gd} vs oracle {ed}"
                  f" (oracle type leak? cast the oracle column)")
            n_fail += 1; continue
        for c in got.columns:
            if str(got[c].dtype) != str(exp[c].dtype):
                print(f"warn {name}: col {c} dtype width got"
                      f" {got[c].dtype} vs oracle {exp[c].dtype}")
        bad = None
        for c in got.columns:
            gv, ev = got[c].tolist(), exp[c].tolist()
            for i, (g, e) in enumerate(zip(gv, ev)):
                # list/array cells (if a gate ever emits them): compare as
                # plain lists — pd.isna is ambiguous on arrays
                if hasattr(g, "tolist"):
                    g = g.tolist()
                if hasattr(e, "tolist"):
                    e = e.tolist()
                if isinstance(g, list) or isinstance(e, list):
                    def _eq(a, b):
                        if isinstance(a, float) and isinstance(b, float) \
                                and a != a and b != b:
                            return True  # NaN == NaN, like the scalar path
                        return a == b
                    ok = (isinstance(g, list) and isinstance(e, list)
                          and len(g) == len(e)
                          and all(_eq(a, b) for a, b in zip(g, e)))
                    if not ok:
                        bad = (c, i, g, e); break
                    continue
                gn = g != g if isinstance(g, float) else g is None
                en = e != e if isinstance(e, float) else e is None
                try:
                    import pandas as pd
                    gn = pd.isna(g); en = pd.isna(e)
                except Exception:
                    pass
                if gn and en:
                    continue
                if gn != en or g != e:
                    bad = (c, i, g, e); break
            if bad: break
        if bad:
            c, i, g, e = bad
            print(f"FAIL {name}: col {c} row {i}: got {g!r} exp {e!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
