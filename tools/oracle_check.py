#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Dev-only tool (not part of the shipped library): runs each
oracle_sql.json query in DuckDB over the sf-dir parquet tables and
compares with the Verify parquet dumps (column names sorted, values
normalized, rows sorted) so oracle mismatches surface before the
driver's round gate.

Float columns compare BIT-EXACTLY by default, mirroring the driver's
hash compare; pass --approx for the old 1e-9 tolerance when triaging
whether a failure is a logic bug or pure float drift.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [--approx]
"""
import json
import os
import re
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: str(v) if not isinstance(v, (list,)) else json.dumps(list(v)))
    try:
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    except Exception:
        pass
    return df.reset_index(drop=True)


def main() -> None:
    approx = "--approx" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir, out_dir = args[0], args[1]
    con = duckdb.connect()
    # DuckDB's default memory limit can mis-detect container RAM and
    # OOM the replica-corpus runs (semdedup/lsh_tune at the 20x dir
    # failed tiny block allocations with 120 GB free); pin a generous
    # limit, overridable via ORACLE_MEM. Capped at 80% of detected
    # physical RAM so a small host keeps DuckDB's managed spilling
    # instead of an OS-level OOM kill. Dev tool only — the driver's
    # replica runs at sf0.01 where this never binds.
    mem = os.environ.get("ORACLE_MEM")
    if not mem:
        # sysconf keys are platform-dependent — only probe them when
        # ORACLE_MEM is unset, and fall back to a fixed default rather
        # than crashing at startup on hosts without SC_PHYS_PAGES
        try:
            phys_gb = (os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
                       ) * 0.8 / 2**30
            mem = f"{max(1, min(64, int(phys_gb)))}GB"
        except (AttributeError, OSError, ValueError):
            mem = "16GB"
    # numeric GB value of `mem`, kept for the OOM-retry step-down so
    # the retry never re-parses current_setting's pretty-printed
    # value (round-15 fix: a MiB/TiB-unit print misparsed under the
    # old rstrip-based parse, masking the original OOM). Accepts the
    # unit spellings DuckDB does; unit-less means bytes.
    m = re.match(r"^\s*([0-9.]+)\s*([KMGT]i?B)?\s*$", str(mem), re.IGNORECASE)
    unit_gb = {None: 2**-30, "KB": 1e3 / 2**30, "KIB": 2**-20,
               "MB": 1e6 / 2**30, "MIB": 2**-10, "GB": 1e9 / 2**30,
               "GIB": 1.0, "TB": 1e12 / 2**30, "TIB": 2**10}
    mem_gib = (float(m.group(1)) * unit_gb[m.group(2) and m.group(2).upper()]
               if m else 16.0)
    con.execute(f"SET memory_limit='{mem}'")
    # bound spill so a heavy replica replay fails inside DuckDB's
    # budget instead of filling the host disk (the r100 ann_ivf run
    # wrote .tmp/ until the device was full); overridable
    tmp = os.environ.get("ORACLE_TMP", ".tmp")
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute("SET max_temp_directory_size='"
                + os.environ.get("ORACLE_TMP_MAX", "60GB") + "'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = norm(con.execute(sql).fetchdf())
        except Exception as e:
            # Out-of-memory retry at 75% of the limit (round-14
            # finding, k_core@r60): DuckDB's managed spilling only
            # engages as the memory limit approaches, so a limit set
            # near the box's PHYSICAL ceiling can OOM on allocation
            # where a tighter limit spills and completes. One retry,
            # one step down — a replay that fails both ways is
            # genuinely method-bound.
            if "Out of Memory" in str(e):
                try:
                    # step down from the script's OWN numeric value —
                    # never re-parse current_setting's pretty print
                    lower = f"{max(mem_gib * 0.75, 0.1):.1f}GiB"
                    print(f"WARN {name}: OOM at {mem}; retrying once at {lower} "
                          "(managed spilling engages earlier)", file=sys.stderr)
                    con.execute(f"SET memory_limit='{lower}'")
                    exp = norm(con.execute(sql).fetchdf())
                    con.execute(f"SET memory_limit='{mem}'")
                except Exception as e2:
                    print(f"FAIL {name}: duckdb error after OOM retry: {e2}")
                    try:
                        con.execute(f"SET memory_limit='{mem}'")
                    except Exception:
                        pass
                    continue
            else:
                print(f"FAIL {name}: duckdb error: {e}")
                continue
        try:
            got = norm(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            continue
        mismatch = None
        for c in exp.columns:
            e_col, g_col = exp[c], got[c]
            # The driver's hash compare is dtype-sensitive: a DuckDB
            # HUGEINT/DECIMAL final projection arrives here as float64
            # while Spark ships int64, and values that compare equal
            # after float64 normalization still hash-differ driver-side
            # (the round-7 mix_budget fail). Fail loudly on kind drift
            # instead of normalizing it away.
            if (e_col.dtype.kind in "iu") != (g_col.dtype.kind in "iu"):
                mismatch = (f"col {c} dtype kind mismatch: spark={g_col.dtype} "
                            f"duck={e_col.dtype} (driver hash compare WILL fail; "
                            f"CAST the oracle's final projection)")
                break
            if e_col.dtype.kind == "f" or g_col.dtype.kind == "f":
                if approx:
                    ok = ((e_col - g_col).abs() < 1e-9) | (e_col.isna() & g_col.isna())
                else:  # bit-exact, like the driver's hash compare
                    ok = (e_col.astype("float64").map(lambda v: v.hex() if v == v else "nan")
                          == g_col.astype("float64").map(lambda v: v.hex() if v == v else "nan"))
            else:
                ok = (e_col == g_col) | (e_col.isna() & g_col.isna())
            if not ok.all():
                i = int((~ok).idxmax())
                mismatch = f"col {c} row {i}: spark={got[c][i]!r} duck={exp[c][i]!r}"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
        else:
            n_ok += 1
            print(f"OK   {name} ({len(exp)} rows)")
    print(f"{n_ok}/{len(oracle)} queries match")


if __name__ == "__main__":
    main()
