"""Ad-hoc oracle-parity check for a subset of keys at one or more SFs.

Usage: python tools/parity_subset.py [--root DIR] sf0.001,sf0.01 key1 ...

The testdata root defaults to the parent of $SPARK_GRAFT_SF_DIR when
set (mirroring tools/time_keys.py), else /root/testdata.  Reuses the
exact comparison logic of tests/test_oracle_parity.py so a pass here
means the same thing as the suite's parity gate.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import duckdb  # noqa: E402

from marketstore_spark import get_session  # noqa: E402
from marketstore_spark.catalog import TABLES  # noqa: E402
from marketstore_spark.queries import ORACLE_SQL, SPARK_QUERIES  # noqa: E402
from test_oracle_parity import _compare, _duck  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    if argv and argv[0] == "--root":
        root = argv[1]
        argv = argv[2:]
    else:
        env_sf = os.environ.get("SPARK_GRAFT_SF_DIR")
        root = os.path.dirname(env_sf.rstrip("/")) if env_sf else "/root/testdata"
    sfs = argv[0].split(",")
    keys = argv[1:]
    spark = get_session()
    bad = []
    for sf in sfs:
        sf_dir = os.path.join(root, sf)
        con = _duck(sf_dir)
        for k in keys:
            if k not in ORACLE_SQL or ORACLE_SQL[k] is None:
                print(f"{sf} {k}: no oracle (skipped)")
                continue
            sdf = SPARK_QUERIES[k](spark, sf_dir).toPandas()
            ddf = con.execute(ORACLE_SQL[k]).fetchdf()
            try:
                _compare(k, sdf, ddf)
                print(f"{sf} {k}: OK ({len(sdf)} rows)")
            except AssertionError as e:
                bad.append((sf, k, str(e)))
                print(f"{sf} {k}: FAIL {e}")
        con.close()
    print("RESULT:", "FAIL" if bad else "ALL OK")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
