"""Capture .explain('formatted') output for named queries into
plans/<round>/<query>_<tag>.txt (round from $SPARK_GRAFT_ROUND,
default r14).

Usage: python tools/capture_plans.py <tag> <query> [<query> ...]
"""

from __future__ import annotations

import importlib.util
import io
import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    from nsl_kdd_spark.session import get_session

    spark = get_session(master="local[8]", shuffle_partitions=8)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    qs = m.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        stdout = sys.stdout
        sys.stdout = buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        rnd = os.environ.get("SPARK_GRAFT_ROUND", "r14")
        os.makedirs(f"/root/repo/plans/{rnd}", exist_ok=True)
        path = f"/root/repo/plans/{rnd}/{name}_{tag}.txt"
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
