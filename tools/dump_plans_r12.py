"""Dump `.explain("formatted")` for a named subset of catalog queries into
plans/r12/<query>_<suffix>.txt — the optimization round's before/after
plan evidence.

Usage: python tools/dump_plans_r12.py <before|after> <query> [...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, "/root/repo")

from event_streaming_spark.plans import REGISTRY  # noqa: E402
from event_streaming_spark.session import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name=f"dump-plans-r12-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].fn(spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain('formatted'), {suffix} (sf dir: {sf})\n\n")
            fh.write(buf.getvalue())
        print("wrote", path, file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
