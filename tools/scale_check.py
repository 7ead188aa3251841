"""10x scaling stress: run named queries at sf0.1 and at a replica dir
(default /tmp/sfbig) in ONE session; print wall seconds + ratio.

Usage: python tools/scale_check.py [--big DIR] q1_pricing_summary ...
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from event_streaming_spark.plans import REGISTRY
from event_streaming_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/tmp/sfbig")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()
    spark = get_spark("scale-check")
    print(f"| query | 1x | 10x | ratio |", flush=True)
    print(f"|---|---|---|---|", flush=True)
    for name in args.queries:
        q = REGISTRY[name]
        times = []
        for sf_dir in (args.base, args.big):
            t0 = time.monotonic()
            q.fn(spark, sf_dir).collect()
            times.append(time.monotonic() - t0)
        print(f"| {name} | {times[0]:.2f} | {times[1]:.2f} | {times[1]/times[0]:.1f} |", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
