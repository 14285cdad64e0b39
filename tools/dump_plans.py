"""Regenerate the physical-plan evidence behind PLANS.md: dump
`.explain("formatted")` for every headline query to plans/ so a reviewer
can diff plan shapes across rounds.

Usage: python tools/dump_plans.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import EXTRA_DETAIL, HEADLINE
from clockpipe_spark.queries import all_queries
from clockpipe_spark.session import get_spark


def main() -> None:
    # flags out before positionals (ADVICE r16: `dump_plans.py --detail`
    # used to parse '--detail' as sf_dir and fail every load)
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "plans"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-dump", master="local[4]", shuffle_partitions=4)
    queries = all_queries()
    # r16: dump EVERY registry query, not just the bench detail set —
    # the lint previously machine-audited 75/180 plans and the other
    # 105 were only ever eyeballed. --detail restores the old subset
    # for quick iteration probes.
    names = (
        list(HEADLINE + EXTRA_DETAIL)
        if "--detail" in sys.argv
        else sorted(queries)
    )
    for name in names:
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {out_dir}/{name}.txt")


if __name__ == "__main__":
    main()
