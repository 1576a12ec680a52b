"""Capture .explain('formatted') for named driver queries into
plans/r06/<query>_{before,after}.txt.

'after'  = the current tree (/root/repo).
'before' = the round-start tree (a git worktree checkout, passed via
           --base DIR; run separately because a process can only hold
           one emf_spark import).

Usage:
  python tools/capture_plans.py after <query> [...]
  python tools/capture_plans.py before --base /tmp/r6_base <query> [...]
Plans over 200k chars are truncated with a size note (the blowup cases
are exactly the point of the evidence).
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

OUT = Path("/root/repo/plans/r06")
SF = "/root/testdata/sf0.1"
CAP = 200_000


def main():
    args = sys.argv[1:]
    mode = args.pop(0)
    base = "/root/repo"
    if args and args[0] == "--base":
        base = args[1]
        args = args[2:]
    sys.path.insert(0, base)
    import __spark_entry__ as ent
    from emf_spark.session import get_spark

    spark = get_spark(f"plans_{mode}", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    OUT.mkdir(parents=True, exist_ok=True)
    q = ent.queries()
    for name in args:
        df = q[name](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        txt = buf.getvalue()
        if len(txt) > CAP:
            txt = (f"# formatted plan is {len(txt)} chars; truncated to "
                   f"{CAP}.\n\n") + txt[:CAP]
        (OUT / f"{name}_{mode}.txt").write_text(txt)
        print(f"{name}_{mode}: {len(txt)} chars")
    spark.stop()


if __name__ == "__main__":
    main()
