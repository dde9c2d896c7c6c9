#!/usr/bin/env python
"""Capture `.explain("formatted")` output for round-6 optimization evidence.

Usage: python scripts/r06_plans.py <before|after> query[,query...]

Writes plans/r06/<query>_<tag>.txt. Runs at sf0.1 (the bench scale) so the
plan shapes match what the bench times; AQE initial plans are captured
(isFinalPlan=false) plus operator counts.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"
OUT = Path(__file__).resolve().parent.parent / "plans" / "r06"


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    OUT.mkdir(parents=True, exist_ok=True)

    from bop_consus_importing_rdf_spark.oracle import SPARK_QUERIES
    from bop_consus_importing_rdf_spark.session import get_spark

    spark = get_spark("r06-plans", cores=32)
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        df = SPARK_QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        text = buf.getvalue()
        import re as _re

        n_ex = len(_re.findall(r"^\(\d+\) Exchange", text, _re.M))
        n_bc = len(_re.findall(r"^\(\d+\) BroadcastExchange", text, _re.M))
        n_py = (
            text.count("BatchEvalPython")
            + text.count("ArrowEvalPython")
            + text.count("MapInPandas")
        )
        header = (
            f"== {name} ({tag}) @ {SF_DIR}\n"
            f"== shuffle exchanges: {n_ex}; broadcast exchanges: {n_bc}; "
            f"python-eval nodes: {n_py}\n\n"
        )
        (OUT / f"{name}_{tag}.txt").write_text(header + text)
        print(f"wrote {name}_{tag}.txt  (Exchange={n_ex} Broadcast={n_bc} Py={n_py})")


if __name__ == "__main__":
    main()
