"""Regression net for session-ownership bugs (round-1 postmortem): every
query must execute under a deliberately PLAIN SparkSession — no
session.get_spark defaults, exactly like the verification driver's own
harness. Round 1 lost all 7 events-table queries to this class of bug
(nanosAsLong lived only in get_spark).

Runs in a subprocess so the tuned session fixture in conftest can't leak
into getOrCreate().
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import sys
sys.path.insert(0, sys.argv[1])
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[4]").appName("plain").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry_mod

failures = []
df = entry_mod.entry(spark)
assert df.count() >= 0

for name, fn in entry_mod.queries().items():
    try:
        fn(spark, "/root/testdata/sf0.001").count()
    except Exception as exc:  # noqa: BLE001
        failures.append(f"{name}: {type(exc).__name__}: {exc}")

if failures:
    print("PLAIN-SESSION FAILURES:\n" + "\n".join(failures))
    sys.exit(1)
print("ALL_PLAIN_OK")
"""


def test_all_queries_execute_under_plain_session():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, REPO_ROOT],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO_ROOT,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout[-4000:]}\nstderr:\n{proc.stderr[-2000:]}"
    assert "ALL_PLAIN_OK" in proc.stdout
