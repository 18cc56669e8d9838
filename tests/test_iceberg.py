"""Iceberg source end-to-end (north-rule input: Iceberg transcript
tables).  Runs in a subprocess because ``spark.jars.packages`` resolves
only at SparkContext creation (the suite's shared session can't add it).

When the runtime jar is resolvable the probe writes the fixture as an
Iceberg table (local hadoop catalog), reads it back through
``cli.read_docs(..., "iceberg")``, builds the index and answers
queries.  In this sandbox there is no network route to Maven Central
(``curl https://repo1.maven.org/...`` → exit 6, host resolution
failure), so the probe reports ICEBERG_UNAVAILABLE and the test skips
with that proof recorded in the skip reason.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(__file__)


def test_iceberg_source_end_to_end(tmp_path):
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "iceberg_probe.py"), str(tmp_path / "wh")],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=os.path.dirname(HERE),
    )
    out = proc.stdout + proc.stderr
    if "ICEBERG_UNAVAILABLE" in out:
        reason = [l for l in out.splitlines() if "ICEBERG_UNAVAILABLE" in l][0]
        pytest.skip(
            "Iceberg runtime jar not resolvable in this sandbox (no route to "
            f"Maven Central): {reason[:300]}"
        )
    assert proc.returncode == 0, out[-3000:]
    assert "ICEBERG_OK" in out, out[-3000:]
