from __future__ import annotations

import os
import tempfile

import pytest

from flink_snappydata_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    """One session for the whole suite, wrapped in the drive-log health
    gate: every JVM WARN/ERROR emitted while the suite (including the
    full 210-query oracle-parity drive) runs is captured to a file, and
    teardown fails the run on silent-performance-killer signatures —
    janino codegen fallback ("Failed to compile") and ignored join
    hints (HintErrorLogger). Round-10 lesson: language_id ran its
    aggregation stages INTERPRETED for nine rounds with the only
    symptom an ERROR line nobody grepped; this makes the grep
    structural. See flink_snappydata_spark/plans/loghealth.py.
    """
    from flink_snappydata_spark.plans import loghealth

    spark = get_spark(app_name="fss-tests", shuffle_partitions=8)
    log_path = os.path.join(
        tempfile.mkdtemp(prefix="fss-loghealth-"), "drive.log"
    )
    loghealth.attach_log_capture(spark, log_path)
    yield spark
    try:
        text = open(log_path).read()
    except FileNotFoundError:  # no WARN+ at all — vacuously healthy
        return
    hits = loghealth.scan_log_health(text)
    assert not hits, (
        "drive-log health gate: %d silent-performance-killer log line(s) "
        "during this pytest session (full log: %s):\n%s"
        % (len(hits), log_path, "\n".join(hits[:20]))
    )
