"""Drive-log health gate — prove the capture+scan pipeline fires.

The gate itself runs in tests/conftest.py around the session ``spark``
fixture; these tests pin (a) the scanner's verdicts on planted text and
(b) that real log4j2 events emitted by the JVM land in the capture file
and are flagged — i.e. a future janino fallback or ignored hint cannot
slip past because the appender silently stopped working.

Planted events carry ``SELFTEST_MARKER`` so the session-wide gate (which
also sees them — every test here uses its OWN appender name and leaves
the gate appender untouched) correctly exempts them.
"""

from __future__ import annotations

import os
import tempfile
import time

from flink_snappydata_spark.plans import loghealth


def test_scanner_flags_codegen_fallback_and_ignored_hints():
    text = "\n".join(
        [
            "WARN SomeLogger: all quiet",
            "ERROR CodeGenerator: Failed to compile: org.codehaus."
            "commons.compiler.InternalCompilerException: Code grows "
            "beyond 64 KB",
            "WARN org.apache.spark.sql.catalyst.analysis.HintErrorLogger: "
            "Hint (strategy=broadcast) is not supported in the query",
        ]
    )
    hits = loghealth.scan_log_health(text)
    assert len(hits) == 2
    assert any("janino" in h for h in hits)
    assert any("silently ignored" in h for h in hits)


def test_scanner_exempts_selftest_marker_and_passes_clean_logs():
    assert loghealth.scan_log_health("") == []
    assert loghealth.scan_log_health("WARN X: benign warning\n") == []
    planted = (
        f"ERROR CodeGenerator: {loghealth.SELFTEST_MARKER} "
        "Failed to compile fragment\n"
    )
    assert loghealth.scan_log_health(planted) == []


def test_capture_pipeline_fires_on_real_log4j_events(spark):
    """End-to-end known-bad case: plant both bad signatures through the
    REAL log4j2 loggers Spark uses; they must land in a throwaway
    capture file and be flagged by the scanner."""
    path = os.path.join(tempfile.mkdtemp(prefix="fss-lh-self-"), "cap.log")
    loghealth.attach_log_capture(spark, path, name="fss-lh-selftest")
    try:
        jvm = spark._jvm
        LogManager = jvm.org.apache.logging.log4j.LogManager
        LogManager.getLogger(
            "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator"
        ).error(f"{loghealth.SELFTEST_MARKER} Failed to compile: planted")
        LogManager.getLogger(
            "org.apache.spark.sql.catalyst.analysis.HintErrorLogger"
        ).warn(f"{loghealth.SELFTEST_MARKER} Hint (strategy=junk) planted")
        deadline = time.time() + 5
        text = ""
        while time.time() < deadline:
            text = open(path).read() if os.path.exists(path) else ""
            if "Failed to compile" in text and "HintErrorLogger" in text:
                break
            time.sleep(0.1)
        assert "Failed to compile" in text and "HintErrorLogger" in text, text
        # the scanner flags exactly these two were they not marker-exempt:
        unmarked = text.replace(loghealth.SELFTEST_MARKER, "")
        assert len(loghealth.scan_log_health(unmarked)) == 2, unmarked
        # and the marker exemption holds for the session gate:
        assert loghealth.scan_log_health(text) == []
    finally:
        loghealth.detach_log_capture(spark, name="fss-lh-selftest")


def test_reattach_replaces_appender_by_name(spark):
    """attach_log_capture is idempotent per name — no duplicate
    appenders stack when a capture is re-attached."""
    d = tempfile.mkdtemp(prefix="fss-lh-re-")
    p1, p2 = os.path.join(d, "a.log"), os.path.join(d, "b.log")
    loghealth.attach_log_capture(spark, p1, name="fss-lh-reattach")
    loghealth.attach_log_capture(spark, p2, name="fss-lh-reattach")
    try:
        jvm = spark._jvm
        lg = jvm.org.apache.logging.log4j.LogManager.getLogger("fss.lh.test")
        lg.warn(f"{loghealth.SELFTEST_MARKER} after-reattach")
        time.sleep(0.3)
        assert "after-reattach" in open(p2).read()
        assert "after-reattach" not in (
            open(p1).read() if os.path.exists(p1) else ""
        )
    finally:
        loghealth.detach_log_capture(spark, name="fss-lh-reattach")
