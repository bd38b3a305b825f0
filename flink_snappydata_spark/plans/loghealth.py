"""Drive-log health gate — turn silent Spark log pathologies into failures.

Round-10 lesson: ``language_id``'s inlined argmax blew janino's method
limits and Spark fell back to INTERPRETED execution for the aggregation
stages of two headline queries. The only symptom was an ERROR-level
"Failed to compile" line in the drive logs — correctness stayed green,
bench showed 2–2.6× left on the table, and it ran that way for nine
rounds because nothing scanned the logs. Same class: ``HintErrorLogger``
WARNs when a join hint is silently ignored (the ``timeline_gapfill``
preserved-side broadcast no-op).

This module makes the scan structural:

* :func:`attach_log_capture` — bolt a log4j2 ``FileAppender`` (WARN+)
  onto the running session's root logger so every JVM warning emitted
  while the 210-query parity drive runs inside pytest lands in one file.
* :func:`scan_log_health` — grep that file for the known
  silent-performance-killer signatures and return the offending lines.

``tests/conftest.py`` wires both around the session-scoped ``spark``
fixture: the whole pytest run executes under capture and the teardown
asserts zero hits, so a janino fallback or ignored hint introduced by
ANY future change fails the suite instead of hiding in stderr.

Lines carrying :data:`SELFTEST_MARKER` are exempt — the gate's own
prove-it-fires test plants synthetic bad events through the real log4j
pipeline and must not fail the session that hosts it.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: Signatures of silent performance pathologies. Each entry is
#: (pattern, why-it-matters) — the why is echoed in the failure message.
BAD_PATTERNS: tuple[tuple[str, str], ...] = (
    (
        "Failed to compile",
        "janino whole-stage-codegen fallback: the stage runs INTERPRETED "
        "(the round-10 language_id class, 2-2.6x slower)",
    ),
    (
        "HintErrorLogger",
        "a join hint was silently ignored (e.g. broadcast on the "
        "preserved side of an outer join) - the pinned strategy is not "
        "actually in effect",
    ),
)

#: Marker exempting a log line from the gate — used by the self-test
#: that proves the capture+scan pipeline fires on real log4j events.
SELFTEST_MARKER = "[loghealth-selftest]"

_APPENDER_NAME = "fss-loghealth-gate"


def attach_log_capture(
    spark: SparkSession, path: str, name: str = _APPENDER_NAME
) -> None:
    """Attach a WARN-threshold log4j2 ``FileAppender`` writing to
    ``path`` on the JVM root logger. Idempotent per appender ``name``:
    re-attaching under the same name replaces the previous appender
    (log4j2's ``addAppender`` keys by name). The gate's self-tests pass
    their own name so a throwaway capture never displaces the
    session-wide gate appender."""
    jvm = spark._jvm
    layout = (
        jvm.org.apache.logging.log4j.core.layout.PatternLayout.newBuilder()
        .withPattern("%p %c: %m%n")
        .build()
    )
    builder = jvm.org.apache.logging.log4j.core.appender.FileAppender.newBuilder()
    builder.setName(name)
    builder.withFileName(path)
    builder.withAppend(False)
    builder.setLayout(layout)
    appender = builder.build()
    appender.start()
    ctx = jvm.org.apache.logging.log4j.core.LoggerContext.getContext(False)
    config = ctx.getConfiguration()
    root = config.getRootLogger()
    # log4j2's LoggerConfig stacks a second AppenderControl for the same
    # name rather than replacing it — remove first for true idempotence,
    # and STOP the displaced appender: removeAppender only detaches the
    # control, leaving the old FileAppender started with its stream open
    # (one leaked descriptor per re-attach in a long-lived JVM).
    old_appender = root.getAppenders().get(name)
    root.removeAppender(name)
    if old_appender is not None:
        old_appender.stop()
    root.addAppender(appender, jvm.org.apache.logging.log4j.Level.WARN, None)
    ctx.updateLoggers()


def detach_log_capture(spark: SparkSession, name: str = _APPENDER_NAME) -> None:
    """Remove the named capture appender (used by tests that attach a
    throwaway capture; the session-wide gate appender stays attached
    unless explicitly named)."""
    jvm = spark._jvm
    ctx = jvm.org.apache.logging.log4j.core.LoggerContext.getContext(False)
    root = ctx.getConfiguration().getRootLogger()
    appender = root.getAppenders().get(name)
    root.removeAppender(name)
    if appender is not None:
        appender.stop()  # close the file stream, not just the control
    ctx.updateLoggers()


def scan_log_health(text: str) -> list[str]:
    """Return every log line matching a :data:`BAD_PATTERNS` signature,
    annotated with why it matters. Self-test-marked lines are exempt.
    Empty list == healthy drive."""
    hits: list[str] = []
    for line in text.splitlines():
        if SELFTEST_MARKER in line:
            continue
        for pattern, why in BAD_PATTERNS:
            if pattern in line:
                hits.append(f"{line.strip()[:300]}  [{why}]")
                break
    return hits
