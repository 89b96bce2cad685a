"""The syslog parse pipeline (SURVEY §2.2, P1-P8) as native Spark columns.

Re-expresses ``ParseLog`` (`lib/lopParse.go:29-81`) — the reference's entire
transform stage — as ONE whole-stage-codegen-friendly projection.  No UDFs:
every step is a built-in column expression, so at 100 TB the parse runs
JVM-side inside codegen with zero Python/serialization cost.

Exact semantics reproduced (and golden-tested in tests/test_parse.py):

P1  first-space split        `lib/lopParse.go:31-33`  SplitN(raw," ",2)
P2  malformed-line fallback  `lib/lopParse.go:34-42`  no space OR <2 header
    tokens → {Severity=6, Categories=["unknown"], Message=raw}.
    NB: the reference indexes parts[1] BEFORE its length check
    (`lopParse.go:33` vs `:34`) and panics on space-free datagrams; we
    implement the evidently-intended fallback instead (documented deviation).
P3  comma split of header    `lib/lopParse.go:45`
P4  category assembly        `lib/lopParse.go:46-48`  [topics[0]] + topics[2:]
    (topics[1] is reserved for the severity keyword)
P5  severity keyword → enum  `lib/lopParse.go:51-72`  fatal|emergency→0 …
    debug|packet|raw→7; UNKNOWN token → Severity=6 AND the token is
    appended to Categories (`lopParse.go:69-71`)
P6  ingest-time timestamp    `lib/lopParse.go:37,76`  time.Now() → by default
    current_timestamp(); tests inject a fixed clock column for determinism
P7  peer-address column      `main.go:79`, `lib/lopParse.go:36,75`
P8  raw→string decode        `main.go:86` (source already yields strings)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schema import DEFAULT_SEVERITY, SEVERITY_KEYWORDS


def _severity_expr(token: Column) -> Column:
    """Keyword → enum lookup (`lib/lopParse.go:51-72`); null when unknown."""
    pairs: list[Column] = []
    for kw, level in SEVERITY_KEYWORDS.items():
        pairs.append(F.lit(kw))
        pairs.append(F.lit(level))
    lookup = F.create_map(*pairs)
    return F.element_at(lookup, token)


def parse_syslog_columns(
    raw: Column, device: Column, clock: Column | None = None
) -> dict[str, Column]:
    """Return the five LogData columns computed from a raw line + peer addr.

    ``clock`` overrides the ingest timestamp (reference uses time.Now(),
    `lib/lopParse.go:37,76`); pass a fixed column in tests for determinism.
    """
    ts = clock if clock is not None else F.current_timestamp()

    # P1: first-space split; limit=2 keeps all later spaces in the message.
    parts = F.split(raw, " ", 2)
    header = parts[0]
    remainder = F.when(F.size(parts) >= 2, parts[1])  # null when no space

    # P3: comma split of the header.
    topics = F.split(header, ",")

    # P2: malformed when no space at all OR header has <2 comma-tokens.
    malformed = remainder.isNull() | (F.size(topics) < 2)

    sev_token = topics[1]
    known_sev = _severity_expr(sev_token)

    # P4: [topics[0]] + topics[2:]  (element 1 is the severity keyword).
    base_cats = F.concat(
        F.slice(topics, 1, 1),
        F.slice(topics, 3, F.greatest(F.size(topics) - F.lit(2), F.lit(0))),
    )
    # P5 unknown-token side effect: append the token to Categories.
    cats = F.when(known_sev.isNotNull(), base_cats).otherwise(
        F.concat(base_cats, F.array(sev_token))
    )

    severity = F.coalesce(known_sev, F.lit(DEFAULT_SEVERITY)).cast("tinyint")

    return {
        "Timestamp": ts.alias("Timestamp"),
        "Device": device.alias("Device"),
        "Severity": F.when(malformed, F.lit(DEFAULT_SEVERITY))
        .otherwise(severity)
        .cast("tinyint")
        .alias("Severity"),
        "Categories": F.when(malformed, F.array(F.lit("unknown")))
        .otherwise(cats)
        .alias("Categories"),
        "Message": F.when(malformed, raw).otherwise(remainder).alias("Message"),
    }


def parsed_logs(
    df: DataFrame,
    raw_col: str = "raw",
    device_col: str = "device",
    clock_col: str | None = None,
) -> DataFrame:
    """Project a DataFrame of raw lines into the logs table schema."""
    cols = parse_syslog_columns(
        F.col(raw_col),
        F.col(device_col),
        F.col(clock_col) if clock_col else None,
    )
    return df.select(*cols.values())


def with_severity_name(df: DataFrame, col: str = "Severity") -> DataFrame:
    """Attach the RFC 5424 level name (`lib/lopParse.go:10-19`) as a column.

    Done as a CASE expression, not a join — 8 constants never justify a
    shuffle or even a broadcast.
    """
    from ..schema import SEVERITY_NAMES

    name = None
    for level, label in SEVERITY_NAMES.items():
        name = (
            F.when(F.col(col) == level, F.lit(label))
            if name is None
            else name.when(F.col(col) == level, F.lit(label))
        )
    return df.withColumn("SeverityName", name.otherwise(F.lit("Unknown")))
