"""IPv6 function family — ClickHouse ``IPv6NumToString`` /
``IPv6StringToNum`` / ``isIPv6String`` / ``cutIPv6`` analogues as PURE
NATIVE column expressions (no UDFs: ``conv``/``split``/``transform``/
``filter`` + a generated longest-zero-run CASE chain stay inside
whole-stage codegen).

Representation: an IPv6 address is an ``array<int>`` of 8 hextets
(0..65535), the natural columnar form — 16-byte binary round-trips via
two longs if needed.  Formatting follows RFC 5952: lowercase hex, no
leading zeros, the LONGEST run of >=2 zero hextets compressed to
``::`` (leftmost on ties), no compression of a single zero.  Because
the address has a FIXED 8 slots, the longest-run search unrolls into a
28-candidate ``CASE`` chain ordered (length desc, start asc) — first
match wins, which is exactly the RFC tie-break — rather than any
iterative loop.

Parsing accepts full and ``::``-compressed hex forms plus the dotted
IPv4 tail (``::ffff:192.168.1.1``), case-insensitive, leading zeros
allowed.  ``is_ipv6_string`` is a structural validator built from the
same split machinery (group counts, per-group hex syntax, octet
bounds) — no regex backtracking monsters.

Reference: ClickHouse IPv6 function semantics (the reference repo's
Device field carries ip:port peers, `lib/lopParse.go:36` — the v6 form
of that surface); RFC 5952 §4 for the canonical text rules.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _hx(c: Column) -> Column:
    """int hextet -> lowercase hex, no leading zeros."""
    return F.lower(F.conv(c.cast("string"), 10, 16))


def _join_hex(cols: list[Column]) -> Column:
    if not cols:
        return F.lit("")
    return F.concat_ws(":", *cols)


def format_ipv6(hextets: Column) -> Column:
    """``IPv6NumToString`` analogue: RFC 5952 canonical text from an
    ``array<int>`` of 8 hextets.  Unrolled longest-run CASE chain —
    candidates ordered (run length desc, start asc) so the first
    matching WHEN is the RFC-correct compression; runs of length 1 are
    never compressed (the final ``otherwise``)."""
    hx = [_hx(F.element_at(hextets, i + 1)) for i in range(8)]
    z = [F.element_at(hextets, i + 1) == 0 for i in range(8)]
    expr = None
    for length in range(8, 1, -1):
        for start in range(0, 9 - length):
            cond = z[start]
            for k in range(start + 1, start + length):
                cond = cond & z[k]
            # runs are MAXIMAL: the slot before/after must be nonzero
            if start > 0:
                cond = cond & ~z[start - 1]
            if start + length < 8:
                cond = cond & ~z[start + length]
            val = F.concat(
                _join_hex(hx[:start]),
                F.lit("::"),
                _join_hex(hx[start + length :]),
            )
            expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    return expr.otherwise(_join_hex(hx))


def mask_ipv6(hextets: Column, keep_hextets: int) -> Column:
    """``cutIPv6`` analogue at hextet granularity: zero every hextet
    past the first ``keep_hextets`` (i.e. keep a /16*keep prefix)."""
    return F.transform(
        hextets, lambda v, i: F.when(i < keep_hextets, v).otherwise(F.lit(0))
    )


def _strip_v4_tail(s: Column) -> Column:
    """Remove a trailing dotted-quad, leaving the hex part (which may
    then end in ':' or '::')."""
    return F.regexp_replace(s, r"[0-9]{1,3}(\.[0-9]{1,3}){3}$", "")


def _v4_tail_hextets(s: Column) -> list[Column]:
    """The two hextets encoded by a trailing dotted-quad."""
    quad = F.regexp_extract(s, r"([0-9]{1,3}(\.[0-9]{1,3}){3})$", 1)
    o = F.transform(F.split(quad, r"\."), lambda x: x.cast("int"))
    return [
        F.element_at(o, 1) * 256 + F.element_at(o, 2),
        F.element_at(o, 3) * 256 + F.element_at(o, 4),
    ]


def parse_ipv6(s: Column) -> Column:
    """``IPv6StringToNum`` analogue: text -> ``array<int>`` of 8
    hextets.  Handles ``::`` compression (including leading/trailing
    and the all-zero ``::``), leading zeros, uppercase, and the dotted
    IPv4 tail.  Invalid inputs produce nulls/garbage — pair with
    :func:`is_ipv6_string` to gate."""
    s = F.lower(F.trim(s))
    has4 = s.contains(".")
    s6 = F.when(has4, _strip_v4_tail(s)).otherwise(s)
    target = F.when(has4, F.lit(6)).otherwise(F.lit(8))

    parts = F.split(s6, "::")
    compressed = F.size(parts) == 2
    nonempty = lambda arr: F.filter(arr, lambda x: x != "")  # noqa: E731
    left = nonempty(F.split(F.element_at(parts, 1), ":"))
    right = F.when(
        compressed, nonempty(F.split(F.element_at(parts, 2), ":"))
    ).otherwise(F.array().cast("array<string>"))
    mid = F.array_repeat(
        F.lit("0"), (target - F.size(left) - F.size(right)).cast("int")
    )
    groups = F.when(
        compressed, F.concat(left, mid, right)
    ).otherwise(nonempty(F.split(s6, ":")))
    hex6 = F.transform(groups, lambda g: F.conv(g, 16, 10).cast("int"))
    v4 = _v4_tail_hextets(s)
    return F.when(has4, F.concat(hex6, F.array(*v4))).otherwise(hex6)


def is_ipv6_string(s: Column) -> Column:
    """``isIPv6String`` analogue: structural validation via the same
    split machinery — character set, at most one ``::``, per-group
    1-4 hex digits, exact group count (8, or 6 + valid dotted quad).
    ``::`` stands for >= 1 zero group, so single-zero compression
    (``1:2:3:4:5:6:7::``) is ACCEPTED, matching CH/inet_pton; RFC
    5952's don't-compress-one-group rule binds only format_ipv6's
    output."""
    t = F.lower(F.trim(s))
    charset_ok = t.rlike(r"^[0-9a-f:.]+$")
    has4 = t.contains(".")
    v4_ok = F.when(
        has4,
        t.rlike(r"(^|:)((25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})\.){3}"
                r"(25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})$"),
    ).otherwise(F.lit(True))
    s6 = F.when(has4, _strip_v4_tail(t)).otherwise(t)
    target = F.when(has4, F.lit(6)).otherwise(F.lit(8))
    parts = F.split(s6, "::")
    n_parts = F.size(parts)
    compressed = n_parts == 2
    nonempty = lambda arr: F.filter(arr, lambda x: x != "")  # noqa: E731
    left = nonempty(F.split(F.element_at(parts, 1), ":"))
    right = F.when(
        compressed, nonempty(F.split(F.element_at(parts, 2), ":"))
    ).otherwise(F.array().cast("array<string>"))
    groups_plain = F.when(has4, nonempty(F.split(s6, ":"))).otherwise(
        F.split(s6, ":")
    )
    hexg = lambda arr: F.forall(arr, lambda g: g.rlike(r"^[0-9a-f]{1,4}$"))  # noqa: E731
    plain_ok = (
        (~compressed)
        & (F.size(groups_plain) == target)
        & hexg(groups_plain)
    )
    comp_ok = (
        compressed
        # '::' stands for AT LEAST ONE zero group (RFC 4291 / inet_pton),
        # so left+right may reach target-1: '1:2:3:4:5:6:7::' is valid.
        # RFC 5952's never-compress-a-single-group rule is a FORMATTING
        # constraint (format_ipv6 honors it); the validator accepts it.
        & (F.size(left) + F.size(right) <= target - 1)
        & hexg(left)
        & hexg(right)
        # no stray lone ':' at the ends beyond the '::' itself
        & ~F.element_at(parts, 1).endswith(":")
        & ~F.element_at(parts, 2).startswith(":")
    )
    # a single leading/trailing ':' is only legal as part of '::'
    edges_ok = (
        (~t.endswith(":") | t.endswith("::"))
        & (~t.startswith(":") | t.startswith("::"))
    )
    return charset_ok & v4_ok & edges_ok & (n_parts <= 2) & (
        plain_ok | comp_ok
    )
