"""Independent-reference checks for the q196-q199 statistical family.

The DuckDB oracle shares the queries' formulas, so a mirror pass alone
can't catch a formula transcribed wrong on both sides.  These tests run
the REAL registered queries over a synthetic events fixture and compare
against independently derived definitions: closed-form least squares for
q196, the O(n²) pairwise definition of Mann-Whitney U for q198 (not the
rank-sum formula the query uses), and a naive ECDF scan for q199.
"""

from __future__ import annotations

import math
import random

import pytest

SEED = 20260813


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    """A tiny synthetic events.parquet with the fixture schema, exact-cent
    values, deliberate ties, two event types."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(SEED)
    n = 400
    rows = {
        "event_id": list(range(n)),
        "ts": [1704067200000000 + i * 60_000_000 for i in range(n)],
        "user_id": [rng.randrange(50) for _ in range(n)],
        "event_type": [rng.choice(["error", "purchase"]) for _ in range(n)],
        # exact cents, narrow range → plenty of ties for midrank handling
        "value": [rng.randrange(0, 2000) / 100 for _ in range(n)],
        "props": ["{}" for _ in range(n)],
    }
    tbl = pa.table(
        {
            "event_id": pa.array(rows["event_id"], pa.int64()),
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
            "user_id": pa.array(rows["user_id"], pa.int64()),
            "event_type": pa.array(rows["event_type"], pa.string()),
            "value": pa.array(rows["value"], pa.float64()),
            "props": pa.array(rows["props"], pa.string()),
        }
    )
    d = tmp_path_factory.mktemp("synth_events")
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d), rows


def _cohorts(rows, et):
    a = [
        round(v * 100)
        for v, t, u in zip(rows["value"], rows["event_type"], rows["user_id"])
        if t == et and u % 2 == 0
    ]
    b = [
        round(v * 100)
        for v, t, u in zip(rows["value"], rows["event_type"], rows["user_id"])
        if t == et and u % 2 == 1
    ]
    return a, b


def test_q196_matches_closed_form(spark, synth_dir):
    from syslog_handler_with_clickhouse_spark.queries import QUERIES

    d, rows = synth_dir
    got = {r.event_type: r for r in QUERIES["q196_simple_linear_regression"](spark, d).collect()}
    for et in ("error", "purchase"):
        pts = [
            (u, round(v * 100))
            for v, t, u in zip(rows["value"], rows["event_type"], rows["user_id"])
            if t == et
        ]
        n = len(pts)
        mx = sum(p[0] for p in pts) / n
        my = sum(p[1] for p in pts) / n
        sxy = sum((x - mx) * (y - my) for x, y in pts)
        sxx = sum((x - mx) ** 2 for x, y in pts)
        syy = sum((y - my) ** 2 for x, y in pts)
        slope = sxy / sxx / 100.0
        intercept = my / 100.0 - slope * mx
        r2 = sxy * sxy / (sxx * syy)
        g = got[et]
        assert math.isclose(g.slope, slope, rel_tol=1e-9), et
        assert math.isclose(g.intercept, intercept, rel_tol=1e-9), et
        assert math.isclose(g.r2, r2, rel_tol=1e-9), et


def test_q198_matches_pairwise_definition(spark, synth_dir):
    """U_a == Σ_{i∈A,j∈B} [a_i > b_j] + ½[a_i == b_j] — the pairwise
    DEFINITION, independent of the rank-sum formula the query uses."""
    from syslog_handler_with_clickhouse_spark.queries import QUERIES

    d, rows = synth_dir
    got = {r.event_type: r for r in QUERIES["q198_mann_whitney"](spark, d).collect()}
    for et in ("error", "purchase"):
        a, b = _cohorts(rows, et)
        u_a = sum(
            1.0 if x > y else (0.5 if x == y else 0.0) for x in a for y in b
        )
        g = got[et]
        assert g.n_a == len(a) and g.n_b == len(b), et
        assert math.isclose(g.u_a, u_a, rel_tol=0, abs_tol=1e-9), (et, g.u_a, u_a)
        assert math.isclose(g.u_b, len(a) * len(b) - u_a, abs_tol=1e-9), et


def test_q199_matches_naive_ecdf(spark, synth_dir):
    from syslog_handler_with_clickhouse_spark.queries import QUERIES

    d, rows = synth_dir
    got = {r.event_type: r for r in QUERIES["q199_ks_test"](spark, d).collect()}
    for et in ("error", "purchase"):
        a, b = _cohorts(rows, et)
        xs = sorted(set(a) | set(b))
        d_ref = max(
            abs(
                sum(1 for v in a if v <= x) / len(a)
                - sum(1 for v in b if v <= x) / len(b)
            )
            for x in xs
        )
        g = got[et]
        assert math.isclose(g.d_stat, d_ref, rel_tol=1e-9), (et, g.d_stat, d_ref)


def test_q197_matches_direct_formula(spark, synth_dir):
    from syslog_handler_with_clickhouse_spark.queries import QUERIES

    d, rows = synth_dir
    got = {r.event_type: r for r in QUERIES["q197_student_ttest"](spark, d).collect()}
    for et in ("error", "purchase"):
        a, b = _cohorts(rows, et)
        ma, mb = sum(a) / len(a), sum(b) / len(b)
        va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
        vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
        sp2 = ((len(a) - 1) * va + (len(b) - 1) * vb) / (len(a) + len(b) - 2)
        t = (ma - mb) / math.sqrt(sp2 * (1 / len(a) + 1 / len(b)))
        assert math.isclose(got[et].t_stat, t, rel_tol=1e-9), et


def test_q200_lttb_matches_naive_reference(spark, synth_dir):
    """Re-derive the q200 variant (neighbor-bucket-average anchors,
    bucket size 50, first/last kept) in plain Python over the synthetic
    fixture and require the exact same point selection."""
    from syslog_handler_with_clickhouse_spark.queries import QUERIES

    d, rows = synth_dir
    got = {
        (r.event_type, r.ts_s): r.val
        for r in QUERIES["q200_lttb_downsample"](spark, d).collect()
    }

    import datetime

    by_series = {}
    for eid, ts, et, v in zip(
        rows["event_id"], rows["ts"], rows["event_type"], rows["value"]
    ):
        by_series.setdefault(et, []).append((ts, eid, round(v * 100)))
    expected = set()
    for et, pts in by_series.items():
        xmin = min(p[0] for p in pts)
        pts = sorted((ts - xmin, eid, yc, ts) for ts, eid, yc in pts)
        buckets = {}
        for i, p in enumerate(pts):
            buckets.setdefault(i // 50, []).append((i + 1, p))
        bmax = max(buckets)
        for bi, members in buckets.items():
            if bi == 0 or bi == bmax:
                continue
            prev, nxt = buckets[bi - 1], buckets[bi + 1]
            np_, nn = len(prev), len(nxt)
            sxp = sum(m[1][0] for m in prev)
            syp = sum(m[1][2] for m in prev)
            sxn = sum(m[1][0] for m in nxt)
            syn = sum(m[1][2] for m in nxt)
            best = max(
                members,
                key=lambda m: (
                    abs(
                        (sxp * nn - sxn * np_) * (m[1][2] * np_ - syp)
                        - (sxp - m[1][0] * np_) * (syn * np_ - syp * nn)
                    ),
                    -m[0],
                ),
            )
            expected.add((et, best[1][3], best[1][2]))
        expected.add((et, pts[0][3], pts[0][2]))
        expected.add((et, pts[-1][3], pts[-1][2]))

    def fmt(us):
        return datetime.datetime.utcfromtimestamp(us / 1e6).strftime(
            "%Y-%m-%d %H:%M:%S"
        )

    expected_rows = {(et, fmt(ts)): yc / 100.0 for et, ts, yc in expected}
    assert got == expected_rows


def test_q211_strict_lttb_matches_naive_reference(spark, synth_dir):
    """Re-derive strict-sequential LTTB (previously-selected-point anchor,
    bucket width 50, next-bucket-average right anchor, last-point anchor
    for the final bucket) in plain Python and require the exact same
    point selection from the registered q211."""
    import datetime

    from syslog_handler_with_clickhouse_spark.queries import QUERIES

    d, rows = synth_dir
    got = {
        (r.event_type, r.ts_s): r.val
        for r in QUERIES["q211_lttb_strict"](spark, d).collect()
    }

    by_series = {}
    for eid, ts, et, v in zip(
        rows["event_id"], rows["ts"], rows["event_type"], rows["value"]
    ):
        by_series.setdefault(et, []).append((ts, eid, round(v * 100)))
    expected = set()
    for et, pts in by_series.items():
        xmin = min(p[0] for p in pts)
        pts = sorted((ts - xmin, eid, yc, ts) for ts, eid, yc in pts)
        n = len(pts)
        chosen = [pts[0]]
        if n > 2:
            interior = pts[1 : n - 1]
            n_buckets = (len(interior) + 49) // 50
            anchor = pts[0]
            for b in range(n_buckets):
                members = interior[50 * b : 50 * (b + 1)]
                nxt = interior[50 * (b + 1) : 50 * (b + 2)]
                if b < n_buckets - 1 and nxt:
                    nn = len(nxt)
                    sxn = sum(p[0] for p in nxt)
                    syn = sum(p[2] for p in nxt)
                else:
                    nn, sxn, syn = 1, pts[-1][0], pts[-1][2]
                ax, ay = anchor[0], anchor[2]
                best, best_a = None, -1
                for p in members:  # in order → first max = smallest rn
                    a2 = abs(
                        (ax * nn - sxn) * (p[2] - ay)
                        - (ax - p[0]) * (syn - ay * nn)
                    )
                    if a2 > best_a:
                        best_a, best = a2, p
                chosen.append(best)
                anchor = best
        if n > 1:
            chosen.append(pts[-1])
        for p in chosen:
            expected.add((et, p[3], p[2]))

    def fmt(us):
        return datetime.datetime.utcfromtimestamp(us / 1e6).strftime(
            "%Y-%m-%d %H:%M:%S"
        )

    expected_rows = {(et, fmt(ts)): yc / 100.0 for et, ts, yc in expected}
    assert got == expected_rows


def test_q200_q211_variants_share_endpoints(spark, synth_dir):
    """The two LTTB variants must agree on the fixed first/last points
    (their bucket interiors legitimately differ — that is the variant
    trade-off the docstrings document)."""
    from syslog_handler_with_clickhouse_spark.queries import QUERIES

    d, _ = synth_dir
    a = QUERIES["q200_lttb_downsample"](spark, d).collect()
    b = QUERIES["q211_lttb_strict"](spark, d).collect()
    per_a, per_b = {}, {}
    for r in a:
        per_a.setdefault(r.event_type, set()).add((r.ts_s, r.val))
    for r in b:
        per_b.setdefault(r.event_type, set()).add((r.ts_s, r.val))
    assert per_a.keys() == per_b.keys()
    for et in per_a:
        first_a, last_a = min(per_a[et]), max(per_a[et])
        first_b, last_b = min(per_b[et]), max(per_b[et])
        assert first_a == first_b and last_a == last_b, et


def test_degenerate_groups_null_on_both_engines(spark, tmp_path):
    """Advisor round-4 item: constant-x, zero-variance, and single-parity
    cohorts must yield NULL (not inf/nan, not an engine-dependent value)
    identically on Spark and the DuckDB oracle for q196-q199."""
    import math

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from syslog_handler_with_clickhouse_spark.queries import ORACLE, QUERIES

    # const_x: every user_id identical -> q196 slope/intercept/r2 NULL
    # flat: every value identical      -> q197 t_stat NULL (sp2 = 0),
    #                                     q198 z NULL (all ties -> sigma 0)
    # one_parity: only even user_ids   -> q197/q198/q199 cohort-1 empty
    rows = []
    for i in range(40):
        rows.append((i, 1704067200000000 + i * 1_000_000, 7, "const_x", 1.0 + i))
    for i in range(40):
        rows.append((100 + i, 1704067200000000 + i * 1_000_000, i, "flat", 5.0))
    for i in range(40):
        rows.append((200 + i, 1704067200000000 + i * 1_000_000, 2 * i, "one_parity", 1.0 + (i % 7)))
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([float(r[4]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = tmp_path / "degenerate"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )

    def norm(v):
        if v is None:
            return None
        if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
            return ("NONFINITE", v)  # would fail the comparison loudly
        return round(v, 9) if isinstance(v, float) else v

    checks = {
        "q196_simple_linear_regression": ["slope", "intercept", "r2"],
        "q197_student_ttest": ["t_stat"],
        "q198_mann_whitney": ["z"],
        "q199_ks_test": ["d_stat", "ks_z"],
    }
    for qname, cols in checks.items():
        got = {
            r.event_type: {c: norm(r[c]) for c in cols}
            for r in QUERIES[qname](spark, str(d)).collect()
        }
        oracle_rows = con.execute(ORACLE[qname]).fetchall()
        names = [desc[0] for desc in con.description]
        want = {
            row[names.index("event_type")]: {
                c: norm(row[names.index(c)]) for c in cols
            }
            for row in oracle_rows
        }
        assert got == want, (qname, got, want)
        # the degenerate groups specifically must be NULL, not a number
        if qname == "q196_simple_linear_regression":
            assert got["const_x"]["slope"] is None
        if qname == "q197_student_ttest":
            assert got["flat"]["t_stat"] is None
            assert got["one_parity"]["t_stat"] is None
        if qname == "q198_mann_whitney":
            assert got["flat"]["z"] is None
        if qname == "q199_ks_test":
            assert got["one_parity"]["d_stat"] is None


def test_q212_kurtosis_matches_naive(spark, synth_dir):
    """Naive 4th-central-moment kurtosis over the synthetic fixture."""
    from syslog_handler_with_clickhouse_spark.queries import QUERIES

    d, rows = synth_dir
    got = {
        r.event_type: r.kurt_cents
        for r in QUERIES["q212_kurtosis"](spark, d).collect()
    }
    by = {}
    for et, v in zip(rows["event_type"], rows["value"]):
        by.setdefault(et, []).append(round(v * 100))
    for et, xs in by.items():
        n = len(xs)
        m = sum(xs) / n
        m4 = sum((x - m) ** 4 for x in xs) / n
        var = sum((x - m) ** 2 for x in xs) / n
        want = m4 / (var * var)
        assert abs(got[et] - want) < 1e-5, (et, got[et], want)


def test_q213_entropy_matches_naive(spark, synth_dir):
    import collections
    import math

    from syslog_handler_with_clickhouse_spark.queries import QUERIES

    d, rows = synth_dir
    got = {
        r.event_type: r.entropy_bits
        for r in QUERIES["q213_entropy"](spark, d).collect()
    }
    by = collections.defaultdict(collections.Counter)
    for et, u in zip(rows["event_type"], rows["user_id"]):
        by[et][u % 64] += 1
    for et, counter in by.items():
        n = sum(counter.values())
        want = -sum((c / n) * math.log2(c / n) for c in counter.values())
        assert abs(got[et] - want) < 1e-5, (et, got[et], want)


def test_q214_q215_delta_and_bounding_match_naive(spark, synth_dir):
    from syslog_handler_with_clickhouse_spark.queries import QUERIES

    d, rows = synth_dir
    series = {}
    for eid, ts, et, v in zip(
        rows["event_id"], rows["ts"], rows["event_type"], rows["value"]
    ):
        series.setdefault(et, []).append((ts, eid, round(v * 100)))
    for pts in series.values():
        pts.sort()

    got_ds = {
        r.event_type: (r.delta_sum, r.n_rises)
        for r in QUERIES["q214_delta_sum"](spark, d).collect()
    }
    got_br = {
        r.event_type: r.slope_per_sec
        for r in QUERIES["q215_bounding_ratio"](spark, d).collect()
    }
    for et, pts in series.items():
        ds = sum(
            max(0, b[2] - a[2]) for a, b in zip(pts, pts[1:])
        )
        rises = sum(1 for a, b in zip(pts, pts[1:]) if b[2] > a[2])
        assert got_ds[et] == (ds / 100.0, rises), et
        slope = ((pts[-1][2] - pts[0][2]) / 100.0) / (
            (pts[-1][0] - pts[0][0]) / 1e6
        )
        assert abs(got_br[et] - slope) < 1e-9, et


def test_q216_q217_association_match_naive(spark, synth_dir):
    import collections
    import math

    from syslog_handler_with_clickhouse_spark.queries import QUERIES

    d, rows = synth_dir
    cells = collections.Counter(
        (et, u % 8) for et, u in zip(rows["event_type"], rows["user_id"])
    )
    n = sum(cells.values())
    rx = collections.Counter()
    cy = collections.Counter()
    for (x, y), c in cells.items():
        rx[x] += c
        cy[y] += c
    chi2 = sum(
        (c - rx[x] * cy[y] / n) ** 2 / (rx[x] * cy[y] / n)
        for (x, y), c in cells.items()
    )
    v = math.sqrt(chi2 / (n * (min(len(rx), len(cy)) - 1)))
    got = QUERIES["q216_cramers_v"](spark, d).collect()[0]
    assert abs(got.chi2 - chi2) < 1e-4 and abs(got.cramers_v - v) < 1e-5

    sx = sum(c * math.log2(c) for c in rx.values())
    sy = sum(c * math.log2(c) for c in cy.values())
    sxy = sum(c * math.log2(c) for c in cells.values())
    u_want = (sx + sy - sxy - n * math.log2(n)) / (sx - n * math.log2(n))
    got_u = QUERIES["q217_theils_u"](spark, d).collect()[0]
    assert got_u.n == n and abs(got_u.theils_u - u_want) < 1e-5


def test_q221_decomposition_matches_naive(spark, synth_dir):
    """Naive hourly trend/seasonal decomposition over the synth fixture."""
    import collections

    from syslog_handler_with_clickhouse_spark.queries import QUERIES

    d, rows = synth_dir
    got = {
        (r.event_type, r.hour_s): (r.y_val, r.trend, r.seasonal)
        for r in QUERIES["q221_series_decompose"](spark, d).collect()
    }

    buckets = collections.defaultdict(int)
    for ts, et, v in zip(rows["ts"], rows["event_type"], rows["value"]):
        hour_us = ts - ts % 3_600_000_000
        buckets[(et, hour_us)] += round(v * 100)
    series = collections.defaultdict(list)
    for (et, h), y in sorted(buckets.items()):
        series[et].append((h, y))

    import datetime

    def fmt(us):
        return datetime.datetime.utcfromtimestamp(us / 1e6).strftime(
            "%Y-%m-%d %H:%M:%S"
        )

    expected = {}
    for et, pts in series.items():
        n = len(pts)
        detr = {}  # hod -> list of exact 5y - s5
        full = []
        for i in range(n):
            if i - 2 < 0 or i + 2 >= n:
                continue
            s5 = sum(y for _, y in pts[i - 2 : i + 3])
            h, y = pts[i]
            hod = datetime.datetime.utcfromtimestamp(h / 1e6).hour
            detr.setdefault(hod, []).append(5 * y - s5)
            full.append((h, y, s5, hod))
        for h, y, s5, hod in full:
            sn = sum(detr[hod])
            expected[(et, fmt(h))] = (
                y / 100.0,
                round(s5 / 5 / 100.0, 6),
                round(sn / (5 * len(detr[hod])) / 100.0, 6),
            )
    assert set(got) == set(expected)
    for k in got:
        for a, b in zip(got[k], expected[k]):
            assert abs(a - b) < 1e-9, (k, got[k], expected[k])


def test_q222_tukey_matches_naive(spark, synth_dir):
    """Naive quartile/fence/outlier count over the synth fixture."""
    import collections

    from syslog_handler_with_clickhouse_spark.queries import QUERIES

    d, rows = synth_dir
    got = {
        r.event_type: (r.n, r.fence_lo, r.fence_hi, r.n_outliers)
        for r in QUERIES["q222_tukey_outliers"](spark, d).collect()
    }
    by = collections.defaultdict(list)
    for et, v in zip(rows["event_type"], rows["value"]):
        by[et].append(round(v * 100))

    def quantile_cont(xs, q):
        xs = sorted(xs)
        pos = q * (len(xs) - 1)
        lo, frac = int(pos), pos - int(pos)
        return xs[lo] if frac == 0 else xs[lo] * (1 - frac) + xs[lo + 1] * frac

    for et, xs in by.items():
        q1, q3 = quantile_cont(xs, 0.25), quantile_cont(xs, 0.75)
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        n_out = sum(1 for x in xs if x < lo or x > hi)
        n, flo, fhi, nout = got[et]
        assert n == len(xs) and nout == n_out, et
        assert abs(flo - round(lo / 100.0, 6)) < 1e-9, et
        assert abs(fhi - round(hi / 100.0, 6)) < 1e-9, et
