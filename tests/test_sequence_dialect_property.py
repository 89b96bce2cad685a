"""Differential property test for the round-11 sequence-family dialect
compilers: random supported patterns over random event streams, the
GENERATED Spark SQL (sequenceMatch / sequenceCount / windowFunnel) vs a
straightforward Python simulator implementing the documented contracts
independently (filtered stream sorted by (t, match-vector); adjacency =
consecutive in that stream; strict-second increase inside chains;
greedy-leftmost restart-after-completion counting; funnel = max depth
over starts with the window anchored at the chain's first event).

Each draw builds ONE DataFrame with many groups and runs ONE query per
aggregate — ~hundreds of semantic cases per test at a few Spark jobs'
cost.  A fresh seed each run; failures print it (replay with
SPARK_GRAFT_FUZZ_SEED)."""

from __future__ import annotations

import os
import random

from syslog_handler_with_clickhouse_spark.functions.ch_dialect import (
    translate_ch_sql,
)

N_CONDS = 2  # conditions = membership of event char in a subset


def _streams(rng, n_groups=40):
    rows = []
    for g in range(n_groups):
        n = rng.randint(0, 12)
        t = 0
        for _ in range(n):
            t += rng.randint(0, 3)  # allow same-second collisions
            rows.append((g, rng.choice("abcx"), t))
    return rows


def _sorted_stream(events, conds):
    """The documented event stream: rows matching >= 1 condition,
    sorted by (t, m1, m2, ...) — False < True."""
    ev = [
        (t, tuple(e in c for c in conds))
        for (e, t) in events
        if any(e in c for c in conds)
    ]
    ev.sort(key=lambda r: (r[0], r[1]))
    return ev


def _sim_match(events, conds, steps, seps):
    ev = _sorted_stream(events, conds)
    kinds = {k for k, _ in seps}
    if "any" in kinds:  # eventually-chain: greedy fold, strict seconds
        step, lt = 0, None
        for t, m in ev:
            if step < len(steps) and m[steps[step] - 1] and (
                lt is None or t > lt
            ):
                step, lt = step + 1, t
        return step >= len(steps)
    k = len(steps)  # adjacency window scan
    for i in range(len(ev) - k + 1):
        ok = ev[i][1][steps[0] - 1]
        for j in range(1, k):
            if not ok:
                break
            t_prev, t_cur = ev[i + j - 1][0], ev[i + j][0]
            ok = ev[i + j][1][steps[j] - 1]
            bound = seps[j - 1][1]
            if ok and bound is not None:
                op, n = bound
                d = t_cur - t_prev
                ok = {
                    "<=": d <= n, "<": d < n, ">=": d >= n, ">": d > n,
                    "=": d == n,
                }[op]
        if ok:
            return True
    return False


def _sim_count(events, conds, steps, seps):
    ev = _sorted_stream(events, conds)
    kinds = {k for k, _ in seps}
    if len(steps) == 1:
        return sum(1 for _, m in ev if m[steps[0] - 1])
    if kinds == {"adj"}:
        # naive documented contract, written independently of the SQL's
        # bitset-NFA: find the leftmost window of k consecutive filtered
        # events matching the steps (+ per-gap bounds), count it, resume
        # the scan AFTER the matched chain.
        k = len(steps)

        def window_ok(s):
            ok = ev[s][1][steps[0] - 1]
            for j in range(1, k):
                if not ok:
                    return False
                ok = ev[s + j][1][steps[j] - 1]
                bound = seps[j - 1][1]
                if ok and bound is not None:
                    op, n = bound
                    d = ev[s + j][0] - ev[s + j - 1][0]
                    ok = {
                        "<=": d <= n, "<": d < n, ">=": d >= n,
                        ">": d > n, "=": d == n,
                    }[op]
            return ok

        cnt, pos = 0, 0
        while pos <= len(ev) - k:
            hit = next(
                (s for s in range(pos, len(ev) - k + 1) if window_ok(s)),
                None,
            )
            if hit is None:
                break
            cnt, pos = cnt + 1, hit + k
        return cnt
    step, lt, cnt = 0, None, 0  # .*-chain greedy restart
    for t, m in ev:
        if m[steps[step] - 1] and (lt is None or t > lt):
            step += 1
            lt = t
            if step == len(steps):
                step, lt, cnt = 0, None, cnt + 1
    return cnt


def _sim_funnel(events, conds, steps, window):
    ev = _sorted_stream(events, conds)
    best = 0
    for i, (t0, m0) in enumerate(ev):
        if not m0[steps[0] - 1]:
            continue
        depth, lt = 1, t0
        for t, m in ev[i + 1:]:
            if depth < len(steps) and m[steps[depth] - 1] and t > lt \
                    and t <= t0 + window:
                depth, lt = depth + 1, t
        best = max(best, depth)
    return best


def _rand_pattern(rng):
    """A random SUPPORTED sequenceMatch/Count pattern."""
    r = rng.random()
    if r < 0.2:
        return [rng.randint(1, N_CONDS)], []
    if r < 0.65:  # adjacency chain (2-5 steps), per-gap maybe bounded —
        # k >= 3 exercises the round-12 bitset-NFA sequenceCount path,
        # where self-overlapping prefixes make the naive fold wrong
        k = rng.randint(2, 5)
        steps = [rng.randint(1, N_CONDS) for _ in range(k)]
        seps = []
        for _ in range(k - 1):
            if rng.random() < 0.4:
                op = rng.choice(["<=", "<", ">=", ">"])
                seps.append(("adj", (op, rng.randint(1, 6))))
            else:
                seps.append(("adj", None))
        return steps, seps
    k = rng.randint(2, 4)  # .*-chain
    steps = [rng.randint(1, N_CONDS) for _ in range(k)]
    return steps, [("any", None)] * (k - 1)


def _pat_text(steps, seps):
    out = f"(?{steps[0]})"
    for (kind, bound), s in zip(seps, steps[1:]):
        if kind == "any":
            out += ".*"
        elif bound is not None:
            out += f"(?t{bound[0]}{bound[1]})"
        out += f"(?{s})"
    return out


def test_sequence_dialect_matches_simulator(spark):
    seed_env = os.environ.get("SPARK_GRAFT_FUZZ_SEED")
    seed = int(seed_env) if seed_env else int.from_bytes(os.urandom(6), "big")
    rng = random.Random(seed)
    conds = ["ab", "bc"]  # overlapping on 'b' — the hard tiebreak case
    cond_sql = ["e IN ('a', 'b')", "e IN ('b', 'c')"]

    for trial in range(6):
        rows = _streams(rng)
        by_group: dict = {}
        for g, e, t in rows:
            by_group.setdefault(g, []).append((e, t))
        df = spark.createDataFrame(rows, "g int, e string, tsec long")
        df.createOrReplaceTempView("seqprop_t")

        steps, seps = _rand_pattern(rng)
        pat = _pat_text(steps, seps)
        window = rng.randint(1, 8)
        w_steps = [rng.randint(1, N_CONDS) for _ in range(rng.randint(1, 3))]

        sql = translate_ch_sql(
            f"SELECT g, "
            f"sequenceMatch('{pat}')(tsec, {cond_sql[0]}, {cond_sql[1]}) "
            f"AS sm, "
            f"sequenceCount('{pat}')(tsec, {cond_sql[0]}, {cond_sql[1]}) "
            f"AS sc, "
            f"windowFunnel({window})(tsec, "
            f"{', '.join(cond_sql[s - 1] for s in w_steps)}) AS wf "
            f"FROM seqprop_t GROUP BY g"
        )
        got = {r.g: (r.sm, r.sc, r.wf) for r in spark.sql(sql).collect()}
        for g, events in by_group.items():
            exp = (
                _sim_match(events, conds, steps, seps),
                _sim_count(events, conds, steps, seps),
                _sim_funnel(
                    events, [conds[s - 1] for s in w_steps],
                    list(range(1, len(w_steps) + 1)), window,
                ),
            )
            assert got.get(g, (False, 0, 0)) == exp, (
                f"seed={seed} trial={trial} group={g} pattern={pat!r} "
                f"window={window} wsteps={w_steps} events={events} "
                f"got={got.get(g)} want={exp}"
            )
