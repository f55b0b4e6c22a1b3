"""Definition-level checks for the statistical-inference operators
(queries/inference.py): each statistic is recomputed with an
independent textbook implementation (pure Python over DuckDB-extracted
inputs) and compared to the engine's output — the same pattern as
tests/test_definitions.py. The driver's oracle run checks Spark==SQL;
these check that the shared formula IS the statistic it claims to be.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from eecs_485___mapreduce_spark.queries.inference import (
    SPRT_A_MICRO,
    SPRT_B_MICRO,
    SPRT_L0_MICRO,
    SPRT_L1_MICRO,
)
from eecs_485___mapreduce_spark.registry import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "events", "lineitem", "orders", "customer"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _oracle(con, name, order):
    return con.execute(REGISTRY[name].oracle + f" ORDER BY {order}").fetchall()


def test_isotonic_fit_is_pava(con):
    rows = _oracle(con, "isotonic_calibration_langid", "bin")
    # engine inputs: per-bin doc count and observed successes
    # (reconstruct successes from the milli rate's exact integer form:
    # observed_rate_milli = s*1000 div n  =>  recompute s directly)
    raw = con.execute(
        """
        WITH scored AS (
          SELECT CASE WHEN length(text) = 0 THEN 0
                      ELSE length(regexp_replace(lower(text), '[^etaoinshr]', '', 'g'))
                           * 1000 // length(text) END AS pm,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en
          FROM documents)
        SELECT LEAST(GREATEST((pm - 400) * 10 // 200, 0), 9) AS bin,
               COUNT(*) AS n, SUM(is_en) AS s
        FROM scored GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    bins = [r[0] for r in raw]
    ns = [r[1] for r in raw]
    ss = [float(r[2]) for r in raw]
    # textbook PAVA: pool adjacent blocks while means decrease
    stack: list[list[float]] = []
    spans: list[int] = []
    for n, s in zip(ns, ss):
        stack.append([float(n), s])
        spans.append(1)
        while len(stack) > 1 and stack[-2][1] / stack[-2][0] > stack[-1][1] / stack[-1][0]:
            n2, s2 = stack.pop()
            k = spans.pop()
            stack[-1][0] += n2
            stack[-1][1] += s2
            spans[-1] += k
    expected = []
    for (n, s), k in zip(stack, spans):
        expected.extend([s / n] * k)
    got = {r[0]: r[3] for r in rows}
    assert [r[0] for r in rows] == bins
    for b, e in zip(bins, expected):
        assert got[b] == round(e * 1000), (b, e, got[b])
    # monotone nondecreasing by construction
    fitted = [got[b] for b in bins]
    assert fitted == sorted(fitted)


def test_chi2_matches_textbook_formula(con):
    (n_total, n_cells, dof, chi2_micro, v_milli) = _oracle(
        con, "chi2_returnflag_linestatus", "n_total"
    )[0]
    cells = con.execute(
        "SELECT l_returnflag, l_linestatus, COUNT(*) FROM lineitem GROUP BY 1, 2"
    ).fetchall()
    n = sum(c[2] for c in cells)
    rt = {}
    ct = {}
    for f, s, o in cells:
        rt[f] = rt.get(f, 0) + o
        ct[s] = ct.get(s, 0) + o
    chi2 = sum(
        round(1e6 * (o - rt[f] * ct[s] / n) ** 2 / (rt[f] * ct[s] / n))
        for f, s, o in cells
    )
    assert n_total == n and n_cells == len(cells)
    assert dof == (len(rt) - 1) * (len(ct) - 1)
    assert chi2_micro == chi2
    v = math.sqrt((chi2 / 1e6) / (n * (min(len(rt), len(ct)) - 1)))
    assert v_milli == round(1000 * v)


def test_sprt_llr_and_decision_match_sequential_replay(con):
    rows = _oracle(con, "sprt_conversion_hourly", "variant")
    hourly = con.execute(
        """
        SELECT CAST(('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) % 2 AS variant,
               date_trunc('hour', ts) AS hour,
               COUNT(*) AS n,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS s
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    per = {}
    for v, h, n, s in hourly:
        per.setdefault(v, []).append((h, n, s))
    for variant, n_hours, n_trials, n_success, llr_final, cross_hour, decision in rows:
        seq = per[variant]
        assert n_hours == len(seq)
        assert n_trials == sum(n for _, n, _ in seq)
        assert n_success == sum(s for _, _, s in seq)
        cum = 0
        first = None
        dec = "continue"
        for h, n, s in seq:
            cum += s * SPRT_L1_MICRO + (n - s) * SPRT_L0_MICRO
            if first is None and (cum >= SPRT_A_MICRO or cum <= SPRT_B_MICRO):
                first = h
                dec = "accept_h1" if cum >= SPRT_A_MICRO else "accept_h0"
        assert llr_final == cum
        assert decision == dec
        if first is not None:
            assert cross_hour == first


def test_ks_matches_direct_cdf_definition(con):
    rows = _oracle(con, "ks_doclen_sources", "source_a, source_b")
    raw = con.execute("SELECT source, n_chars FROM documents").fetchall()
    per: dict[str, list[int]] = {}
    for s, v in raw:
        per.setdefault(s, []).append(v)
    for source_a, source_b, n_a, n_b, ks_micro in rows:
        xs_a, xs_b = sorted(per[source_a]), sorted(per[source_b])
        assert (n_a, n_b) == (len(xs_a), len(xs_b))
        support = sorted(set(xs_a) | set(xs_b))
        d = 0.0
        import bisect

        for x in support:
            fa = bisect.bisect_right(xs_a, x) / n_a
            fb = bisect.bisect_right(xs_b, x) / n_b
            d = max(d, abs(fa - fb))
        assert ks_micro == int(d * 1_000_000) or abs(ks_micro - d * 1e6) < 1, (
            source_a,
            source_b,
            ks_micro,
            d,
        )


def _segment_values(con):
    rows = con.execute(
        """
        SELECT c.c_mktsegment, CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        """
    ).fetchall()
    per: dict[str, list[int]] = {}
    for seg, cents in rows:
        per.setdefault(seg, []).append(cents)
    return per


def test_anova_matches_textbook_f(con):
    (n_groups, n_total, ssb_unit, ssw_unit, f_milli) = _oracle(
        con, "anova_order_value_by_segment", "n_groups"
    )[0]
    per = _segment_values(con)
    assert n_groups == len(per) and n_total == sum(len(v) for v in per.values())
    grand = sum(sum(v) for v in per.values()) / n_total
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in per.values())
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v) for v in per.values()
    )
    # engine reports SS in 1e6-cents^2 units with per-group rounding:
    # tolerance = half a unit per group plus the grand-term rounding
    assert abs(ssb_unit - ssb / 1e6) <= len(per) / 2 + 1
    assert abs(ssw_unit - ssw / 1e6) <= len(per) / 2 + 1
    f = (ssb / (len(per) - 1)) / (ssw / (n_total - len(per)))
    assert abs(f_milli - 1000 * f) <= 2


def test_welch_matches_textbook_t_and_df(con):
    (n_a, n_b, mean_a_milli, mean_b_milli, t_milli, df_milli) = _oracle(
        con, "welch_ttest_building_machinery", "n_a"
    )[0]
    per = _segment_values(con)
    xa, xb = per["BUILDING"], per["MACHINERY"]
    assert (n_a, n_b) == (len(xa), len(xb))
    ma, mb = sum(xa) / n_a, sum(xb) / n_b
    assert mean_a_milli == round(1000 * ma)
    assert mean_b_milli == round(1000 * mb)
    va = sum((x - ma) ** 2 for x in xa) / (n_a - 1) / n_a
    vb = sum((x - mb) ** 2 for x in xb) / (n_b - 1) / n_b
    t = (ma - mb) / math.sqrt(va + vb)
    df = (va + vb) ** 2 / (va**2 / (n_a - 1) + vb**2 / (n_b - 1))
    assert abs(t_milli - 1000 * t) <= 1
    assert abs(df_milli - 1000 * df) <= 1


def test_jsd_matches_direct_definition_and_bounds(con):
    rows = _oracle(con, "jsd_source_unigrams", "source_a, source_b")
    cnt = con.execute(
        """
        WITH tok AS (
          SELECT source,
                 unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                    t -> t <> '')) AS term
          FROM documents)
        SELECT source, term, COUNT(*) FROM tok GROUP BY 1, 2
        """
    ).fetchall()
    dist = {}
    for src, term, c in cnt:
        dist.setdefault(src, {})[term] = c
    tot = {s: sum(d.values()) for s, d in dist.items()}
    for source_a, source_b, n_shared, jsd_micro in rows:
        da, db = dist[source_a], dist[source_b]
        ta, tb = tot[source_a], tot[source_b]
        shared = set(da) & set(db)
        assert n_shared == len(shared)
        # direct (unquantized) JSD over the union support
        jsd = 0.0
        for term in set(da) | set(db):
            p = da.get(term, 0) / ta
            q = db.get(term, 0) / tb
            m = (p + q) / 2
            if p:
                jsd += 0.5 * p * math.log(p / m)
            if q:
                jsd += 0.5 * q * math.log(q / m)
        # engine value is nano-quantized per shared term then floored
        # to micro: tolerance = one micro-unit per shared term
        assert 0 <= jsd_micro <= round(math.log(2) * 1e6) + 1
        assert abs(jsd_micro - jsd * 1e6) <= max(2, n_shared * 0.002 + 2), (
            source_a,
            source_b,
            jsd_micro,
            jsd * 1e6,
        )


def test_theilsen_matches_direct_median_of_slopes(con):
    """Recompute the Theil-Sen fit directly: exact integer cents per
    month, all pairwise slopes, true median (statistics.median over
    the quantized slopes) — the oracle's rank-window selection must
    agree, and the intercept must be the median residual."""
    import statistics

    months = con.execute("""
        SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT),
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        FROM orders GROUP BY 1 ORDER BY 1
    """).fetchall()
    x0 = months[0][0]
    pts = [(mi - x0, cents) for mi, cents in months]
    slopes = sorted(
        round(1_000_000.0 * (y2 - y1) / (x2 - x1))
        for i, (x1, y1) in enumerate(pts)
        for (x2, y2) in pts[i + 1 :]
    )
    n = len(slopes)
    s2 = slopes[(n + 1) // 2 - 1] + slopes[(n + 2) // 2 - 1]
    med = s2 / 2.0
    resid = sorted(1_000_000.0 * y - med * x for x, y in pts)
    m = len(resid)
    icept2 = round(resid[(m + 1) // 2 - 1] + resid[(m + 2) // 2 - 1])

    row = con.execute(REGISTRY["theilsen_monthly_revenue"].oracle).fetchone()
    assert row == (len(pts), n, s2, icept2)
    # sanity: median selection != mean (the robustness is real)
    assert med == statistics.median(slopes)


def test_kaplan_meier_matches_textbook_product(con):
    """Recompute KM directly: per-customer sorted order days, gaps with
    the last one censored at the horizon, then the sequential product
    S(t) = prod(1 - d_i/n_i). The oracle's risk sets and event counts
    must be exact; survival may differ only by the documented micro-nat
    quantization (< 1e-3 relative)."""
    rows = con.execute("""
        SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS day
        FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """).fetchall()
    by_cust: dict[int, list[int]] = {}
    for c, day in rows:
        by_cust.setdefault(c, []).append(day)
    horizon = max(d for days in by_cust.values() for d in days)
    durs = []  # (gap, event)
    for days in by_cust.values():
        for a, b in zip(days, days[1:]):
            durs.append((b - a, 1))
        durs.append((horizon - days[-1], 0))

    got = con.execute(REGISTRY["kaplan_meier_reorder_gaps"].oracle).fetchall()
    s = 1.0
    prev = 1 << 62
    for gap, n_risk, n_events, n_censored, surv_micro in got:
        assert n_risk == sum(1 for g, _ in durs if g >= gap)
        assert n_events == sum(1 for g, e in durs if g == gap and e == 1)
        assert n_censored == sum(1 for g, e in durs if g == gap and e == 0)
        s *= 1.0 - n_events / n_risk
        assert abs(surv_micro / 1e6 - s) < 1e-3
        assert surv_micro <= prev  # survival never increases
        prev = surv_micro
    assert got[0][0] >= 0 and len(got) > 50


def test_conformal_quantile_rule_and_coverage(con):
    """Recompute the split-conformal rule directly: same md5 split,
    same quantized ratio fit, q = the ceil((n+1)(1-alpha))-smallest
    calibration residual, coverage counted on the test half. The
    finite-sample guarantee should also show up on this data
    (coverage >= 88% for the 90% target)."""
    import math

    rows = con.execute("""
        SELECT CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                    t -> t <> '')) AS BIGINT),
               CAST(length(text) AS BIGINT),
               CAST(('0x' || substr(md5('conf:' || CAST(doc_id AS VARCHAR)),
                                    1, 15)) AS BIGINT) % 2 = 0
        FROM documents
    """).fetchall()
    calib = [(y, x) for y, x, c in rows if c]
    test = [(y, x) for y, x, c in rows if not c]
    slope = round(1e6 * sum(y for y, _ in calib) / sum(x for _, x in calib))

    def res(y, x):
        return abs(y - round(slope * x / 1e6))

    rs = sorted(res(y, x) for y, x in calib)
    k = math.ceil((len(rs) + 1) * 0.9)
    q = rs[k - 1]
    covered = sum(1 for y, x in test if res(y, x) <= q)

    [row] = con.execute(
        REGISTRY["conformal_token_interval"].oracle
    ).fetchall()
    assert row == (len(calib), len(test), q, covered,
                   round(1000.0 * covered / len(test)))
    assert covered / len(test) >= 0.88


def test_wasserstein_matches_direct_emd(con):
    """W1 between two sources must equal the direct earth-mover
    computation (mean absolute difference of sorted quantile
    functions is equivalent on equal-weight empirical distributions;
    we recompute via the CDF-integral definition directly)."""
    rows = con.execute("""
        SELECT source, n_chars FROM documents
        WHERE source IN ('src0', 'src1')
    """).fetchall()
    a = sorted(v for s, v in rows if s == "src0")
    b = sorted(v for s, v in rows if s == "src1")
    support = sorted(set(a) | set(b))
    m_scaled = 0  # exact: sum |ca*Tb - cb*Ta| * step
    for x, nxt in zip(support, support[1:]):
        ca = sum(1 for v in a if v <= x)
        cb = sum(1 for v in b if v <= x)
        m_scaled += abs(ca * len(b) - cb * len(a)) * (nxt - x)

    got = {
        (ra, rb): (na, nb, w)
        for ra, rb, na, nb, w in con.execute(
            REGISTRY["wasserstein_doclen_sources"].oracle
        ).fetchall()
    }
    na, nb, w_milli = got[("src0", "src1")]
    assert (na, nb) == (len(a), len(b))
    assert w_milli == m_scaled * 1000 // (len(a) * len(b))
    assert len(got) == 20 * 19 // 2


def test_spearman_matches_scipy_free_definition(con):
    """Recompute Spearman directly: tie-averaged ranks by sorting, then
    Pearson over the ranks (pure Python). The census mid-rank form must
    agree to the reported 6 dp."""
    pairs = con.execute("""
        SELECT CAST(length(text) AS BIGINT),
               CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                    t -> t <> '')) AS BIGINT)
        FROM documents
    """).fetchall()

    def midranks(vs):
        order = sorted(range(len(vs)), key=lambda i: vs[i])
        r = [0.0] * len(vs)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vs[order[j]] == vs[order[i]]:
                j += 1
            mid = (i + 1 + j) / 2
            for k in range(i, j):
                r[order[k]] = mid
            i = j
        return r

    ra = midranks([x for x, _ in pairs])
    rb = midranks([y for _, y in pairs])
    n = len(pairs)
    sa, sb = sum(ra), sum(rb)
    sab = sum(a * b for a, b in zip(ra, rb))
    saa = sum(a * a for a in ra)
    sbb = sum(b * b for b in rb)
    rho = (n * sab - sa * sb) / (
        (n * saa - sa * sa) ** 0.5 * (n * sbb - sb * sb) ** 0.5
    )
    [(got_n, got_rho)] = con.execute(
        REGISTRY["spearman_chars_tokens"].oracle
    ).fetchall()
    assert got_n == n
    assert abs(got_rho - rho) < 1e-5
    assert got_rho > 0.5  # longer docs really do have more tokens


def test_fdr_step_up_rule_matches_direct_bh(con):
    """Recompute BH directly: p-values from the one-term KS
    approximation, sorted; keep ranks up to max{k: p_(k) <= k*q/m}.
    The engine's decisions must match set-for-set, and the step-up
    property must hold (everything below a kept rank is kept)."""
    import math

    import eecs_485___mapreduce_spark.queries.inference  # noqa: F401

    ks = con.execute(REGISTRY["ks_doclen_sources"].oracle).fetchall()
    ps = []
    for sa, sb, na, nb, ks_micro in ks:
        d = ks_micro / 1e6
        ne = na * nb / (na + nb)
        p = round(1e6 * min(1.0, 2.0 * math.exp(-2.0 * d * d * ne)))
        ps.append((p, sa, sb))
    ps.sort()
    m = len(ps)
    k_max = 0
    for k, (p, _, _) in enumerate(ps, 1):
        if p * m * 100 <= k * 5 * 1_000_000:
            k_max = k
    want = {(sa, sb) for p, sa, sb in ps[:k_max]}

    rows = con.execute(REGISTRY["fdr_drift_decisions"].oracle).fetchall()
    got = {(sa, sb) for sa, sb, p, rk, sig in rows if sig}
    assert got == want
    ranks_sig = [rk for *_, rk, sig in rows if sig]
    assert ranks_sig == list(range(1, len(ranks_sig) + 1))  # step-up
