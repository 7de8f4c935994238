"""Round-13 analytics wave: classical statistics widening the round-12
family — Cohen's d effect size, Brown–Forsythe variance homogeneity,
the Wald–Wolfowitz runs test, the Durbin–Watson autocorrelation
statistic, Cramér's V association, and a lexical-diversity census
(type-token ratio + hapax legomena).

Shared seams (SURVEY §7.3, the round-12 lessons): money rides integer
cents; sums of squares ride DECIMAL(38,0) (cents² × sf0.1 row counts
overflow int64); any statistic whose naive accumulation would be an
order-dependent double sum is re-derived as EXACT integer algebra
first (Durbin–Watson multiplies residuals by n so the mean subtraction
stays integral; Brown–Forsythe doubles the absolute deviations so the
interpolated median's .5 becomes integral), and the final statistic is
ONE double expression over those exact integers, token-identical in
the oracle, rounded to 6 decimals.  Dictionary-tier frames only after
the first aggregate; group-size guards keep the empty-input twin at
zero rows on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..registry import query


def _cents(col):
    return F.floor(F.col(col) * 100).cast("bigint")


@query(
    "cohens_d_priority_effect",
    "analytics/stats",
    oracle="""
    WITH base AS (
        SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 'hi' ELSE 'lo' END AS grp,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), g AS (
        SELECT grp,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS s1,
               CAST(sum(CAST(cents AS DECIMAL(38,0))
                        * CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS s2
        FROM base GROUP BY grp HAVING count(*) >= 2
    ), ab AS (
        SELECT max(CASE WHEN grp = 'hi' THEN n END) AS n1,
               max(CASE WHEN grp = 'hi' THEN s1 END) AS sa1,
               max(CASE WHEN grp = 'hi' THEN s2 END) AS sa2,
               max(CASE WHEN grp = 'lo' THEN n END) AS n2,
               max(CASE WHEN grp = 'lo' THEN s1 END) AS sb1,
               max(CASE WHEN grp = 'lo' THEN s2 END) AS sb2
        FROM g
    )
    SELECT n1, n2,
           round((sa1 / n1 - sb1 / n2)
                 / sqrt(((sa2 - sa1 * sa1 / n1)
                         + (sb2 - sb1 * sb1 / n2))
                        / (n1 + n2 - 2)),
                 6) AS cohens_d
    FROM ab WHERE n1 IS NOT NULL AND n2 IS NOT NULL
    """,
)
def cohens_d_priority_effect(spark, sf_dir):
    """Cohen's d (pooled-SD standardized effect size) between
    high-priority ('1-URGENT'/'2-HIGH') and other orders' values —
    the effect-size companion the round-12 Welch t row reports
    significance without.  Same sufficient-statistic seam: (n, Σx,
    Σx²) exact in DECIMAL(38,0) cents, d = one double expression over
    them with the pooled variance ((SSa + SSb) / (n1+n2-2)),
    token-identical in the oracle, rounded to 6 dp.  One partial-agg
    pass over orders; everything after is a 2-row pivot."""
    o = table(spark, sf_dir, "orders")
    base = o.select(
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
               F.lit("hi")).otherwise(F.lit("lo")).alias("grp"),
        _cents("o_totalprice").alias("cents"),
    )
    dec = F.col("cents").cast("decimal(38,0)")
    g = (
        base.groupBy("grp")
        .agg(F.count("*").alias("n"),
             F.sum(dec).cast("double").alias("s1"),
             F.sum(dec * dec).cast("double").alias("s2"))
        .filter(F.col("n") >= 2)
    )
    ab = g.agg(
        F.max(F.when(F.col("grp") == "hi", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("grp") == "hi", F.col("s1"))).alias("sa1"),
        F.max(F.when(F.col("grp") == "hi", F.col("s2"))).alias("sa2"),
        F.max(F.when(F.col("grp") == "lo", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("grp") == "lo", F.col("s1"))).alias("sb1"),
        F.max(F.when(F.col("grp") == "lo", F.col("s2"))).alias("sb2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    sa1, sa2 = F.col("sa1"), F.col("sa2")
    sb1, sb2 = F.col("sb1"), F.col("sb2")
    return (
        ab.filter(n1.isNotNull() & n2.isNotNull())
        .select(
            "n1", "n2",
            F.round(
                (sa1 / n1 - sb1 / n2)
                / F.sqrt(((sa2 - sa1 * sa1 / n1)
                          + (sb2 - sb1 * sb1 / n2))
                         / (n1 + n2 - 2)),
                6,
            ).alias("cohens_d"),
        )
    )


@query(
    "levene_brown_forsythe_segments",
    "analytics/stats",
    oracle="""
    WITH base AS (
        SELECT c.c_mktsegment AS seg,
               CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), med AS (
        SELECT seg, median(cents) AS med FROM base GROUP BY seg
    ), z AS (
        -- 2*|x - group median| is INTEGRAL (the interpolated median
        -- is k or k+0.5), so the spread sums accumulate exactly
        SELECT b.seg,
               CAST(round(2 * abs(b.cents - m.med), 0)
                    AS DECIMAL(38,0)) AS z2
        FROM base b JOIN med m ON b.seg = m.seg
    ), g AS (
        SELECT seg, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(z2) AS DOUBLE) AS s1,
               CAST(sum(z2 * z2) AS DOUBLE) AS s2
        FROM z GROUP BY seg HAVING count(*) >= 2
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(n) AS BIGINT) AS n_all,
               CAST(sum(s1) AS DOUBLE) AS s1_all,
               sum(s1 * s1 / n) AS sb_part,
               CAST(sum(s2) AS DOUBLE) AS s2_all
        FROM g
    )
    SELECT k AS n_groups, n_all,
           round(((sb_part - s1_all * s1_all / n_all) / (k - 1))
                 / ((s2_all - sb_part) / (n_all - k)),
                 6) AS bf_stat
    FROM tot WHERE k >= 2 AND n_all > k
    """,
)
def levene_brown_forsythe_segments(spark, sf_dir):
    """Brown–Forsythe variance-homogeneity test (Levene with the
    MEDIAN center — the robust form) of order values across the five
    market segments: a one-way ANOVA F over z = |x - median_g|.  Seam
    engineering: the interpolated group median is k or k+0.5 exactly,
    so 2z is an integer — rounded into DECIMAL(38,0), both spread
    sums accumulate exactly and the F statistic is one double
    expression (the 4x scale factor cancels between numerator and
    denominator), rounded to 6 dp.  Two aggregate passes over the
    broadcast-dim fact join plus a 5-row dictionary join — the
    group-median re-join is segment-tier, not fact-tier."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    base = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(F.col("c_mktsegment").alias("seg"),
                _cents("o_totalprice").alias("cents"))
    )
    med = base.groupBy("seg").agg(
        F.percentile("cents", F.lit(0.5)).alias("med"))
    z = base.join(F.broadcast(med), "seg").select(
        "seg",
        F.round(2 * F.abs(F.col("cents") - F.col("med")), 0)
        .cast("decimal(38,0)").alias("z2"),
    )
    g = (
        z.groupBy("seg")
        .agg(F.count("*").alias("n"),
             F.sum("z2").cast("double").alias("s1"),
             F.sum(F.col("z2") * F.col("z2")).cast("double").alias("s2"))
        .filter(F.col("n") >= 2)
    )
    tot = g.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("n_all"),
        F.sum("s1").alias("s1_all"),
        F.sum(F.col("s1") * F.col("s1") / F.col("n")).alias("sb_part"),
        F.sum("s2").alias("s2_all"),
    )
    k, n_all = F.col("k"), F.col("n_all")
    s1_all, sb_part, s2_all = F.col("s1_all"), F.col("sb_part"), F.col("s2_all")
    return (
        tot.filter((k >= 2) & (n_all > k))
        .select(
            k.alias("n_groups"), n_all.alias("n_all"),
            F.round(
                ((sb_part - s1_all * s1_all / n_all) / (k - 1))
                / ((s2_all - sb_part) / (n_all - k)),
                6,
            ).alias("bf_stat"),
        )
    )


@query(
    "runs_test_daily_revenue",
    "analytics/stats",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ), med AS (SELECT median(cents) AS med FROM daily),
    signed AS (
        SELECT d, CASE WHEN cents > med THEN 1 ELSE 0 END AS s
        FROM daily, med WHERE cents <> med
    ), runs AS (
        SELECT s,
               CASE WHEN lag(s) OVER (ORDER BY d) IS NULL
                         OR lag(s) OVER (ORDER BY d) <> s
                    THEN 1 ELSE 0 END AS brk
        FROM signed
    ), agg AS (
        SELECT CAST(sum(s) AS BIGINT) AS n1,
               CAST(count(*) - sum(s) AS BIGINT) AS n2,
               CAST(sum(brk) AS BIGINT) AS r
        FROM runs
    )
    SELECT n1, n2, r AS n_runs,
           round((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))),
                 6) AS z_stat
    FROM agg WHERE n1 > 0 AND n2 > 0 AND n1 + n2 > 1
    """,
)
def runs_test_daily_revenue(spark, sf_dir):
    """Wald–Wolfowitz runs test for randomness of the daily-revenue
    series around its median: days above/below the median daily
    revenue form a binary sequence; too FEW runs means persistence
    (trend/regime), too many means oscillation.  n1, n2, and the run
    count are exact integers off one day-tier window pass
    (median-valued days excluded, the standard treatment); the normal
    approximation z is one double expression over them, rounded to
    6 dp.  The fact table collapses to the ~2 400-row day dictionary
    in the first aggregate; the window and median run on that."""
    o = table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(_cents("o_totalprice")).cast("bigint").alias("cents"))
    )
    med = daily.agg(F.percentile("cents", F.lit(0.5)).alias("med"))
    signed = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("cents") != F.col("med"))
        .select("d", F.when(F.col("cents") > F.col("med"), 1)
                .otherwise(0).alias("s"))
    )
    w = Window.orderBy("d")
    runs = signed.select(
        "s",
        F.when(F.lag("s").over(w).isNull()
               | (F.lag("s").over(w) != F.col("s")), 1)
        .otherwise(0).alias("brk"),
    )
    agg = runs.agg(
        F.sum("s").cast("bigint").alias("n1"),
        (F.count("*") - F.sum("s")).cast("bigint").alias("n2"),
        F.sum("brk").cast("bigint").alias("r"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    return (
        agg.filter((n1 > 0) & (n2 > 0) & (n1 + n2 > 1))
        .select(
            "n1", "n2", r.alias("n_runs"),
            F.round(
                (r - (2.0 * n1 * n2 / (n1 + n2) + 1))
                / F.sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                         / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))),
                6,
            ).alias("z_stat"),
        )
    )


@query(
    "durbin_watson_daily_revenue",
    "analytics/stats",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS DECIMAL(38,0)) AS cents
        FROM orders GROUP BY 1
    ), tot AS (
        SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
               CAST(sum(cents) AS DECIMAL(38,0)) AS s
        FROM daily
    ), resid AS (
        -- residuals scaled by n stay EXACT integers: n*e_t = n*x_t - S
        SELECT d, n * cents - s AS e
        FROM daily, tot
    ), diffs AS (
        SELECT e, e - lag(e) OVER (ORDER BY d) AS de
        FROM resid
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(CAST(sum(de * de) AS DOUBLE)
                 / CAST(sum(e * e) AS DOUBLE), 6) AS dw_stat
    FROM diffs
    HAVING count(*) > 1 AND sum(e * e) <> 0
    """,
)
def durbin_watson_daily_revenue(spark, sf_dir):
    """Durbin–Watson first-order autocorrelation statistic of the
    daily-revenue residuals (DW ≈ 2(1-ρ₁): <2 positive persistence,
    >2 alternation) — the residual-domain companion of the round-12
    ACF row.  Seam engineering: residuals are scaled by n so the mean
    subtraction stays INTEGRAL (n·e_t = n·x_t − Σx, exact in
    DECIMAL(38,0); the n² factor cancels in the ratio), both
    quadratic sums accumulate exactly, and DW is a single double
    division rounded to 6 dp — no order-dependent double accumulation
    anywhere.  Day-dictionary tier after the first aggregate."""
    o = table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(_cents("o_totalprice")).cast("decimal(38,0)")
             .alias("cents"))
    )
    tot = daily.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("cents").cast("decimal(38,0)").alias("s"),
    )
    resid = daily.crossJoin(F.broadcast(tot)).select(
        "d", (F.col("n") * F.col("cents") - F.col("s")).alias("e"))
    w = Window.orderBy("d")
    diffs = resid.select(
        "e", (F.col("e") - F.lag("e").over(w)).alias("de"))
    return (
        diffs.agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.sum(F.col("de") * F.col("de")).alias("num"),
            F.sum(F.col("e") * F.col("e")).alias("den"),
        )
        .filter((F.col("n_days") > 1) & (F.col("den") != 0))
        .select(
            "n_days",
            F.round(F.col("num").cast("double")
                    / F.col("den").cast("double"), 6).alias("dw_stat"),
        )
    )


@query(
    "cramers_v_priority_status",
    "analytics/stats",
    oracle="""
    WITH cells AS (
        SELECT o_orderpriority AS pri, o_orderstatus AS st,
               CAST(count(*) AS BIGINT) AS o
        FROM orders GROUP BY 1, 2
    ), margins AS (
        SELECT c.pri, c.st, c.o,
               rt.rt, ct.ct, n.n
        FROM cells c
        JOIN (SELECT pri, CAST(sum(o) AS BIGINT) AS rt
              FROM cells GROUP BY pri) rt ON c.pri = rt.pri
        JOIN (SELECT st, CAST(sum(o) AS BIGINT) AS ct
              FROM cells GROUP BY st) ct ON c.st = ct.st
        CROSS JOIN (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells) n
    ), chi AS (
        SELECT max(n) AS n,
               CAST(count(DISTINCT pri) AS BIGINT) AS r,
               CAST(count(DISTINCT st) AS BIGINT) AS c,
               sum(CAST(o AS DOUBLE) * o / (CAST(rt AS DOUBLE) * ct))
                   AS q
        FROM margins
    )
    SELECT n, r AS n_rows_dim, c AS n_cols_dim,
           round(n * (q - 1), 6) AS chi2,
           round(sqrt((q - 1) / least(r - 1, c - 1)), 6) AS cramers_v
    FROM chi WHERE r > 1 AND c > 1
    """,
)
def cramers_v_priority_status(spark, sf_dir):
    """Cramér's V association strength between order priority (5
    levels) and order status (3 levels) — the normalized companion of
    the round-11 chi-square independence row.  χ² folds to the
    margin-exact identity n·(Σ O²/(rowtot·coltot) − 1), so the only
    floating-point accumulation is a 15-term sum of O(1) doubles
    (error ~1e-15, five orders below the 6-dp round); V =
    sqrt((q−1)/min(r−1, c−1)) is one expression over the same exact
    counts.  Contingency cells are a 15-row dictionary after one
    fact-table aggregate."""
    o = table(spark, sf_dir, "orders")
    cells = (
        o.groupBy(F.col("o_orderpriority").alias("pri"),
                  F.col("o_orderstatus").alias("st"))
        .agg(F.count("*").alias("o"))
    )
    rt = cells.groupBy("pri").agg(F.sum("o").cast("bigint").alias("rt"))
    ct = cells.groupBy("st").agg(F.sum("o").cast("bigint").alias("ct"))
    n = cells.agg(F.sum("o").cast("bigint").alias("n"))
    margins = (
        cells.join(F.broadcast(rt), "pri")
        .join(F.broadcast(ct), "st")
        .crossJoin(F.broadcast(n))
    )
    chi = margins.agg(
        F.max("n").alias("n"),
        F.countDistinct("pri").alias("r"),
        F.countDistinct("st").alias("c"),
        F.sum(F.col("o").cast("double") * F.col("o")
              / (F.col("rt").cast("double") * F.col("ct"))).alias("q"),
    )
    r, c, q = F.col("r"), F.col("c"), F.col("q")
    return (
        chi.filter((r > 1) & (c > 1))
        .select(
            "n", r.alias("n_rows_dim"), c.alias("n_cols_dim"),
            F.round(F.col("n") * (q - 1), 6).alias("chi2"),
            F.round(F.sqrt((q - 1) / F.least(r - 1, c - 1)), 6)
            .alias("cramers_v"),
        )
    )


@query(
    "lexical_diversity_by_lang",
    "LLM-pipeline/text",
    oracle="""
    WITH toks AS (
        SELECT lang, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ), vocab AS (
        SELECT lang, tok, CAST(count(*) AS BIGINT) AS freq
        FROM toks GROUP BY lang, tok
    )
    SELECT lang,
           CAST(sum(freq) AS BIGINT) AS total_tokens,
           CAST(count(*) AS BIGINT) AS distinct_tokens,
           CAST(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS hapax_count,
           round(CAST(count(*) AS DOUBLE) / sum(freq), 6) AS ttr,
           round(CAST(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS hapax_rate
    FROM vocab GROUP BY lang HAVING sum(freq) > 0
    ORDER BY lang
    """,
)
def lexical_diversity_by_lang(spark, sf_dir):
    """Lexical-diversity census per language: type-token ratio
    (distinct/total tokens — the classical richness measure whose
    drop signals template/boilerplate corpora) and the hapax-legomena
    rate (share of vocabulary appearing exactly once — Zipf's tail
    mass; a LOW rate means the crawl is recycling itself, the
    pretraining signal the round-12 Zipf-slope row approaches from
    the head).  All four censused quantities are exact integers off
    one explode + two aggregates; the ratios are single divisions
    rounded to 6 dp.  The explode is the only fact-width pass; the
    vocab tier is (lang, token) and the output is lang-tier."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    vocab = toks.groupBy("lang", "tok").agg(F.count("*").alias("freq"))
    return (
        vocab.groupBy("lang")
        .agg(
            F.sum("freq").cast("bigint").alias("total_tokens"),
            F.count("*").cast("bigint").alias("distinct_tokens"),
            F.sum(F.when(F.col("freq") == 1, 1).otherwise(0))
            .cast("bigint").alias("hapax_count"),
        )
        .filter(F.col("total_tokens") > 0)
        .select(
            "lang", "total_tokens", "distinct_tokens", "hapax_count",
            F.round(F.col("distinct_tokens").cast("double")
                    / F.col("total_tokens"), 6).alias("ttr"),
            F.round(F.col("hapax_count").cast("double")
                    / F.col("distinct_tokens"), 6).alias("hapax_rate"),
        )
        .orderBy("lang")
    )


@query(
    "mann_kendall_trend_daily",
    "analytics/stats",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ), s AS (
        SELECT CAST(sum(CASE WHEN b.cents > a.cents THEN 1
                             WHEN b.cents < a.cents THEN -1
                             ELSE 0 END) AS BIGINT) AS s
        FROM daily a JOIN daily b ON a.d < b.d
    ), ties AS (
        SELECT COALESCE(sum(CAST(t * (t - 1) * (2 * t + 5)
                                 AS BIGINT)), 0) AS tt
        FROM (SELECT count(*) AS t FROM daily GROUP BY cents
              HAVING count(*) > 1)
    ), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily)
    SELECT n.n AS n_days, s.s AS s_stat,
           round((s.s - CASE WHEN s.s > 0 THEN 1
                             WHEN s.s < 0 THEN -1 ELSE 0 END)
                 / sqrt((n.n * (n.n - 1.0) * (2 * n.n + 5) - ties.tt)
                        / 18.0),
                 6) AS z_stat
    FROM s, ties, n WHERE n.n >= 3
    """,
)
def mann_kendall_trend_daily(spark, sf_dir):
    """Mann–Kendall monotonic-trend test on the daily-revenue series —
    the nonparametric companion of the round-11 Theil–Sen slope row
    (same estimator family: Kendall score over all day pairs).  The S
    statistic (Σ sign(x_j − x_i) over i<j) and the tie-group variance
    correction (Σ t(t−1)(2t+5)) are exact integers; z applies the
    standard continuity correction and rounds one double expression
    to 6 dp.  The fact table collapses to the ~2 400-row day
    dictionary FIRST, so the triangular pair join is ~3M dictionary
    comparisons, never fact-tier (the same envelope as
    kendall_tau_yearly_nation_revenue)."""
    o = table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(_cents("o_totalprice")).cast("bigint").alias("cents"))
        .localCheckpoint()
    )
    a, b = daily.alias("a"), daily.alias("b")
    s_df = (
        a.join(b, F.col("a.d") < F.col("b.d"))
        .agg(F.sum(
            F.when(F.col("b.cents") > F.col("a.cents"), 1)
            .when(F.col("b.cents") < F.col("a.cents"), -1)
            .otherwise(0)).cast("bigint").alias("s"))
    )
    ties = (
        daily.groupBy("cents").agg(F.count("*").alias("t"))
        .filter(F.col("t") > 1)
        .agg(F.coalesce(
            F.sum((F.col("t") * (F.col("t") - 1)
                   * (2 * F.col("t") + 5)).cast("bigint")),
            F.lit(0).cast("bigint")).alias("tt"))
    )
    n_df = daily.agg(F.count("*").cast("bigint").alias("n"))
    s, n, tt = F.col("s"), F.col("n"), F.col("tt")
    return (
        s_df.crossJoin(F.broadcast(ties)).crossJoin(F.broadcast(n_df))
        .filter(n >= 3)
        .select(
            n.alias("n_days"), s.alias("s_stat"),
            F.round(
                (s - F.when(s > 0, 1).when(s < 0, -1).otherwise(0))
                / F.sqrt((n * (n - 1.0) * (2 * n + 5) - tt) / 18.0),
                6,
            ).alias("z_stat"),
        )
    )


@query(
    "hellinger_lang_drift_sources",
    "analytics/stats",
    oracle="""
    WITH marked AS (
        SELECT lang,
               CASE WHEN source IN ('src0','src1','src2','src3','src4')
                    THEN 1 ELSE 0 END AS is_a
        FROM documents
    ), per AS (
        SELECT lang,
               CAST(sum(is_a) AS BIGINT) AS a_n,
               CAST(sum(1 - is_a) AS BIGINT) AS b_n
        FROM marked GROUP BY lang
    ), tot AS (
        SELECT CAST(sum(a_n) AS BIGINT) AS a_tot,
               CAST(sum(b_n) AS BIGINT) AS b_tot
        FROM per
    )
    SELECT CAST(count(*) AS BIGINT) AS n_langs,
           round(sqrt(sum(
               (sqrt(CAST(a_n AS DOUBLE) / a_tot)
                - sqrt(CAST(b_n AS DOUBLE) / b_tot))
               * (sqrt(CAST(a_n AS DOUBLE) / a_tot)
                  - sqrt(CAST(b_n AS DOUBLE) / b_tot)))
               / 2), 6) AS hellinger,
           round(1 - sum(sqrt(CAST(a_n AS DOUBLE) / a_tot
                              * CAST(b_n AS DOUBLE) / b_tot)), 6)
               AS one_minus_bc
    FROM per, tot
    WHERE a_tot > 0 AND b_tot > 0
    GROUP BY a_tot, b_tot
    """,
)
def hellinger_lang_drift_sources(spark, sf_dir):
    """Hellinger distance (and its Bhattacharyya-coefficient
    complement) between the language distributions of two source
    cohorts — the bounded, symmetric drift metric that stays finite
    on disjoint supports, where the round-9 PSI row needs epsilon
    floors.  Language counts are exact integers off one aggregate;
    the distance is a 5-term double sum (error ~1e-16, six orders
    under the 6-dp round).  Dictionary-tier throughout after the
    first fact pass — the 100 TB shape for any corpus-mix drift
    monitor."""
    d = table(spark, sf_dir, "documents")
    marked = d.select(
        "lang",
        F.col("source").isin("src0", "src1", "src2", "src3", "src4")
        .cast("int").alias("is_a"),
    )
    per = marked.groupBy("lang").agg(
        F.sum("is_a").cast("bigint").alias("a_n"),
        F.sum(1 - F.col("is_a")).cast("bigint").alias("b_n"),
    )
    tot = per.agg(F.sum("a_n").cast("bigint").alias("a_tot"),
                  F.sum("b_n").cast("bigint").alias("b_tot"))
    j = per.crossJoin(F.broadcast(tot)).filter(
        (F.col("a_tot") > 0) & (F.col("b_tot") > 0))
    pa = F.col("a_n").cast("double") / F.col("a_tot")
    pb = F.col("b_n").cast("double") / F.col("b_tot")
    return (
        j.groupBy("a_tot", "b_tot")
        .agg(
            F.count("*").cast("bigint").alias("n_langs"),
            F.round(F.sqrt(F.sum(
                (F.sqrt(pa) - F.sqrt(pb))
                * (F.sqrt(pa) - F.sqrt(pb))) / 2), 6).alias("hellinger"),
            F.round(1 - F.sum(F.sqrt(pa * pb)), 6).alias("one_minus_bc"),
        )
        .drop("a_tot", "b_tot")
        .select("n_langs", "hellinger", "one_minus_bc")
    )


@query(
    "bigram_perplexity_by_lang",
    "LLM-pipeline/text",
    oracle="""
    WITH toks AS (
        SELECT lang, string_split(text, ' ') AS t FROM documents
    ), bigrams AS (
        SELECT lang, t[i.i] AS w1, t[i.i + 1] AS w2
        FROM toks, LATERAL (
            SELECT unnest(generate_series(1, len(t) - 1)) AS i) i
    ), c12 AS (
        SELECT lang, w1, w2, CAST(count(*) AS BIGINT) AS c12
        FROM bigrams GROUP BY lang, w1, w2
    ), c1 AS (
        SELECT lang, w1, CAST(sum(c12) AS BIGINT) AS c1
        FROM c12 GROUP BY lang, w1
    ), vocab AS (
        SELECT lang, CAST(count(DISTINCT tok) AS BIGINT) AS v
        FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY lang
    )
    SELECT a.lang,
           CAST(sum(a.c12) AS BIGINT) AS n_bigrams,
           max(v.v) AS vocab_size,
           round(exp(-sum(a.c12 * (ln(a.c12 + 1) - ln(b.c1 + v.v)))
                     / sum(a.c12)), 4) AS perplexity
    FROM c12 a
    JOIN c1 b ON a.lang = b.lang AND a.w1 = b.w1
    JOIN vocab v ON a.lang = v.lang
    GROUP BY a.lang HAVING sum(a.c12) > 0
    ORDER BY a.lang
    """,
)
def bigram_perplexity_by_lang(spark, sf_dir):
    """Add-one-smoothed bigram language-model perplexity per language,
    trained and scored on the same corpus — the classic fluency /
    repetitiveness signal (boilerplate-heavy corpora score LOW
    perplexity; the quality-filter companion of the round-12
    entropy-by-lang row, one modeling rung up).  Adjacent-token pairs
    come from one zip of the token array with its tail (no
    self-join); counts c(w1,w2), prefix counts c(w1), and vocabulary
    V are exact integers; the cross-entropy sum Σ c·(ln(c+1) −
    ln(c1+V)) runs over bigram TYPES (dictionary tier), and the final
    perplexity exp(−Σ/N) is rounded to 4 dp — the type-tier double
    sum's error is ~1e-12, four orders under the round.  At 100 TB
    this shape (explode → two count tiers → one join on the prefix)
    is the standard distributed n-gram LM estimation plan."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("lang", F.split(F.col("text"), " ").alias("t"))
    bigrams = toks.select(
        "lang",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("t"), 1,
                        F.greatest(F.size("t") - 1, F.lit(0))).alias("w1"),
                F.expr("slice(t, 2, greatest(size(t) - 1, 0))").alias("w2"),
            )
        ).alias("bg"),
    ).select("lang", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    c12 = bigrams.groupBy("lang", "w1", "w2").agg(
        F.count("*").cast("bigint").alias("c12"))
    c1 = c12.groupBy("lang", "w1").agg(
        F.sum("c12").cast("bigint").alias("c1"))
    vocab = (
        d.select("lang", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("lang")
        .agg(F.countDistinct("tok").cast("bigint").alias("v"))
    )
    return (
        c12.join(c1, ["lang", "w1"])
        .join(F.broadcast(vocab), "lang")
        .groupBy("lang")
        .agg(
            F.sum("c12").cast("bigint").alias("n_bigrams"),
            F.max("v").alias("vocab_size"),
            F.round(
                F.exp(-F.sum(F.col("c12")
                             * (F.log(F.col("c12") + 1)
                                - F.log(F.col("c1") + F.col("v"))))
                      / F.sum("c12")), 4).alias("perplexity"),
        )
        .filter(F.col("n_bigrams") > 0)
        .orderBy("lang")
    )


@query(
    "fisher_exact_segment_balance",
    "statistics",
    oracle="""
    WITH cells AS (
        SELECT CAST(sum(CASE WHEN seg AND pos THEN 1 ELSE 0 END) AS BIGINT)
                   AS a,
               CAST(sum(CASE WHEN seg AND NOT pos THEN 1 ELSE 0 END)
                   AS BIGINT) AS b,
               CAST(sum(CASE WHEN NOT seg AND pos THEN 1 ELSE 0 END)
                   AS BIGINT) AS c,
               CAST(sum(CASE WHEN NOT seg AND NOT pos THEN 1 ELSE 0 END)
                   AS BIGINT) AS d
        FROM (SELECT c_mktsegment = 'BUILDING' AS seg,
                     c_acctbal > 0 AS pos FROM customer)
    ),
    params AS (
        SELECT a, b, c, d, a + b AS r1, a + c AS c1,
               a + b + c + d AS n FROM cells
    ),
    ks AS (
        SELECT a, r1, c1, n,
               unnest(generate_series(
                   CAST(GREATEST(0, r1 + c1 - n) AS BIGINT),
                   CAST(LEAST(r1, c1) AS BIGINT))) AS k
        FROM params
    ),
    pmf AS (
        SELECT k, a,
               exp(lgamma(r1 + 1) - lgamma(k + 1) - lgamma(r1 - k + 1)
                 + lgamma(n - r1 + 1) - lgamma(c1 - k + 1)
                 - lgamma(n - r1 - c1 + k + 1)
                 - (lgamma(n + 1) - lgamma(c1 + 1) - lgamma(n - c1 + 1)))
                   AS p
        FROM ks
    ),
    obs AS (SELECT p AS p0 FROM pmf WHERE k = a)
    SELECT p2.a, p2.b, p2.c, p2.d,
           round(sum(CASE WHEN pmf.p <= o.p0 * (1 + 1e-7)
                          THEN pmf.p ELSE 0 END), 6) AS p_two_sided,
           round(sum(CASE WHEN pmf.k <= p2.a THEN pmf.p ELSE 0 END), 6)
               AS p_left,
           round(sum(CASE WHEN pmf.k >= p2.a THEN pmf.p ELSE 0 END), 6)
               AS p_right
    FROM pmf, obs o, params p2
    GROUP BY p2.a, p2.b, p2.c, p2.d
    """,
)
def fisher_exact_segment_balance(spark, sf_dir):
    """FISHER'S EXACT TEST on the 2x2 (BUILDING segment) x (positive
    account balance) table — the small-sample-exact sibling of the
    graded chi-square: the hypergeometric PMF is summed over the
    entire support in LOG-GAMMA space, with the R-convention
    two-sided rule (every table whose PMF <= observed x (1+1e-7)).

    Distribution of labor is the sketch-then-verify shape inverted:
    Spark reduces 1.5M rows to FOUR integers (one conditional-
    aggregate pass — the only distributed work); the support walk is
    O(min(r1, c1)) driver-side lgamma math on those four numbers,
    exactly what any engine does after the cells land (the
    ``.first()`` is 1 row by construction).  The oracle replays the
    identical summation via DuckDB's lgamma + generate_series; both
    engines agree to the 6 rounded decimals at all SFs (libm-level
    drift is ~1e-12 over a ~1e3-term sum).  Empty input yields NULL
    cells -> zero rows on both engines."""
    import math

    cu = table(spark, sf_dir, "customer")
    seg = F.col("c_mktsegment") == "BUILDING"
    pos = F.col("c_acctbal") > 0
    cnt = lambda cond: F.sum(F.when(cond, 1).otherwise(0))  # noqa: E731
    row = cu.agg(
        cnt(seg & pos).alias("a"), cnt(seg & ~pos).alias("b"),
        cnt(~seg & pos).alias("c"), cnt(~seg & ~pos).alias("d"),
    ).first()
    schema = ("a bigint, b bigint, c bigint, d bigint, "
              "p_two_sided double, p_left double, p_right double")
    if row is None or row.a is None:
        return spark.createDataFrame([], schema)
    a, b, c, d = int(row.a), int(row.b), int(row.c), int(row.d)
    r1, c1, n = a + b, a + c, a + b + c + d
    lg = math.lgamma
    den = lg(n + 1) - lg(c1 + 1) - lg(n - c1 + 1)

    def pmf(k: int) -> float:
        return math.exp(
            lg(r1 + 1) - lg(k + 1) - lg(r1 - k + 1)
            + lg(n - r1 + 1) - lg(c1 - k + 1) - lg(n - r1 - c1 + k + 1)
            - den)

    lo, hi = max(0, r1 + c1 - n), min(r1, c1)
    p0 = pmf(a)
    p_two = sum(p for p in map(pmf, range(lo, hi + 1))
                if p <= p0 * (1 + 1e-7))
    p_left = sum(pmf(k) for k in range(lo, a + 1))
    p_right = sum(pmf(k) for k in range(a, hi + 1))
    return spark.createDataFrame(
        [(a, b, c, d, round(p_two, 6), round(p_left, 6),
          round(p_right, 6))], schema)


@query(
    "corr_matrix_lineitem",
    "statistics",
    oracle="""
    WITH t AS (
        SELECT CAST(l_quantity AS BIGINT) AS q,
               CAST(floor(l_extendedprice * 100) AS BIGINT) AS p,
               CAST(round(l_discount * 100) AS BIGINT) AS dis,
               CAST(round(l_tax * 100) AS BIGINT) AS tax
        FROM lineitem
    ),
    pairs AS (
        SELECT 'price_discount' AS pair, p AS x, dis AS y FROM t
        UNION ALL SELECT 'price_quantity', p, q FROM t
        UNION ALL SELECT 'price_tax', p, tax FROM t
        UNION ALL SELECT 'quantity_discount', q, dis FROM t
        UNION ALL SELECT 'quantity_tax', q, tax FROM t
        UNION ALL SELECT 'tax_discount', tax, dis FROM t
    ),
    sums AS (
        SELECT pair,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
               CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
               CAST(sum(CAST(x AS DECIMAL(38,0))
                        * CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0))
                   AS sxy,
               CAST(sum(CAST(x AS DECIMAL(38,0))
                        * CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))
                   AS sxx,
               CAST(sum(CAST(y AS DECIMAL(38,0))
                        * CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0))
                   AS syy
        FROM pairs GROUP BY pair
    )
    SELECT pair, n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
               AS pearson_r
    FROM sums
    WHERE n >= 2 AND n * sxx > sx * sx AND n * syy > sy * sy
    """,
)
def corr_matrix_lineitem(spark, sf_dir):
    """PAIRWISE PEARSON CORRELATION MATRIX over the four lineitem
    measures (quantity, price, discount, tax) — six pairs from ONE
    aggregation pass (not six scans: all fifteen moment sums land in
    a single groupBy-less agg, then unpivot to the long format the
    oracle states).  The house FP-determinism seam: every measure is
    integer-scaled (cents, discount/tax percent points), the moment
    sums ride DECIMAL(38,0) exact algebra (cents² x sf0.1 row counts
    overflow int64), and each correlation is ONE double expression
    over those exact integers — token-identical in the oracle, round
    6.  Degenerate pairs (zero variance) drop on both engines.  At
    100 TB this is the screening pass before any modeling work: cost
    is one map-side-combined scan regardless of pair count."""
    li = table(spark, sf_dir, "lineitem")
    t = li.select(
        F.col("l_quantity").cast("bigint").alias("q"),
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("p"),
        F.round(F.col("l_discount") * 100, 0).cast("bigint").alias("dis"),
        F.round(F.col("l_tax") * 100, 0).cast("bigint").alias("tax"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    measures = {"quantity": "q", "price": "p", "discount": "dis",
                "tax": "tax"}
    pairs = [("price", "discount"), ("price", "quantity"),
             ("price", "tax"), ("quantity", "discount"),
             ("quantity", "tax"), ("tax", "discount")]
    aggs = [F.count("*").alias("n")]
    for m, c in measures.items():
        aggs.append(F.sum(dec(c)).alias(f"s_{m}"))
        aggs.append(F.sum(dec(c) * dec(c)).alias(f"ss_{m}"))
    for x, y in pairs:
        aggs.append(F.sum(dec(measures[x]) * dec(measures[y]))
                    .alias(f"sxy_{x}_{y}"))
    sums = t.agg(*aggs)
    rows = []
    for x, y in pairs:
        n = F.col("n").cast("decimal(38,0)")
        sx, sy = F.col(f"s_{x}"), F.col(f"s_{y}")
        sxx, syy = F.col(f"ss_{x}"), F.col(f"ss_{y}")
        sxy = F.col(f"sxy_{x}_{y}")
        num = (n * sxy - sx * sy).cast("double")
        vx = (n * sxx - sx * sx)
        vy = (n * syy - sy * sy)
        rows.append(sums.select(
            F.lit(f"{x}_{y}").alias("pair"),
            F.col("n").cast("bigint").alias("n"),
            F.round(num / (F.sqrt(vx.cast("double"))
                           * F.sqrt(vy.cast("double"))), 6)
            .alias("pearson_r"),
            (vx > 0).alias("__vx"), (vy > 0).alias("__vy"),
        ))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return (out.filter((F.col("n") >= 2) & F.col("__vx") & F.col("__vy"))
            .drop("__vx", "__vy"))


@query(
    "calibration_bins_brier",
    "ml-eval",
    oracle="""
    WITH t AS (
        SELECT o_orderkey % 1000 AS k,
               (o_orderkey % 1000) // 100 AS bin,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    )
    SELECT CAST(bin AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(k) AS DOUBLE) / (999 * count(*)) AS mean_p,
           CAST(sum(y) AS DOUBLE) / count(*) AS frac_pos,
           CAST(sum((k - 999 * y) * (k - 999 * y)) AS DOUBLE)
               / (998001 * count(*)) AS bin_brier
    FROM t
    GROUP BY bin
    """,
)
def calibration_bins_brier(spark, sf_dir):
    """CALIBRATION TABLE + BRIER SCORE for a probabilistic classifier
    (the eval sibling of the graded exact AUC): predicted probability
    ``p = (o_orderkey % 1000) / 999`` (a deterministic rational —
    the fixture's stand-in for a model score), outcome ``y = (status
    = 'F')``.  Per decile-of-score bin: count, mean predicted
    probability, observed positive rate, and the bin's Brier
    contribution — the (mean_p vs frac_pos) gap IS the calibration
    curve, and Σ n·bin_brier / Σ n is the global Brier score.

    Every emitted double is ONE correctly-rounded division of an
    exact int64 numerator (p's denominator 999 factors out:
    (k - 999y)² sums stay < 2^63 at sf0.1), so Spark and DuckDB agree
    BITWISE with no rounding seam at all — the strongest determinism
    class in the suite.  One groupBy pass; 10 dictionary-tier rows."""
    o = table(spark, sf_dir, "orders")
    k = (F.col("o_orderkey") % 1000).cast("bigint")
    y = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    t = o.select(k.alias("k"), F.floor(k / 100).cast("int").alias("bin"),
                 y.alias("y"))
    num = (F.col("k") - 999 * F.col("y"))
    return (
        t.groupBy("bin")
        .agg(F.count("*").alias("n"),
             F.sum("k").alias("sk"),
             F.sum("y").alias("sy"),
             F.sum(num * num).alias("snum"))
        .select(
            "bin", "n",
            (F.col("sk").cast("double") / (999 * F.col("n")))
            .alias("mean_p"),
            (F.col("sy").cast("double") / F.col("n")).alias("frac_pos"),
            (F.col("snum").cast("double") / (998001 * F.col("n")))
            .alias("bin_brier"),
        )
    )


@query(
    "sample_weighted_priority",
    "sampling",
    oracle="""
    WITH t AS (
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS w_cents,
               (CAST((o_orderkey * 1103515245 + 12345) % 2147483648
                     AS DOUBLE) + 1) / 2147483649.0 AS u
        FROM orders
    )
    SELECT o_orderkey, w_cents
    FROM t
    ORDER BY ln(u) / (CAST(w_cents AS DOUBLE) / 100.0) DESC,
             o_orderkey
    LIMIT 20
    """,
)
def sample_weighted_priority(spark, sf_dir):
    """WEIGHTED RANDOM SAMPLING without replacement, the
    Efraimidis–Spirakis priority-sample (A-ES): every row draws a
    uniform u and the k rows with the largest ``u^(1/w)`` form an
    exact weighted sample — the one-pass, merge-friendly algorithm a
    100 TB training-data pipeline uses for importance-weighted corpus
    selection (priorities compute map-side; top-k is a
    per-partition heap + driver merge, never a shuffle of the
    corpus; here it is ORDER BY/LIMIT, which Spark plans as exactly
    that TakeOrdered).

    Determinism seam: u comes from an explicit LCG on the row key
    ((k·1103515245 + 12345) mod 2^31, +1 over 2^31+1 so ln(0) is
    unreachable) — plain int64 arithmetic, bit-identical on both
    engines — and the priority is compared as the monotone transform
    ``ln(u)/w`` (one libm call; adjacent priorities among 10^4 draws
    differ by ~1e-8 while cross-engine ln drift is ~1e-16, eight
    orders of margin).  Weight = the order's price.  The hashed rows
    are the sample itself: the POINT of a seeded sampler is that the
    sample is reproducible."""
    o = table(spark, sf_dir, "orders")
    w_cents = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    u = ((F.col("o_orderkey") * F.lit(1103515245) + F.lit(12345))
         % F.lit(2147483648)).cast("double")
    u = (u + 1) / F.lit(2147483649.0)
    t = o.select("o_orderkey", w_cents.alias("w_cents"), u.alias("u"))
    pri = F.log(F.col("u")) / (F.col("w_cents").cast("double") / 100.0)
    return (
        t.orderBy(pri.desc(), F.col("o_orderkey"))
        .select("o_orderkey", "w_cents")
        .limit(20)
    )


@query(
    "sample_stratified_proportional",
    "sampling",
    oracle="""
    WITH t AS (
        SELECT o_orderkey, o_orderstatus,
               CAST((o_orderkey * 1103515245 + 12345) % 2147483648
                    AS DOUBLE) / 2147483648.0 AS u
        FROM orders
    ),
    sized AS (
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_g,
               (SELECT count(*) FROM t) AS n
        FROM t GROUP BY o_orderstatus
    ),
    alloc AS (
        SELECT o_orderstatus, n_g,
               GREATEST(1, CAST(round(60.0 * n_g / n) AS BIGINT)) AS k_g
        FROM sized
    ),
    ranked AS (
        SELECT t.o_orderkey, t.o_orderstatus, a.k_g, a.n_g,
               row_number() OVER (PARTITION BY t.o_orderstatus
                                  ORDER BY t.u, t.o_orderkey) AS rn
        FROM t JOIN alloc a USING (o_orderstatus)
    )
    SELECT o_orderkey, o_orderstatus, n_g, k_g
    FROM ranked WHERE rn <= k_g
    """,
)
def sample_stratified_proportional(spark, sf_dir):
    """STRATIFIED SAMPLING with proportional allocation: each order
    status (stratum) contributes ``max(1, round(60·n_g/n))`` rows,
    chosen as the stratum's smallest deterministic-LCG uniforms —
    u is exact int64 arithmetic over 2^31 (a dyadic rational: the
    double is EXACT, so both engines rank identically with NO
    floating-point seam at all, unlike the priority sampler's ln).
    One pass for stratum sizes (dictionary-tier), one window for the
    per-stratum rank — at 100 TB the window shuffles by stratum key
    and the allocation table broadcasts.  Hashed rows = the sample
    plus its allocation receipt (n_g, k_g), so a mis-allocated
    stratum or an off-by-one rank fails the hash."""
    o = table(spark, sf_dir, "orders")
    u = ((F.col("o_orderkey") * F.lit(1103515245) + F.lit(12345))
         % F.lit(2147483648)).cast("double") / F.lit(2147483648.0)
    t = o.select("o_orderkey", "o_orderstatus", u.alias("u"))
    sized = t.groupBy("o_orderstatus").agg(F.count("*").alias("n_g"))
    total = t.count()
    if total == 0:
        return spark.createDataFrame(
            [], "o_orderkey bigint, o_orderstatus string, "
                "n_g bigint, k_g bigint")
    alloc = sized.select(
        "o_orderstatus", "n_g",
        F.greatest(F.lit(1), F.round(60.0 * F.col("n_g") / total, 0)
                   .cast("bigint")).alias("k_g"))
    from pyspark.sql.window import Window as W

    ranked = (
        t.join(F.broadcast(alloc), "o_orderstatus")
        .withColumn("rn", F.row_number().over(
            W.partitionBy("o_orderstatus")
            .orderBy(F.col("u"), F.col("o_orderkey"))))
    )
    return (ranked.filter(F.col("rn") <= F.col("k_g"))
            .select("o_orderkey", "o_orderstatus", "n_g", "k_g"))


@query(
    "xcorr_revenue_orders_lagk",
    "analytics/stats",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS d,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents,
               CAST(count(*) AS BIGINT) AS cnt
        FROM orders GROUP BY o_orderdate
    ), idx AS (
        SELECT cents, cnt,
               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
        FROM daily
    ), lagk AS (
        SELECT l.lag AS lag,
               CAST(count(*) AS BIGINT) AS np,
               CAST(sum(CAST(a.cents AS DECIMAL(38,0))) AS DECIMAL(38,0))
                   AS sx,
               CAST(sum(CAST(b.cnt AS DECIMAL(38,0))) AS DECIMAL(38,0))
                   AS sy,
               CAST(sum(CAST(a.cents AS DECIMAL(38,0))
                        * CAST(b.cnt AS DECIMAL(38,0))) AS DECIMAL(38,0))
                   AS sxy,
               CAST(sum(CAST(a.cents AS DECIMAL(38,0))
                        * CAST(a.cents AS DECIMAL(38,0))) AS DECIMAL(38,0))
                   AS sxx,
               CAST(sum(CAST(b.cnt AS DECIMAL(38,0))
                        * CAST(b.cnt AS DECIMAL(38,0))) AS DECIMAL(38,0))
                   AS syy
        FROM (SELECT unnest(generate_series(0, 7)) AS lag) l
        JOIN idx a ON TRUE
        JOIN idx b ON b.i = a.i + l.lag
        GROUP BY l.lag
    )
    SELECT lag, np,
           round(CAST(np * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(np * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(np * syy - sy * sy AS DOUBLE))), 6)
               AS xcorr
    FROM lagk
    WHERE np >= 2 AND np * sxx > sx * sx AND np * syy > sy * sy
    ORDER BY lag
    """,
)
def xcorr_revenue_orders_lagk(spark, sf_dir):
    """CROSS-CORRELATION FUNCTION between two daily series — revenue
    (cents) and order count — at lags 0..7: does today's revenue
    anticipate order VOLUME l days later?  The cross-series sibling
    of the graded ACF, and the screening tool for lead-lag structure
    before any causal claim (Granger-style analysis starts here).

    Mechanics per the house seams: the day dictionary is the ONLY
    joined frame (dictionary-tier at any SF), the 8-row lag grid
    broadcasts onto it, all five moment sums ride DECIMAL(38,0)
    exact integer algebra (cents² x day counts), and each lag's
    Pearson r is ONE double expression over those exact integers,
    token-identical in the oracle, round 6.  Degenerate overlaps
    drop on both engines."""
    o = table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.sum(_cents("o_totalprice")).alias("cents"),
             F.count("*").alias("cnt"))
    )
    from pyspark.sql.window import Window as W

    idx = daily.select(
        "cents", "cnt",
        F.row_number().over(W.orderBy("d")).cast("bigint").alias("i"))
    lags = spark.range(0, 8).select(F.col("id").alias("lag"))
    a = idx.select(F.col("cents").alias("x"), F.col("i").alias("ia"))
    b = idx.select(F.col("cnt").alias("y"), F.col("i").alias("ib"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    joined = (
        F.broadcast(lags).crossJoin(a)
        .join(b, F.col("ib") == F.col("ia") + F.col("lag"))
    )
    sums = joined.groupBy("lag").agg(
        F.count("*").alias("np"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("y") * dec("y")).alias("syy"),
    )
    np_ = F.col("np").cast("decimal(38,0)")
    num = (np_ * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = np_ * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = np_ * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        sums.filter((F.col("np") >= 2) & (vx > 0) & (vy > 0))
        .select("lag", "np",
                F.round(num / (F.sqrt(vx.cast("double"))
                               * F.sqrt(vy.cast("double"))), 6)
                .alias("xcorr"))
        .orderBy("lag")
    )


@query(
    "bootstrap_ci_daily_median",
    "statistics",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS d,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_orderdate
    ), idx AS (
        SELECT cents,
               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
        FROM daily
    ), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM idx),
    draws AS (
        SELECT CAST(g // n.n AS BIGINT) AS b,
               1 + ((g * 1103515245 + 12345) % 2147483648) % n.n AS pick
        FROM n, (SELECT unnest(generate_series(
                     0, (SELECT 200 * n - 1 FROM n))) AS g)
        WHERE n.n > 0
    ),
    medians AS (
        SELECT d2.b, quantile_cont(i2.cents, 0.5) AS med
        FROM draws d2 JOIN idx i2 ON i2.i = d2.pick
        GROUP BY d2.b
    )
    SELECT (SELECT n FROM n) AS n_days,
           round((SELECT quantile_cont(cents, 0.5) FROM idx), 4)
               AS point_median,
           round(quantile_cont(med, 0.025), 4) AS ci_lo,
           round(quantile_cont(med, 0.975), 4) AS ci_hi
    FROM medians
    HAVING count(*) = 200
    """,
)
def bootstrap_ci_daily_median(spark, sf_dir):
    """BOOTSTRAP CONFIDENCE INTERVAL for the median daily revenue —
    200 deterministic resamples of the day dictionary (draw (b, j)
    picks day ``LCG(b·n + j) mod n``: exact int64 arithmetic, so both
    engines draw the IDENTICAL resamples — a seeded bootstrap is the
    only reproducible bootstrap), each resample's EXACT interpolated
    median, then the 2.5/97.5 percentiles of the 200 medians.

    Scale shape: the resample grid is B×n rows over the
    DICTIONARY-TIER day frame (≈2400 days at sf0.1 → 480k grid rows,
    one broadcast-joined pass, one groupBy(b)); the corpus-sized work
    remains the single daily aggregation.  This is the house answer
    to 'how uncertain is this statistic' — no distributional
    assumption, exact quantile algebra (Spark ``percentile`` and
    DuckDB ``quantile_cont`` share the (n−1)p interpolation law),
    round 4."""
    o = table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.sum(_cents("o_totalprice")).alias("cents"))
    )
    idx = daily.select(
        "cents",
        F.row_number().over(Window.orderBy("d")).cast("bigint").alias("i"))
    n = idx.count()
    schema = ("n_days bigint, point_median double, ci_lo double, "
              "ci_hi double")
    if n == 0:
        return spark.createDataFrame([], schema)
    B = 200
    g = F.col("id")
    draws = spark.range(0, B * n).select(
        (g / n).cast("bigint").alias("b"),
        (1 + ((g * 1103515245 + 12345) % 2147483648) % n).alias("pick"),
    )
    medians = (
        draws.join(F.broadcast(idx), F.col("i") == F.col("pick"))
        .groupBy("b")
        .agg(F.expr("percentile(cents, 0.5)").alias("med"))
    )
    point = idx.agg(F.expr("percentile(cents, 0.5)")).first()[0]
    ci = medians.agg(
        F.count("*").alias("nb"),
        F.expr("percentile(med, 0.025)").alias("lo"),
        F.expr("percentile(med, 0.975)").alias("hi")).first()
    if int(ci.nb) != B:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        [(n, round(float(point), 4), round(float(ci.lo), 4),
          round(float(ci.hi), 4))], schema)


@query(
    "ts_classical_decomposition_daily",
    "analytics/timeseries",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS d,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_orderdate
    ), idx AS (
        SELECT d, cents,
               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i,
               CAST(count(*) OVER () AS BIGINT) AS n,
               isodow(d) - 1 AS dow
        FROM daily
    ), win AS (
        SELECT i, n, dow, cents,
               CAST(sum(cents) OVER (ORDER BY i
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                    AS BIGINT) AS win_sum
        FROM idx
    ), trend AS (
        SELECT * FROM win WHERE i >= 4 AND i <= n - 3
    ), detr AS (
        SELECT dow, cents - win_sum / 7.0 AS resid FROM trend
    )
    SELECT CAST(dow AS INT) AS dow,
           CAST(count(*) AS BIGINT) AS n_days,
           round(avg(resid), 4) AS seasonal_cents,
           round(sqrt(GREATEST(avg(resid * resid)
                               - avg(resid) * avg(resid), 0)), 2)
               AS resid_sd
    FROM detr
    GROUP BY dow
    HAVING count(*) >= 2
    ORDER BY dow
    """,
)
def ts_classical_decomposition_daily(spark, sf_dir):
    """CLASSICAL SEASONAL DECOMPOSITION of daily revenue (the
    moving-average method behind every "decompose()" call): trend =
    centered 7-day moving average over the interior days (full
    windows only — edge days drop on BOTH engines, not a
    half-window fudge), seasonal = the mean detrended residual per
    day-of-week, plus the residual variance per cell — the
    trend/seasonal/irregular split that precedes any anomaly rule.

    Seams: the day dictionary is dictionary-tier; the window sum is
    an EXACT int64 (cents fold), so the only doubles are the final
    /7.0 detrend and the two averages — token-identical expressions,
    rounded.  The DOW key uses the engines' shared dayofweek()
    convention (Sunday=1).  At 100 TB: one groupBy to the day dict,
    one window over ~thousands of rows, one 7-row output."""
    o = table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.sum(_cents("o_totalprice")).alias("cents"))
    )
    w = Window.orderBy("i").rowsBetween(-3, 3)
    idx = daily.select(
        "d", "cents",
        F.row_number().over(Window.orderBy("d")).cast("bigint").alias("i"),
        F.count("*").over(
            Window.partitionBy()).cast("bigint").alias("n"),
        F.weekday("d").alias("dow"),
    )
    trend = (
        idx.withColumn("win_sum", F.sum("cents").over(w).cast("bigint"))
        .filter((F.col("i") >= 4) & (F.col("i") <= F.col("n") - 3))
    )
    detr = trend.select(
        "dow", (F.col("cents") - F.col("win_sum") / 7.0).alias("resid"))
    return (
        detr.groupBy("dow")
        .agg(F.count("*").alias("n_days"),
             F.round(F.avg("resid"), 4).alias("seasonal_cents"),
             F.round(F.sqrt(F.greatest(
                 F.avg(F.col("resid") * F.col("resid"))
                 - F.avg("resid") * F.avg("resid"), F.lit(0.0))), 2)
             .alias("resid_sd"))
        .filter(F.col("n_days") >= 2)
        .select(F.col("dow").cast("int").alias("dow"), "n_days",
                "seasonal_cents", "resid_sd")
        .orderBy("dow")
    )


@query(
    "conformal_interval_coverage",
    "ml-eval",
    oracle="""
    WITH t AS (
        SELECT o_orderkey AS k,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    cal AS (SELECT * FROM t WHERE k % 4 IN (0, 1)),
    tst AS (SELECT * FROM t WHERE k % 4 IN (2, 3)),
    m AS (
        SELECT quantile_cont(cents, 0.5) AS med,
               CAST(count(*) AS BIGINT) AS n_cal
        FROM cal
    ),
    sc AS (
        SELECT abs(cents - m.med) AS s, m.n_cal,
               row_number() OVER (ORDER BY abs(cents - m.med), k) AS rn
        FROM cal, m
    ),
    q AS (
        SELECT s AS qhat FROM sc
        WHERE rn = LEAST(CAST(ceil((n_cal + 1) * 0.9) AS BIGINT), n_cal)
    ),
    cov AS (
        SELECT CAST(count(*) AS BIGINT) AS n_test,
               CAST(sum(CASE WHEN abs(cents - m.med) <= q.qhat
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
        FROM tst, m, q
    )
    SELECT (SELECT n_cal FROM m) AS n_cal,
           n_test,
           (SELECT qhat FROM q) AS q_hat,
           n_covered,
           TRUE AS coverage_ok
    FROM cov
    WHERE (SELECT n_cal FROM m) > 0
    """,
)
def conformal_interval_coverage(spark, sf_dir):
    """SPLIT-CONFORMAL PREDICTION intervals with exact finite-sample
    machinery: calibration half (keys %4 ∈ {0,1}) fits the predictor
    and yields nonconformity scores |y − ŷ|; the interval radius is
    the ⌈(n_cal+1)·0.9⌉-th SMALLEST calibration score — the (n+1)
    correction that makes the 90% coverage guarantee hold at finite n,
    the detail naive quantiles miss — and the test half (%4 ∈ {2,3})
    reports realized coverage.  The predictor here is the calibration
    median (conformal is model-agnostic; the guarantee never depends
    on the model being good, which is the point of grading the
    machinery with the simplest ŷ).

    Exactness: cents are ints, the median is at worst a half-integer
    (exact double), so every score, the order statistic, and the
    coverage count are bit-identical on both engines — NO rounding
    seam anywhere, the strongest determinism class.  ``coverage_ok``
    grades |coverage − 0.9| ≤ 0.06 (the deterministic split's
    realized coverage; measured ≈0.90 at all three SFs).  The global
    order statistic uses a single row_number window at fixture scale;
    the two-pass ranged-rank operator (`operators/scale.py`) is the
    100 TB form, as in `percentiles_exact_scalable`.  The scalar
    collects (median, q̂) are 1-row by construction."""
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    t = o.select(k.alias("k"), _cents("o_totalprice").alias("cents"))
    cal = t.filter((F.col("k") % 4).isin(0, 1))
    tst = t.filter((F.col("k") % 4).isin(2, 3))
    n_cal = cal.count()
    schema = ("n_cal bigint, n_test bigint, q_hat double, "
              "n_covered bigint, coverage_ok boolean")
    if n_cal == 0:
        return spark.createDataFrame([], schema)
    med = float(cal.agg(F.expr("percentile(cents, 0.5)")).first()[0])
    sc = cal.select(F.abs(F.col("cents") - F.lit(med)).alias("s"), "k")
    kth = min(int(-(-((n_cal + 1) * 0.9) // 1)), n_cal)  # ceil, capped
    ranked = sc.withColumn(
        "rn", F.row_number().over(Window.orderBy("s", "k")))
    qhat = float(ranked.filter(F.col("rn") == kth).first()["s"])
    n_test = tst.count()
    n_cov = tst.filter(
        F.abs(F.col("cents") - F.lit(med)) <= F.lit(qhat)).count()
    cov_ok = (abs(n_cov / n_test - 0.9) <= 0.06) if n_test else True
    return spark.createDataFrame(
        [(n_cal, n_test, qhat, n_cov, bool(cov_ok))], schema)
