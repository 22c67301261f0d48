"""Replay/metrics reports — frodo's reporting surface as single
declarative aggregations (SURVEY.md §2.5 A3-A5).

frodo accumulates per-thread hash maps and merges them at the end
(``frodo-core/.../core/Frodo.java:772-944``, ``ConsumerThread.java:70-122``);
here each report is ONE groupBy/agg — partial aggregation and the
final merge are Catalyst's job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RT histogram bucket edges, seconds — ``Frodo.java:1100-1139``
RT_BUCKETS = ((0.001, "<1ms"), (0.01, "1-10ms"), (0.1, "10-100ms"),
              (1.0, "100ms-1s"), (10.0, "1-10s"), (float("inf"), ">10s"))


def fingerprint_report(
    df: DataFrame,
    fingerprint_col: Column,
    rt_col: Column,
    error_col: Column | None = None,
    sample_col: Column | None = None,
    schema_col: Column | None = None,
    error_sample_col: Column | None = None,
    max_error_samples: int = 5,
) -> DataFrame:
    """Per-template replay report: requests, errors, success rate,
    min/avg/max RT, one sample statement — the reference's detail sheet
    (``DefaultReport.java:12-39``) as one wide aggregation.

    ``schema_col`` adds ``schemas_touched`` (the sorted distinct schema
    names a template hit, comma-joined — ``DefaultReport.java``'s schema
    set) and ``error_sample_col`` adds ``error_samples`` (up to
    ``max_error_samples`` sorted distinct messages from error rows —
    the reference keeps <=5 per template, merged at ``Frodo.java:772-903``).
    Both are strings, not arrays, matching the report-cell rendering and
    keeping the columns hash-comparable across engines."""
    err = error_col if error_col is not None else F.lit(0)
    aggs = [
        F.count("*").cast("long").alias("requests"),
        F.sum(err.cast("int")).cast("long").alias("errors"),
        F.round(1.0 - F.sum(err.cast("int")) / F.count("*"), 6).alias("success_rate"),
        F.round(F.min(rt_col), 6).alias("min_rt"),
        F.round(F.avg(rt_col), 6).alias("avg_rt"),
        F.round(F.max(rt_col), 6).alias("max_rt"),
    ]
    if sample_col is not None:
        aggs.append(F.min(sample_col).alias("sample"))
    if schema_col is not None:
        aggs.append(
            F.array_join(F.sort_array(F.collect_set(schema_col)), ",").alias(
                "schemas_touched"
            )
        )
    if error_sample_col is not None:
        # collect_set ignores NULLs, so non-error rows drop out of the when()
        aggs.append(
            F.array_join(
                F.slice(
                    F.sort_array(
                        F.collect_set(
                            F.when(err.cast("int") == 1, error_sample_col)
                        )
                    ),
                    1,
                    max_error_samples,
                ),
                ",",
            ).alias("error_samples")
        )
    return df.groupBy(fingerprint_col.alias("fingerprint")).agg(*aggs)


def rt_bucket(rt_col: Column) -> Column:
    """Latency bucket label (``Frodo.java:1100-1139`` when-chain)."""
    expr = None
    for edge, label in RT_BUCKETS:
        cond = rt_col < edge if edge != float("inf") else F.lit(True)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr


def rt_histogram(df: DataFrame, rt_col: Column) -> DataFrame:
    return (
        df.select(rt_bucket(rt_col).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("n"))
    )


def summary_report(
    df: DataFrame, rt_col: Column, error_col: Column | None = None
) -> DataFrame:
    """One-row totals sheet (``Frodo.java:1060-1143``/``ReportResult``)."""
    err = error_col if error_col is not None else F.lit(0)
    return df.agg(
        F.count("*").cast("long").alias("requests"),
        F.sum(err.cast("int")).cast("long").alias("errors"),
        F.round(1.0 - F.sum(err.cast("int")) / F.count("*"), 6).alias("success_rate"),
        F.round(F.avg(rt_col), 6).alias("avg_rt"),
        F.round(F.min(rt_col), 6).alias("min_rt"),
        F.round(F.max(rt_col), 6).alias("max_rt"),
    )


def write_replay_report(path: str, **sheets: DataFrame) -> dict[str, int]:
    """Materialize report DataFrames as an XLSX workbook — frodo writes
    its replay results as a detail+summary Excel file
    (``frodo-core/.../core/Frodo.java:944-1060``); this is the same
    artifact over the stdlib writer (``polardbx_tools_spark.xlsx``).

    Reports are AGGREGATES (per-template / per-bucket / one-row) so the
    driver-side collect here is bounded by report cardinality, not data
    size — the same contract as the reference's end-of-run report merge.

    Usage::

        write_replay_report("report.xlsx",
                            detail=fingerprint_report(...),
                            histogram=rt_histogram(...),
                            summary=summary_report(...))

    Returns {sheet_name: n_rows}.
    """
    from polardbx_tools_spark.xlsx import write_xlsx

    out: dict[str, list[list]] = {}
    counts: dict[str, int] = {}
    for name, df in sheets.items():
        rows = df.collect()
        out[name] = [list(df.columns)] + [list(r) for r in rows]
        counts[name] = len(rows)
    write_xlsx(path, out)
    return counts
