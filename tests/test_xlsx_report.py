"""XLSX round-trip (stdlib OpenXML subset) + frodo-style replay report
artifact emission (ref XlsxReader/XlsxFileWriter, Frodo.java:944-1060)."""

import zipfile

from pyspark.sql import functions as F

from polardbx_tools_spark import report as rpt
from polardbx_tools_spark.export import export_xlsx
from polardbx_tools_spark.sources import read_xlsx
from polardbx_tools_spark.xlsx import read_xlsx_rows, write_xlsx


def test_xlsx_write_read_roundtrip(tmp_path):
    path = str(tmp_path / "t.xlsx")
    sheets = {
        "first": [["name", "n", "ok"],
                  ["alice", 1.5, True],
                  ["bob, \"quoted\" & <xml>", -2.0, False],
                  [None, 0.0, None]],
        "second": [["only"], ["row"]],
    }
    write_xlsx(path, sheets)
    assert zipfile.is_zipfile(path)
    got0 = read_xlsx_rows(path, sheet=0)
    assert got0[0] == ["name", "n", "ok"]
    assert got0[1] == ["alice", 1.5, True]
    assert got0[2][0] == 'bob, "quoted" & <xml>'
    assert got0[3] == [None, 0.0, None]
    assert read_xlsx_rows(path, sheet=1) == [["only"], ["row"]]


def test_export_and_source_xlsx(spark, tmp_path):
    path = str(tmp_path / "export.xlsx")
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.5)], "name string, score double"
    )
    n = export_xlsx(df, path)
    assert n == 2
    back = read_xlsx(spark, path)
    got = {r["name"]: r["score"] for r in back.collect()}
    assert got == {"a": 1.0, "b": 2.5}


def test_write_replay_report_workbook(spark, tmp_path):
    path = str(tmp_path / "report.xlsx")
    ev = spark.createDataFrame(
        [("q1", 0.002, 0), ("q1", 0.004, 0), ("q2", 1.5, 1)],
        "fp string, rt double, err int",
    )
    counts = rpt.write_replay_report(
        path,
        detail=rpt.fingerprint_report(ev, F.col("fp"), F.col("rt"), F.col("err")),
        histogram=rpt.rt_histogram(ev, F.col("rt")),
        summary=rpt.summary_report(ev, F.col("rt"), F.col("err")),
    )
    assert counts == {"detail": 2, "histogram": 2, "summary": 1}
    detail = read_xlsx_rows(path, sheet=0)
    assert detail[0][:3] == ["fingerprint", "requests", "errors"]
    by_fp = {r[0]: r for r in detail[1:]}
    assert by_fp["q1"][1] == 2.0 and by_fp["q2"][2] == 1.0
    summary = read_xlsx_rows(path, sheet=2)
    assert summary[1][summary[0].index("requests")] == 3.0
