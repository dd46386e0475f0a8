"""Dump-line parsing (S1/F1/F4) — INSERT statement state machine."""

from __future__ import annotations

from spikex_spark.sources import (
    parse_categorylinks_row,
    parse_page_row,
    parse_redirect_row,
    read_wiki_dump,
    split_insert_values,
)

PAGE_LINE = (
    "INSERT INTO `page` VALUES "
    "(10,0,'Apple_(company)','',0,0),"
    "(11,0,'O\\'Brien','',0,0),"
    "(12,14,'Category:Fruits','',0,0),"
    "(13,2,'User:Bob','',0,0);"
)


def test_split_insert_values_quotes_escapes():
    rows = split_insert_values(PAGE_LINE)
    assert len(rows) == 4
    assert rows[0][2] == "'Apple_(company)'"
    assert rows[1][2] == "'O\\'Brien'"


def test_split_handles_parens_in_strings():
    line = "INSERT INTO t VALUES (1,'a(b),c'),(2,'x');"
    rows = split_insert_values(line)
    assert rows == [("1", "'a(b),c'"), ("2", "'x'")]


def test_non_insert_lines_ignored():
    assert split_insert_values("-- comment") == []
    assert split_insert_values("CREATE TABLE page (...);") == []


def test_parse_page_namespace_filter():
    rows = split_insert_values(PAGE_LINE)
    parsed = [parse_page_row(r) for r in rows]
    kept = [p for p in parsed if p]
    assert kept == [
        (0, 10, "Apple_(company)"),
        (0, 11, "O'Brien"),
        (14, 12, "Category:Fruits"),
    ]  # ns=2 dropped (F1)


def test_parse_redirect_and_categorylinks():
    assert parse_redirect_row(("5", "0", "'Apple'")) == (5, "Apple")
    assert parse_redirect_row(("5", "3", "'X'")) is None
    assert parse_categorylinks_row(("7", "'Fruits'", "'x'", "'page'")) == (
        7, "Fruits", "page")
    assert parse_categorylinks_row(("7", "'F'", "'x'", "'file'")) is None


def test_read_wiki_dump_spark(spark, tmp_path):
    dump = tmp_path / "page.sql"
    dump.write_text("-- header\n" + PAGE_LINE + "\n")
    df = read_wiki_dump(spark, str(dump), "page")
    got = sorted((r["ns"], r["pageid"], r["title"]) for r in df.collect())
    assert got == [(0, 10, "Apple_(company)"), (0, 11, "O'Brien"),
                   (14, 12, "Category:Fruits")]
