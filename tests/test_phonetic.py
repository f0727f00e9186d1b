"""Soundex parity: goldens (published archival-soundex examples, the
set commons-codec's SoundexTest pins), Python vs Column expression vs
the oracle's SQL expression, on goldens and random words."""

from __future__ import annotations

import random
import string

import duckdb
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.phonetic import (
    soundex,
    soundex_col,
    soundex_sql,
)

GOLDENS = {
    "Robert": "R163",
    "Rupert": "R163",
    "Ashcraft": "A261",  # H transparent: S,C merge
    "Ashcroft": "A261",
    "Tymczak": "T522",
    "Pfister": "P236",  # first-letter run: F collapses into P
    "Honeyman": "H555",
    "Washington": "W252",
    "Lee": "L000",
    "Gutierrez": "G362",
    "Jackson": "J250",
    "VanDeusen": "V532",
    "HOLMES": "H452",
    "ADOMOMI": "A355",
    "W": "W000",
    "a": "A000",
    "": "",
    "123": "",
}


def test_python_goldens():
    for w, want in GOLDENS.items():
        assert soundex(w) == want, w


def test_column_matches_python(spark):
    words = list(GOLDENS) + [
        "".join(random.Random(i).choices(string.ascii_lowercase,
                                         k=random.Random(i).randint(1, 12)))
        for i in range(200)
    ]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r.w: r.s for r in df.select("w", soundex_col(F.col("w")).alias("s")).collect()}
    for w in words:
        assert got[w] == soundex(w), w


def test_sql_matches_python():
    con = duckdb.connect()
    for w in GOLDENS:
        lit = "'" + w.replace("'", "''") + "'"
        got = con.execute(f"SELECT {soundex_sql(lit)}").fetchone()[0]
        assert got == soundex(w), w
