"""Unit tests for the name-variant battery against a plain-Python
reimplementation of the documented semantics (Processor.py:30-64)."""

import re

import pytest
from pyspark.sql import functions as F

from mergeextractor_spark.functions.strings import company_loose_name


def reference_loose_name(company_name: str) -> str:
    clean = re.sub(r"\(.*?\)", "", company_name)
    words = re.split(r"[\s_]+", clean.strip())
    merge_words = {"net", "com", "org", "co"}
    for i in range(len(words) - 1):
        if words[i].lower() in merge_words:
            words[i] = words[i] + "." + words[i + 1]
            words.pop(i + 1)
            break
    if len(words) > 1:
        if words[-2] == "&":
            words = words[:-2]
        else:
            words = words[:-1]
    return " ".join(words)


CASES = [
    "Johnson & Johnson",
    "CyBear Inc(Andryx Corp)",
    "Alpha Data Systems Inc",
    "Net Solutions Group",
    "Acme",
    "Dallas-Semiconductor Corp",
    "Tele com Brasil SA",
    "Epsilon_Holdings Co",
    "Org Chart Partners LLC",
    "A & B",
    "Trailing Co",
]


@pytest.mark.parametrize("name", CASES)
def test_company_loose_name_matches_reference(spark, name):
    got = (
        spark.createDataFrame([(name,)], "name string")
        .select(company_loose_name(F.col("name")).alias("out"))
        .collect()[0]
        .out
    )
    assert got == reference_loose_name(name), f"{name!r}: {got!r}"
