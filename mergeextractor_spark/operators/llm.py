"""Generic LLM function-call operator (SURVEY §2.8 llm_classify_doc /
llm_extract_initiator; ref Processor.py:309-395, InitiatorIdentifier.py:71-83,
tool schemas config.py:71-140 and 143-210).

Design: ``LLMFunctionCall`` turns a JSON-schema'd tool call into a typed
struct column. The client is pluggable — production would batch API calls
per partition inside ``mapInPandas`` (lazy per-executor singleton, O10);
the default is a deterministic mock so the correctness path never touches
a network. Output goes through ``from_json`` with an explicit StructType,
so downstream stays native.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .cascade import two_pass_passage

# Typed outputs of the two reference tool schemas.
CLASSIFY_SCHEMA = T.StructType(
    [
        T.StructField("hasSection", T.BooleanType()),
        T.StructField("matchHeader", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
    ]
)

INITIATOR_SCHEMA = T.StructType(
    [
        T.StructField("initiator", T.StringType()),
        T.StructField("date_of_initiation", T.StringType()),
        T.StructField("type_of_initiation", T.StringType()),
        T.StructField("stated_reasons", T.StringType()),
    ]
)

INITIATION_TYPES = [
    "Acquirer-Initiated Deal",
    "Target-Initiated Deal",
    "Third-Party-Initiated Deal",
    "Mutual",
]


@dataclass
class LLMFunctionCall:
    """A pluggable structured-extraction stage.

    ``client`` maps a prompt string → JSON string conforming to ``schema``.
    ``apply`` wires it through an Arrow-batched UDF + from_json.
    """

    schema: T.StructType
    client: Callable[[str], str]

    def apply(self, df: DataFrame, text_col: str, out_col: str) -> DataFrame:
        client = self.client

        @F.pandas_udf(T.StringType())
        def _call(texts: pd.Series) -> pd.Series:
            return pd.Series([client(t or "") for t in texts])

        return df.withColumn(out_col, F.from_json(_call(F.col(text_col)), self.schema))


# ---------------------------------------------------------------------------
# Deterministic mock clients (FIXTURES.md §2.7 "keyword-LLM")


def mock_classify_client(text: str) -> str:
    """hasSection iff a catalog phrase heads a >200-char passage (the same
    judgment the fallback LLM makes — ref config.py:76-107 prompt)."""
    passage = two_pass_passage(text)
    if passage is None:
        return json.dumps({"hasSection": False, "matchHeader": "", "confidence": 0.1})
    header = passage.splitlines()[0].strip()
    return json.dumps({"hasSection": True, "matchHeader": header, "confidence": 0.9})


_DATE_RE = re.compile(
    r"\b(?:January|February|March|April|May|June|July|August|September|October|"
    r"November|December)\s+\d{1,2},\s+\d{4}\b"
)
_INITIATED_RE = re.compile(r"initiated by ([A-Z][A-Za-z0-9&.\- ]+?)(?:\.|,|;|\n)")


def mock_initiator_client(text: str) -> str:
    """Templated extraction mirroring the tool schema (config.py:167-208):
    initiator from an 'initiated by X' sentence, date = first long-form
    date, type from keyword cues, reasons = first 'in order to ...' clause.
    Whitespace is collapsed first: filing prose wraps at terminal width."""
    text = re.sub(r"\s+", " ", text)
    m = _INITIATED_RE.search(text)
    initiator = m.group(1).strip() if m else "Mutual"
    dm = _DATE_RE.search(text)
    date = dm.group(0) if dm else ""
    low = text.lower()
    if "jointly" in low or "mutual" in low:
        t = "Mutual"
    elif "advisor" in low or "third party" in low:
        t = "Third-Party-Initiated Deal"
    elif "target proposed" in low or "approached its acquirer" in low:
        t = "Target-Initiated Deal"
    else:
        t = "Acquirer-Initiated Deal"
    rm = re.search(r"in order to ([^.\n]+)", text)
    reasons = rm.group(1).strip() if rm else ""
    return json.dumps(
        {
            "initiator": initiator,
            "date_of_initiation": date,
            "type_of_initiation": t,
            "stated_reasons": reasons,
        }
    )


def llm_classify_doc(df: DataFrame, text_col: str = "content") -> DataFrame:
    """Document classification stage with the deterministic mock client."""
    op = LLMFunctionCall(CLASSIFY_SCHEMA, mock_classify_client)
    out = op.apply(df, text_col, "cls")
    return out.select(
        "*",
        F.col("cls.hasSection").alias("has_section"),
        F.col("cls.matchHeader").alias("match_header"),
        F.col("cls.confidence").alias("confidence"),
    ).drop("cls")


def llm_extract_initiator(df: DataFrame, text_col: str = "content") -> DataFrame:
    """Initiator extraction stage with the deterministic mock client; the
    enum column is CHECK-validated (invalid → NULL) like the reference's
    forced tool schema."""
    op = LLMFunctionCall(INITIATOR_SCHEMA, mock_initiator_client)
    out = op.apply(df, text_col, "init")
    valid = F.col("init.type_of_initiation").isin(INITIATION_TYPES)
    return out.select(
        "*",
        F.col("init.initiator").alias("initiator"),
        F.col("init.date_of_initiation").alias("date_of_initiation"),
        F.when(valid, F.col("init.type_of_initiation")).alias("type_of_initiation"),
        F.col("init.stated_reasons").alias("stated_reasons"),
    ).drop("init")
