"""Physical-plan inspection helpers.

The reference has no optimizer (SURVEY §4) — every physical property was
hand-coded. Here the properties come from Catalyst, so the engine's
"optimizer surface" is *observable* rather than configurable: these
helpers extract the facts that matter at 100 TB (what reached the scan,
what shuffles, what broadcasts) for tests (`tests/test_plans.py`) and
for the generated `PLANS.md` audit (`tools/dump_plans.py`).
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame, *, execute: bool = False) -> str:
    """The formatted explain output as a string; with ``execute=True`` the
    query runs first so AQE's final plan (with codegen ids) is shown."""
    df.sparkSession.conf.set("spark.sql.maxMetadataStringLength", "10000")
    if execute:
        df.write.mode("overwrite").format("noop").save()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@dataclass
class PlanFacts:
    """The scale-relevant facts of one physical plan."""

    n_scans: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    n_exchanges: int = 0
    n_broadcasts: int = 0
    has_partial_agg: bool = False
    python_stages: list[str] = field(default_factory=list)

    @property
    def n_shuffles(self) -> int:
        # BroadcastExchange is not a shuffle; count only data exchanges.
        return self.n_exchanges


def plan_facts(df: DataFrame) -> PlanFacts:
    text = formatted_plan(df)
    facts = PlanFacts()
    facts.n_scans = len(re.findall(r"\(\d+\) Scan parquet", text))
    facts.pushed_filters = [
        m.strip()
        for m in re.findall(r"PushedFilters: \[(.*?)\]", text)
        if m.strip()
    ]
    facts.read_schemas = re.findall(r"ReadSchema: (\S+)", text)
    facts.n_broadcasts = text.count("BroadcastExchange")
    facts.n_exchanges = len(re.findall(r"\(\d+\) Exchange", text))
    facts.has_partial_agg = "partial_" in text
    facts.python_stages = re.findall(
        r"\(\d+\) (MapInPandas|FlatMapGroupsInPandas|ArrowEvalPython|"
        r"BatchEvalPython|FlatMapGroupsInPandasWithState)",
        text,
    )
    return facts
