"""Config-driven behaviors through the full pipeline: Ignore/Hide/Group
lists and agent mangling (the webalizer.conf keyword semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webalizer_spark.config import EngineConfig, WildcardLists
from webalizer_spark.plans.pipeline import run_pipeline


@pytest.fixture(scope="module")
def cfg_result(spark, transcripts, dims):
    cfg = EngineConfig(
        lists=WildcardLists(
            ignore_url=["msg/*"],          # drop non-tool message turns
            hide_url=["search"],           # aggregate but don't display
            group_url=(("py*", "python-tools"), ("s*", "s-tools")),
        ),
        mangle_agents=3,
    )
    res = run_pipeline(spark, transcripts, dims, cfg=cfg)
    yield res, cfg
    res.unpersist()


def test_ignore_drops_before_aggregation(cfg_result, transcripts):
    res, _ = cfg_result
    # every surviving row has a non-msg path
    assert res.enriched.filter(F.col("path").startswith("msg/")).count() == 0
    # but errors sink is untouched by Ignore (filter order: bad split first)
    assert res.errors.count() > 0


def test_hide_suppresses_display_only(cfg_result):
    res, _ = cfg_result
    top = res.reports["top_tools"].toPandas()
    assert "search" not in top["tool"].tolist()
    # still aggregated: totals include search rows (hits in hourly table
    # exceed the sum of displayed top_tools hits)
    assert res.enriched.filter("tool = 'search'").count() > 0


def test_group_rollup_in_addition_to_individuals(cfg_result):
    res, _ = cfg_result
    grouped = res.reports["grouped_tools"].toPandas()
    groups = grouped[grouped["is_group"]]
    singles = grouped[~grouped["is_group"]]
    assert set(groups["group_name"]) == {"python-tools", "s-tools"}
    py_group = int(groups.loc[groups["group_name"] == "python-tools", "hits"].iloc[0])
    py_single = int(singles.loc[singles["tool"] == "python", "hits"].iloc[0])
    pyspark_rows = singles.loc[singles["tool"] == "pyspark", "hits"]
    assert py_group == py_single + int(pyspark_rows.sum())
    # individuals still present alongside group rows (OBJ_GRP semantics)
    assert "python" in singles["tool"].tolist()


def test_agent_mangle_applied(cfg_result):
    res, _ = cfg_result
    agents = res.reports["top_agents"].toPandas()["agent"]
    # level 3 = family/maj.min — no ' (os)' suffix survives
    assert not agents.str.contains(r"\(").any()
    assert agents.str.match(r"^\S+/\d+\.\d+$").all()
