"""Smoke the runnable examples (examples/*.py) — each mirrors one of
the reference's shipped binaries end-to-end: event log → dataflow →
SQLite mirror with offsets committed in the same transaction, in a
catch-up epoch then a live epoch that applies only the net delta."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("mod_name", ["machine_dashboard", "machine_usage"])
def test_event_examples_two_epochs(spark, tmp_path, mod_name):
    import importlib

    from _runner import run_two_epochs

    mod = importlib.import_module(mod_name)
    sink, stats = run_two_epochs(
        mod.TABLE, mod.build_view, sf_dir=SF, db_path=str(tmp_path / "db.sqlite"), spark=spark
    )
    catchup, live = stats
    # offsets advanced transactionally with the data
    assert live["offsets"] == {"events": live["offset"]} and live["offset"] > catchup["offset"]
    # final table == the view computed directly over the full log
    from actyxos_data_flow_spark.sources import load_table

    expect = mod.build_view(load_table(spark, SF, "events")).count()
    assert live["table_rows"] == expect > 0
    sink.close()


def test_finished_goods_examples_agree(spark, tmp_path):
    import finished_goods_1 as fg1
    import finished_goods_2 as fg2

    s1, st1 = fg1.main(sf_dir=SF, db_path=str(tmp_path / "fg1.sqlite"), spark=spark)
    s2, st2 = fg2.main(sf_dir=SF, db_path=str(tmp_path / "fg2.sqlite"), spark=spark)
    # the two variants are the same program (the reference's difference
    # is Rust-side string interning): identical tables, identical stats
    assert s1.rows(fg1.TABLE) == s2.rows(fg1.TABLE)
    assert [x["table_rows"] for x in st1] == [x["table_rows"] for x in st2]
    # live epoch shipped a delta, not a re-send of the unchanged rows
    assert st1[1]["delta_rows_applied"] < 2 * st1[1]["table_rows"]
    s1.close()
    s2.close()
