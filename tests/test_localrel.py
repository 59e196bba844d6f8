"""local_df (r13): driver-side row lists as TRUE LocalRelations.

The optimization claim is twofold and both halves are pinned here:
(1) values and schema are identical to spark.createDataFrame for the
supported types (including exact IEEE doubles and arbitrary strings),
and (2) the result actually plans as a LocalRelation (no pickled-RDD
scan — the whole point; a regression back to an RDD path would
silently reintroduce the 32-task Python-worker stage this replaced).
"""

from __future__ import annotations

import datetime
import struct

from open_crime_etl_pipeline_spark.localrel import local_df


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _same_as_create(spark, rows, ddl):
    a = local_df(spark, rows, ddl)
    b = spark.createDataFrame(rows, ddl)
    assert [(f.name, f.dataType) for f in a.schema.fields] == [
        (f.name, f.dataType) for f in b.schema.fields
    ], ddl
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect())), ddl
    return a


class TestLocalDf:
    def test_simple_types_and_local_plan(self, spark):
        a = _same_as_create(
            spark,
            [(1, "a'b\\c\x1fz", 1.5), (2, None, 1e-17)],
            "id long, s string, x double",
        )
        assert "LocalRelation" in _plan(a)

    def test_codebook_shape(self, spark):
        a = _same_as_create(
            spark,
            [(0, 5, [0.1, 2.0 / 3.0, -0.0]), (1, 7, [1e300, -1e-300, 0.0])],
            "s int, cid bigint, cvec array<double>",
        )
        assert "LocalRelation" in _plan(a)

    def test_misc_types(self, spark):
        _same_as_create(
            spark,
            [(True, b"\x00\xff", datetime.date(2024, 2, 29))],
            "b boolean, raw binary, d date",
        )
        _same_as_create(
            spark,
            [("", "unicode→é€😀", -(2**63))],
            "e string, u string, big long",
        )

    def test_doubles_bit_exact(self, spark):
        import random

        rng = random.Random(13)
        vals = [rng.uniform(-1e300, 1e300) for _ in range(25)] + [
            5e-324, 0.1, 2.0 / 3.0,
        ]
        got = [
            r[0]
            for r in local_df(spark, [(v,) for v in vals], "x double")
            .collect()
        ]
        assert all(
            struct.pack("d", a) == struct.pack("d", b)
            for a, b in zip(vals, got)
        )

    def test_empty_falls_back(self, spark):
        df = local_df(spark, [], "id long, s string")
        assert df.count() == 0
        assert [f.name for f in df.schema.fields] == ["id", "s"]

    def test_unsupported_type_falls_back(self, spark):
        rows = [({"k": 1},)]
        df = local_df(spark, rows, "m map<string,int>")
        assert df.collect()[0][0] == {"k": 1}
