"""Run ledger — pipeline metadata table (SURVEY.md §2.8 ST8, §2.9).

Reference: `logs` table (create_logs.sql:1-11) written via
``init_log``/``insert``/``update`` (`db_postgres.py:38-63,113-149`).
Here it's a small parquet table managed read-modify-write; statuses
RUNNING→SUCCESS/FAILED, types SCHEDULED/RECOVERY, modes
FULL/INCREMENT (`crime_etl.py:104-106,429`).

The ledger is metadata (thousands of rows, not billions): a driver-side
overwrite of a tiny table per run is the right tool; the fact tables
never take this path.
"""

from __future__ import annotations

import datetime as dt
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import LOGS_SCHEMA


def _utcnow() -> dt.datetime:
    # tz-aware UTC: `utcnow()` is deprecated (3.12+) and its naive result
    # silently re-interprets under a non-UTC session timezone — an
    # engine-level TIMESTAMPTZ correctness trap.
    return dt.datetime.now(dt.timezone.utc)


class RunLedger:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _exists(self) -> bool:
        return os.path.exists(self.path) and any(
            f.endswith(".parquet") for _, _, fs in os.walk(self.path) for f in fs
        )

    def read(self) -> DataFrame:
        if not self._exists():
            return self.spark.createDataFrame([], LOGS_SCHEMA)
        return self.spark.read.schema(LOGS_SCHEMA).parquet(self.path)

    def _write(self, df: DataFrame) -> None:
        # Tiny metadata table: write to a temp dir then swap would be
        # needed for concurrent readers; single-writer engine semantics
        # match the reference's transactional INSERT/UPDATE.
        staged = df.collect()
        out = self.spark.createDataFrame(staged, LOGS_SCHEMA)
        out.coalesce(1).write.mode("overwrite").parquet(self.path)

    def start_run(
        self,
        load_date: dt.date,
        run_type: str = "SCHEDULED",
        mode: str = "FULL",
        config: str = "{}",
        run_id: str | None = None,
    ) -> str:
        """Insert a RUNNING row (≡ init_log, db_postgres.py:86-91)."""
        run_id = run_id or uuid.uuid4().hex
        row = [(run_id, load_date, run_type, mode, "RUNNING",
                _utcnow(), None, config)]
        new = self.spark.createDataFrame(row, LOGS_SCHEMA)
        self._write(self.read().unionByName(new))
        return run_id

    def finish_run(self, run_id: str, load_date: dt.date, status: str) -> None:
        """Terminal SUCCESS/FAILED update (≡ update, db_postgres.py:128-149)."""
        cur = self.read()
        hit = (F.col("run_id") == run_id) & (F.col("load_date") == F.lit(load_date))
        updated = cur.withColumn(
            "status", F.when(hit, F.lit(status)).otherwise(F.col("status"))
        ).withColumn(
            "end_time",
            F.when(hit, F.lit(_utcnow())).otherwise(F.col("end_time")),
        )
        self._write(updated)

    def last_successful_load_date(self) -> dt.date | None:
        """≡ MAX(load_date) WHERE status IN ('SUCCESS','RUNNING')
        (A2, db_postgres.py:73-84)."""
        row = (
            self.read()
            .filter(F.col("status").isin("SUCCESS", "RUNNING"))
            .agg(F.max("load_date").alias("d"))
            .first()
        )
        return row["d"]

    def successful_load_dates(self) -> DataFrame:
        """≡ SELECT load_date WHERE status='SUCCESS' (A3)."""
        return (
            self.read()
            .filter(F.col("status") == "SUCCESS")
            .select("load_date")
            .distinct()
        )
