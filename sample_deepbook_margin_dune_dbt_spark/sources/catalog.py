"""Source catalog: named external inputs → storage paths.

Replaces the reference's dbt source declarations
(``models/sources/_sources.yml:4-10``) plus the database-rebinding override
(``macros/dune_dbt_overrides/source.sql:1-5`` — which repoints every source
to Dune's ``delta_prod``): here a source is a ``"database.table"`` key mapped
to a parquet/Delta path, and rebinding is just a different mapping (SURVEY
§2.1 S4, §2.9 C2/C6).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class SourceCatalog:
    def __init__(self, mapping: dict[str, str] | None = None):
        self._mapping: dict[str, str] = dict(mapping or {})

    def add(self, database: str, table: str, path: str) -> "SourceCatalog":
        self._mapping[f"{database}.{table}"] = path
        return self

    def path(self, database: str, table: str) -> str:
        return self._mapping[f"{database}.{table}"]

    def mapping(self) -> dict[str, str]:
        return dict(self._mapping)

    def read(self, spark: SparkSession, database: str, table: str) -> DataFrame:
        return spark.read.parquet(self.path(database, table))

    def register_views(self, spark: SparkSession) -> None:
        """Register every source as ``database_table`` temp view for spark.sql."""
        for key, path in self._mapping.items():
            view = key.replace(".", "_")
            spark.read.parquet(path).createOrReplaceTempView(view)


def testdata_sources(sf_dir: str) -> dict[str, str]:
    """Map the driver's generic tables (TESTDATA.md) under the ``main`` db."""
    names = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    return {f"main.{n}": os.path.join(sf_dir, f"{n}.parquet") for n in names}
