"""PySpark-native incremental analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference dbt-on-Trino pipeline (``Evan-Kim2028/sample-deepbook-margin-dune-dbt``,
surveyed in ``SURVEY.md``), re-expressed Spark-first:

- ``engine/``   — model registry, DAG runner, incremental MERGE materialization
                  (replaces dbt-core + dbt-trino control plane; SURVEY §2.9 C1-C9)
- ``models_deepbook/`` — the 7 reference-parity models as DataFrame builders
- ``functions/``— scalar function surface (JSON paths, safe casts, text analysis)
- ``operators/``— dedup / similarity / multimodal operators for LLM-data pipelines
- ``sources/``  — source catalog (replaces dbt sources + the delta_prod override)
- ``plans/``    — plan inspection helpers (explain/shuffle audits)
- ``streaming/``— structured-streaming analog of the incremental pattern
"""

__version__ = "0.1.0"
